"""Test configuration: force CPU with 8 virtual devices.

Tests never touch the real TPU; multi-chip sharding is validated on a
virtual 8-device CPU mesh (the driver separately dry-runs the multi-chip
path via __graft_entry__.dryrun_multichip).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the env presets 'axon' (real TPU)
# tests run CPU programs: skip the persistent XLA cache (it may hold CPU
# code compiled remotely with host-incompatible machine features)
os.environ.setdefault("ACOSS_TPU_NO_COMPILE_CACHE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The preinstalled 'axon' TPU plugin ignores the JAX_PLATFORMS env var, so
# force the platform through the config API as well.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
