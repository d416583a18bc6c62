"""Batched audio feature extraction in JAX (the reference's L1 layer)."""

from acoss_tpu.features.rhythm import tempogram  # noqa: F401
