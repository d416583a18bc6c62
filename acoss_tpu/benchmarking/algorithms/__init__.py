"""Cover-song scoring algorithms (the reference's L3 subclasses)."""

from acoss_tpu.benchmarking.algorithms.chen_fusion import ChenFusion  # noqa: F401
from acoss_tpu.benchmarking.algorithms.early_snf import EarlySNF  # noqa: F401
from acoss_tpu.benchmarking.algorithms.ftm2d import FTM2D  # noqa: F401
from acoss_tpu.benchmarking.algorithms.serra09 import Serra09  # noqa: F401
