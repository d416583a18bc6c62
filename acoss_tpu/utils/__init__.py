"""Logging, timing and fault-tolerance utilities."""

from acoss_tpu.utils.logging import ErrorFile, get_logger, timeit  # noqa: F401
