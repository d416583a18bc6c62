"""Dataset layer: feature store, manifests, synthetic fixtures."""

from acoss_tpu.data.store import FeatureSet, pad_stack  # noqa: F401
from acoss_tpu.data.synthetic import make_synthetic_dataset  # noqa: F401
