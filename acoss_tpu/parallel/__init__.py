"""Device-mesh sharding of the N x N pair grid."""

from acoss_tpu.parallel.mesh import (  # noqa: F401
    make_pair_mesh,
    sharded_pair_scores,
)
