"""Similarity-math ops (the reference's L2 layer) as batched XLA ops."""

from acoss_tpu.ops.crp import (  # noqa: F401
    get_ssm,
    get_csm,
    get_csm_cosine,
    get_oti,
    get_all_shift_scores,
    transpose_chroma,
    get_csm_blocked_oti,
    sliding_window,
    sliding_csm,
    csm_to_binary,
    csm_to_binary_mutual,
    chrompwr,
)
from acoss_tpu.ops.alignment import (  # noqa: F401
    qmax,
    dmax,
    swconstrained,
    qmax_batch,
    dmax_batch,
    swconstrained_batch,
    qmax_batch_best,
    dmax_batch_best,
)
