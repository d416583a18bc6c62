"""Pallas TPU row-streaming kernels for qmax / dmax.

The XLA `lax.scan` in `alignment.py` re-reads and re-writes its (B, N) row
carries from HBM every step. Here the carries stay resident in VMEM for the
whole sweep; HBM traffic is ONE streaming read of the binary CRP rows
(uint8), double-buffered automatically by the Mosaic grid pipeline.

Structure:
- input S is pre-tiled to (nb, M, BB, N): each grid block (1, T, BB, N) is
  one fully-contiguous DMA chunk;
- grid (batch_chunks, row_chunks); DP row carries persist in VMEM scratch
  across the row_chunks axis (innermost grid dim);
- per row, the branch `S ? pre+1 : max(pre-gap, 0)` is fused into
  `max(pre + (1+gap) * S - gap, 0)` — exact because pre >= 0 (all DP values
  are >= 0), so the match branch never clamps;
- NO masks in the kernel: the wrapper pre-zeroes S rows/cols < lo and the
  padding, so boundary cells provably stay 0 and padded cells only decay
  valid values (never raising the max). The running max is a (BB, N)
  vector reduced once at the end.

Gap penalties are compile-time constants with gap_onset == gap_extension
(the reference's values, `SequenceAlignment.c:104-111`); the unequal-gap
variant falls back to the XLA scan path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift(x, k):
    """shift(x, k)[:, j] = x[:, j - k], zeros shifted in at the front."""
    rolled = pltpu.roll(x, k, 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(jj >= k, rolled, 0.0)


def _qmax_kernel(T, gap, s_ref, out_ref, A, B2, bestv):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        z = jnp.zeros_like(bestv)
        A[:] = z
        B2[:] = z
        bestv[:] = z

    def body(k, carry):
        a, b2, bv = carry
        sd = s_ref[0, k].astype(jnp.int32).astype(jnp.float32)
        pre = jnp.maximum(_shift(jnp.maximum(a, b2), 1), _shift(a, 2))
        # fused: S ? pre + 1 : max(pre - gap, 0)  ==
        #        max(pre + (1+gap) * S - gap, 0)  since pre >= 0.
        Dd = jnp.maximum(pre + ((1.0 + gap) * sd - gap), 0.0)
        return Dd, a, jnp.maximum(bv, Dd)

    A[:], B2[:], bestv[:] = jax.lax.fori_loop(
        0, T, body, (A[:], B2[:], bestv[:]))

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = jnp.max(bestv[:], axis=1, keepdims=True)


def _dmax_kernel(T, gap, s_ref, out_ref, A, B2, B3, SA, SB, bestv):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        z = jnp.zeros_like(bestv)
        for ref in (A, B2, B3, SA, SB, bestv):
            ref[:] = z

    # dmax reads S values of rows/cols < 3 as path accumulations, so the
    # wrapper cannot pre-zero them (unlike qmax); suppress the cells with
    # an explicit mask instead: cols < 3 always, rows < 3 via a row flag.
    jj = jax.lax.broadcasted_iota(jnp.int32, bestv.shape, 1)
    colmask = (jj >= 3).astype(jnp.float32)

    def body(k, carry):
        a, b2, b3, s_a, s_b, bv = carry
        sd = s_ref[0, k].astype(jnp.int32).astype(jnp.float32)
        sd1 = _shift(sd, 1)
        p1 = _shift(a, 1)                     # D[i-1, j-1]
        p2 = _shift(b2, 1) + s_a              # D[i-2, j-1] + S[i-1, j]
        p3 = _shift(a, 2) + sd1               # D[i-1, j-2] + S[i, j-1]
        p4 = _shift(b3, 1) + s_b + s_a        # D[i-3,j-1]+S[i-2,j]+S[i-1,j]
        p5 = _shift(a, 3) + _shift(sd, 2) + sd1
        m5 = jnp.maximum(jnp.maximum(jnp.maximum(p1, p2), p3),
                         jnp.maximum(p4, p5))
        Dd = jnp.maximum(m5 + ((1.0 + gap) * sd - gap), 0.0)
        rowflag = jnp.where(t * T + k >= 3, 1.0, 0.0)
        Dd = Dd * (colmask * rowflag)
        return Dd, a, b2, sd, s_a, jnp.maximum(bv, Dd)

    (A[:], B2[:], B3[:], SA[:], SB[:], bestv[:]) = jax.lax.fori_loop(
        0, T, body, (A[:], B2[:], B3[:], SA[:], SB[:], bestv[:]))

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = jnp.max(bestv[:], axis=1, keepdims=True)


def _zero_margins(S, lo):
    """Zero rows/cols < lo (cells the C kernels never write; their zeros
    feed the recurrence as predecessors)."""
    B, M, N = S.shape
    rmask = (jnp.arange(M) >= lo).astype(S.dtype)
    cmask = (jnp.arange(N) >= lo).astype(S.dtype)
    return S * rmask[None, :, None] * cmask[None, None, :]


def _run(kernel, n_scratch, S, m_len, n_len, gap, lo, min_size,
         block_b, block_t, interpret):
    S = jnp.asarray(S)
    B, M, N = S.shape
    BB = min(block_b, B)
    T = block_t
    nb = -(-B // BB)
    nt = -(-M // T)

    if lo is not None:
        S = _zero_margins(S, lo)
    S = jnp.pad(S, ((0, nb * BB - B), (0, nt * T - M), (0, 0)))
    # Pre-tile to (nb, M, BB, N): each (1, T, BB, N) block is contiguous.
    St = jnp.moveaxis(S.reshape(nb, BB, nt * T, N), 1, 2)

    out = pl.pallas_call(
        functools.partial(kernel, T, gap),
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((1, T, BB, N), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, 1), lambda i, t: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * BB, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BB, N), jnp.float32)] * n_scratch,
        interpret=interpret,
    )(St)
    score = out[:B, 0]
    # The kernel ignores lengths: padding is zero, so padded cells only
    # decay valid values. Only the small-size early-outs need lengths.
    ok = (jnp.asarray(m_len) >= min_size) & (jnp.asarray(n_len) >= min_size)
    return jnp.where(ok, score, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("gap", "block_b", "block_t", "interpret"))
def qmax_batch_pallas(S, m_len, n_len, gap: float = 0.5,
                      block_b: int = 128, block_t: int = 64,
                      interpret: bool = False):
    """Batched qmax on TPU via the VMEM-resident row-streaming kernel.

    Semantics identical to `alignment.qmax_batch` with
    gap_onset == gap_extension == gap. S must be zero outside
    (m_len, n_len) (guaranteed by `crp.csm_to_binary`).
    """
    return _run(_qmax_kernel, 3, S, m_len, n_len, gap, 2, 3,
                block_b, block_t, interpret)


@functools.partial(
    jax.jit,
    static_argnames=("gap", "block_b", "block_t", "interpret"))
def dmax_batch_pallas(S, m_len, n_len, gap: float = 0.5,
                      block_b: int = 128, block_t: int = 64,
                      interpret: bool = False):
    """Batched dmax on TPU; semantics of `alignment.dmax_batch` with
    gap_onset == gap_extension == gap.

    Requires gap <= 1.0: phantom cells in padded rows accumulate skipped S
    values (up to +2) before the gap is subtracted, so the decay argument
    needs the +1 match bonus of the corresponding VALID cells to dominate.
    `alignment.dmax_batch_best` falls back to the XLA scan out of range.
    """
    if gap > 1.0:
        raise ValueError(
            f"dmax_batch_pallas requires gap <= 1.0 (got {gap}); use "
            "alignment.dmax_batch for larger gaps")
    return _run(_dmax_kernel, 6, S, m_len, n_len, gap, None, 4,
                block_b, block_t, interpret)


def _sw_kernel(T, go, ge, match, mismatch, s_ref, out_ref,
               A, B2, SA, SB, bestv):
    """Constrained Smith-Waterman row kernel.

    v_i = pred_i + MS + Delta(sprev_i, cur); D = max(v1, v2, v3, 0).
    MS = match if S else mismatch; Delta = 0 when cur else
    (go if sprev else ge) — computed as (1 - S) * (ge + (go - ge) * sprev).
    S margins cannot be pre-zeroed (S participates as mismatch evidence and
    Delta context), so rows/cols < 2 are masked explicitly.
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        z = jnp.zeros_like(bestv)
        for ref in (A, B2, SA, SB, bestv):
            ref[:] = z

    jj = jax.lax.broadcasted_iota(jnp.int32, bestv.shape, 1)
    colmask = (jj >= 2).astype(jnp.float32)

    def body(k, carry):
        a, b2, s_a, s_b, bv = carry
        sd = s_ref[0, k].astype(jnp.int32).astype(jnp.float32)
        ms = mismatch + (match - mismatch) * sd
        nogap = 1.0 - sd

        def term(pred, sprev):
            return pred + ms + nogap * (ge + (go - ge) * sprev)

        v1 = term(_shift(a, 1), _shift(s_a, 1))
        v2 = term(_shift(b2, 1), _shift(s_b, 1))
        v3 = term(_shift(a, 2), _shift(s_a, 2))
        Dd = jnp.maximum(jnp.maximum(jnp.maximum(v1, v2), v3), 0.0)
        rowflag = jnp.where(t * T + k >= 2, 1.0, 0.0)
        Dd = Dd * (colmask * rowflag)
        return Dd, a, sd, s_a, jnp.maximum(bv, Dd)

    (A[:], B2[:], SA[:], SB[:], bestv[:]) = jax.lax.fori_loop(
        0, T, body, (A[:], B2[:], SA[:], SB[:], bestv[:]))

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = jnp.max(bestv[:], axis=1, keepdims=True)


@functools.partial(
    jax.jit,
    static_argnames=("gap_opening", "gap_extension", "match_score",
                     "mismatch_score", "block_b", "block_t", "interpret"))
def swconstrained_batch_pallas(S, m_len, n_len,
                               gap_opening: float = -0.5,
                               gap_extension: float = -0.7,
                               match_score: float = 1.0,
                               mismatch_score: float = -1.0,
                               block_b: int = 128, block_t: int = 64,
                               interpret: bool = False):
    """Batched constrained SW on TPU; semantics of
    `alignment.swconstrained_batch`.

    Requires mismatch_score <= 0 and non-positive gap deltas so phantom
    padded cells strictly decay (see `alignment.swconstrained_batch_best`).
    """
    if mismatch_score > 0 or gap_opening > 0 or gap_extension > 0:
        raise ValueError(
            "swconstrained_batch_pallas requires non-positive mismatch and "
            "gap scores; use alignment.swconstrained_batch otherwise")
    kernel = functools.partial(_sw_kernel, block_t, gap_opening,
                               gap_extension, match_score, mismatch_score)

    def wrapped(T_, gap_, s_ref, out_ref, *scratch):
        return kernel(s_ref, out_ref, *scratch)

    return _run(wrapped, 5, S, m_len, n_len, 0.0, None, 3,
                block_b, block_t, interpret)
