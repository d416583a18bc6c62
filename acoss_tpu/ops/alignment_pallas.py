"""Pallas TPU row-streaming kernels for qmax / dmax / constrained SW.

The XLA `lax.scan` in `alignment.py` re-reads and re-writes its (B, N) row
carries from HBM every step. Here the carries stay resident in VMEM for the
whole sweep; HBM traffic is ONE streaming read of the binary CRP rows
(uint8), double-buffered automatically by the Mosaic grid pipeline.

Round-2 redesign (measured on one v5e chip, L=512 ragged workload:
dmax 124k -> ~225k pairs/s, qmax 277k -> ~312k):
- TRANSPOSED layout: the DP row state is (N sublanes, BB lanes) — one pair
  per lane, the CRP column axis on sublanes — so the recurrence shifts are
  SUBLANE rolls, measurably cheaper than lane rolls at these shapes. The
  input is pre-tiled to (nb, M, N, BB); each grid block (1, T, N, BB) is
  one contiguous DMA chunk.
- Pre-shifted carries: predecessor rows are carried already rolled
  (a1 = roll(D[i-1], 1)), and dmax's S-accumulating paths p2/p4 are carried
  as running sums (v = p2, w = p4), cutting the rolls per row from 7 to 4
  (2 for qmax) — p5 = roll(p3, 1) + s1 exploits roll distributing over +.
- Mask-free inner loop: boundary columns are handled by folding -BIG into
  the per-column gap bias (m5 + gain + colbias, then clamp at 0), and
  boundary rows by a scalar -BIG rowbias; no multiplies after the clamp,
  and no pre-zeroing pass over S.
- 8-row unroll inside `fori_loop` (deeper unrolls and int32 DP measured
  slower; lax.cond row-guard hoisting measured slower).

Round-3 dmax roll-reduction experiments, measured and REJECTED (the
dmax/qmax gap is the 5-path recurrence's inherent VPU work, not rolls):
- bit-packing S and roll(S,1) into one uint8 stream (bit0/bit1, same
  VMEM/HBM as base, 4->3 rolls/row): 204k -> 172k pairs/s — the XLA
  packing pass costs more than the saved roll;
- streaming roll(S,1) as a second input: VMEM-infeasible at BB=128
  (2 double-buffered uint8 blocks + scratch > 16 MB scoped limit) and
  99k pairs/s at BB=64 (starved lanes);
- block_t=128: over the 16 MB scoped-VMEM limit for every variant.
- Per row, qmax's branch `S ? pre+1 : max(pre-gap, 0)` stays fused as
  `max(pre + (1+gap)*S - gap, 0)` — exact because pre >= 0.
- NO length masks in the kernel: S is zero outside (m_len, n_len) (the
  binarizers guarantee it), so padded cells only decay valid values and
  can never raise the max (dmax needs gap <= 1.0 for this — see wrapper).
  The running max is a (N, BB) vector reduced once at the end.

Gap penalties are compile-time constants. gap_onset == gap_extension
(the reference's values, `SequenceAlignment.c:104-111`) uses the fused
const-gap kernels; unequal non-negative gaps (the legacy
`similarity.py` parameter surface) use `_qmax_kernel_uneq`, which
carries the state-dependent gamma rows alongside the DP rows. dmax with
unequal gaps falls back to the XLA scan (its 5-path S-accumulating
carries don't compose with per-predecessor penalties without giving up
the running-sum trick; no reference algorithm uses that combination).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30   # bias that forces a clamped-at-0 cell; never survives max(., 0)
_UNROLL = 8


def _qmax_kernel(T, gap, s_ref, out_ref, A1, B1, bestv):
    """Carries: a1 = roll(D[i-1], 1), b1 = roll(D[i-2], 1), running max."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        z = jnp.zeros_like(bestv)
        for ref in (A1, B1, bestv):
            ref[:] = z

    ii = jax.lax.broadcasted_iota(jnp.int32, bestv.shape, 0)
    colbias = jnp.where(ii >= 2, -gap, -_BIG)

    def row(k, carry):
        a1, b1, bv = carry
        sd = s_ref[0, k].astype(jnp.int32).astype(jnp.float32)
        a2 = pltpu.roll(a1, 1, 0)
        pre = jnp.maximum(jnp.maximum(a1, b1), a2)
        rowbias = jnp.where(t * T + k >= 2, 0.0, -_BIG)
        Dd = jnp.maximum(
            pre + ((1.0 + gap) * sd + (colbias + rowbias)), 0.0)
        return (pltpu.roll(Dd, 1, 0), a1, jnp.maximum(bv, Dd))

    def body(kk, carry):
        for u in range(_UNROLL):
            carry = row(kk * _UNROLL + u, carry)
        return carry

    (A1[:], B1[:], bestv[:]) = jax.lax.fori_loop(
        0, T // _UNROLL, body, (A1[:], B1[:], bestv[:]))

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = jnp.max(bestv[:], axis=0, keepdims=True)[None]


def _qmax_kernel_uneq(T, go, ge, s_ref, out_ref, A1, B1, GA1, GB1, bestv):
    """Unequal-gap qmax (gap_onset != gap_extension): the gap branch
    subtracts the PREDECESSOR cell's state-dependent penalty
    gamma = gap_onset if that cell's S was a match else gap_extension
    (`SequenceAlignment.c:104-111` generalized; exact parity target is
    `alignment.qmax_batch`'s unequal-gap scan). Carries the D rows AND
    the gamma rows pre-shifted (ga1 = roll(gamma[i-1], 1),
    gb1 = roll(gamma[i-2], 1)); the fused `(1+gap)*S - gap` trick of the
    const-gap kernel doesn't apply, so the branch is an explicit select.
    Padding decay: phantom cells take the gap branch with penalties
    >= 0, so they can only hold or decay valid scores (wrapper guards
    go, ge >= 0)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        z = jnp.zeros_like(bestv)
        for ref in (A1, B1, GA1, GB1, bestv):
            ref[:] = z

    ii = jax.lax.broadcasted_iota(jnp.int32, bestv.shape, 0)
    colbias = jnp.where(ii >= 2, 0.0, -_BIG)

    def row(k, carry):
        a1, b1, ga1, gb1, bv = carry
        sd = s_ref[0, k].astype(jnp.int32).astype(jnp.float32)
        a2 = pltpu.roll(a1, 1, 0)
        ga2 = pltpu.roll(ga1, 1, 0)
        match = jnp.maximum(jnp.maximum(a1, b1), a2) + 1.0
        gap = jnp.maximum(jnp.maximum(a1 - ga1, b1 - gb1), a2 - ga2)
        rowbias = jnp.where(t * T + k >= 2, 0.0, -_BIG)
        Dd = jnp.maximum(
            jnp.where(sd > 0, match, gap) + (colbias + rowbias), 0.0)
        gd = jnp.where(sd > 0, go, ge)
        return (pltpu.roll(Dd, 1, 0), a1, pltpu.roll(gd, 1, 0), ga1,
                jnp.maximum(bv, Dd))

    def body(kk, carry):
        for u in range(_UNROLL):
            carry = row(kk * _UNROLL + u, carry)
        return carry

    (A1[:], B1[:], GA1[:], GB1[:], bestv[:]) = jax.lax.fori_loop(
        0, T // _UNROLL, body,
        (A1[:], B1[:], GA1[:], GB1[:], bestv[:]))

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = jnp.max(bestv[:], axis=0, keepdims=True)[None]


def _dmax_kernel(T, gap, s_ref, out_ref, A1, V, W, bestv):
    """Carries: a1 = roll(D[i-1], 1); v = p2 = D[i-2]·sh1 + S[i-1];
    w = p4 = D[i-3]·sh1 + S[i-2] + S[i-1]; running max. The other two
    paths are p1 = a1 and p3/p5 from rolls of a1:
    p5 = D[i-1]·sh3 + S[i]·sh2 + S[i]·sh1 = roll(p3, 1) + s1."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        z = jnp.zeros_like(bestv)
        for ref in (A1, V, W, bestv):
            ref[:] = z

    ii = jax.lax.broadcasted_iota(jnp.int32, bestv.shape, 0)
    colbias = jnp.where(ii >= 3, -gap, -_BIG)

    def row(k, carry):
        a1, v, w, bv = carry
        sd = s_ref[0, k].astype(jnp.int32).astype(jnp.float32)
        s1 = pltpu.roll(sd, 1, 0)
        a2 = pltpu.roll(a1, 1, 0)
        p3 = a2 + s1
        p5 = pltpu.roll(p3, 1, 0) + s1
        m5 = jnp.maximum(jnp.maximum(jnp.maximum(a1, v), p3),
                         jnp.maximum(w, p5))
        rowbias = jnp.where(t * T + k >= 3, 0.0, -_BIG)
        Dd = jnp.maximum(
            m5 + ((1.0 + gap) * sd + (colbias + rowbias)), 0.0)
        return (pltpu.roll(Dd, 1, 0), a1 + sd, v + sd,
                jnp.maximum(bv, Dd))

    def body(kk, carry):
        for u in range(_UNROLL):
            carry = row(kk * _UNROLL + u, carry)
        return carry

    (A1[:], V[:], W[:], bestv[:]) = jax.lax.fori_loop(
        0, T // _UNROLL, body, (A1[:], V[:], W[:], bestv[:]))

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = jnp.max(bestv[:], axis=0, keepdims=True)[None]


def _sw_kernel(T, go, ge, match, mismatch, s_ref, out_ref,
               A1, B1, SA1, SB1, bestv):
    """Constrained Smith-Waterman, transposed layout.

    v_i = pred_i + MS + Delta(sprev_i, cur); D = max(v1, v2, v3, 0).
    MS = match if S else mismatch; Delta = (1 - S) * (ge + (go - ge) *
    sprev). Carries: a1/b1 = D[i-1]/D[i-2] shifted 1; sa1/sb1 = S[i-1]/
    S[i-2] shifted 1. Boundary rows/cols < 2 forced 0 via -BIG biases.
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        z = jnp.zeros_like(bestv)
        for ref in (A1, B1, SA1, SB1, bestv):
            ref[:] = z

    ii = jax.lax.broadcasted_iota(jnp.int32, bestv.shape, 0)
    colbias = jnp.where(ii >= 2, 0.0, -_BIG)

    def row(k, carry):
        a1, b1, sa1, sb1, bv = carry
        sd = s_ref[0, k].astype(jnp.int32).astype(jnp.float32)
        sa2 = pltpu.roll(sa1, 1, 0)
        a2 = pltpu.roll(a1, 1, 0)
        nogap = 1.0 - sd
        rowbias = jnp.where(t * T + k >= 2, 0.0, -_BIG)
        ms = (mismatch + (match - mismatch) * sd
              + (colbias + rowbias) + nogap * ge)
        q = nogap * (go - ge)
        v1 = a1 + (q * sa1 + ms)
        v2 = b1 + (q * sb1 + ms)
        v3 = a2 + (q * sa2 + ms)
        Dd = jnp.maximum(jnp.maximum(jnp.maximum(v1, v2), v3), 0.0)
        return (pltpu.roll(Dd, 1, 0), a1, pltpu.roll(sd, 1, 0), sa1,
                jnp.maximum(bv, Dd))

    def body(kk, carry):
        for u in range(_UNROLL):
            carry = row(kk * _UNROLL + u, carry)
        return carry

    (A1[:], B1[:], SA1[:], SB1[:], bestv[:]) = jax.lax.fori_loop(
        0, T // _UNROLL, body, (A1[:], B1[:], SA1[:], SB1[:], bestv[:]))

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = jnp.max(bestv[:], axis=0, keepdims=True)[None]


def _run(kernel, n_scratch, S, m_len, n_len, min_size,
         block_b, block_t, interpret):
    if block_t % _UNROLL:
        raise ValueError(f"block_t must be a multiple of {_UNROLL}")
    S = jnp.asarray(S)
    B, M, N = S.shape
    BB = min(block_b, B)
    T = block_t
    nb = -(-B // BB)
    nt = -(-M // T)

    S = jnp.pad(S, ((0, nb * BB - B), (0, nt * T - M), (0, 0)))
    # Transposed pre-tiling to (nb, M, N, BB): pairs on lanes, CRP columns
    # on sublanes; each (1, T, N, BB) grid block is one contiguous DMA.
    St = jnp.moveaxis(S.reshape(nb, BB, nt * T, N), 1, 3)

    out = pl.pallas_call(
        kernel,
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((1, T, N, BB), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, BB), lambda i, t: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 1, BB), jnp.float32),
        scratch_shapes=[pltpu.VMEM((N, BB), jnp.float32)] * n_scratch,
        interpret=interpret,
    )(St)
    score = out.reshape(nb * BB)[:B]
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
    (m_len, n_len) (guaranteed by the binarizers).

    Requires gap >= 0: the mask-free padding-decay argument needs
    phantom cells (max(pre - gap, 0)) to only ever DECAY; a negative
    gap would grow them past valid scores.
    `alignment.qmax_batch_best` falls back to the XLA scan out of range.
    """
    if gap < 0.0:
        raise ValueError(
            f"qmax_batch_pallas requires gap >= 0 (got {gap}); use "
            "alignment.qmax_batch for negative gaps")
    return _run(functools.partial(_qmax_kernel, block_t, gap), 3,
                S, m_len, n_len, 3, block_b, block_t, interpret)


@functools.partial(
    jax.jit,
    static_argnames=("gap_onset", "gap_extension", "block_b", "block_t",
                     "interpret"))
def qmax_batch_pallas_uneq(S, m_len, n_len, gap_onset: float,
                           gap_extension: float, block_b: int = 128,
                           block_t: int = 64, interpret: bool = False):
    """Batched qmax with UNEQUAL gap penalties (the legacy
    `serra_cover_similarity_measures(disOnset, disExtension)` parameter
    surface, `preprocess/similarity.py:111`). Semantics identical to
    `alignment.qmax_batch(gap_onset, gap_extension)`.

    Requires gap_onset >= 0 and gap_extension >= 0 (padding decay —
    see `_qmax_kernel_uneq`); out of range falls back to the scan via
    `alignment.qmax_batch_best`."""
    if gap_onset < 0.0 or gap_extension < 0.0:
        raise ValueError(
            f"qmax_batch_pallas_uneq requires non-negative gaps (got "
            f"{gap_onset}, {gap_extension}); use alignment.qmax_batch")
    return _run(functools.partial(_qmax_kernel_uneq, block_t,
                                  gap_onset, gap_extension), 5,
                S, m_len, n_len, 3, block_b, block_t, interpret)


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
    if not 0.0 <= gap <= 1.0:
        raise ValueError(
            f"dmax_batch_pallas requires 0 <= gap <= 1.0 (got {gap}); "
            "use alignment.dmax_batch outside that range")
    return _run(functools.partial(_dmax_kernel, block_t, gap), 4,
                S, m_len, n_len, 4, block_b, block_t, interpret)


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
    return _run(kernel, 5, S, m_len, n_len, 3, block_b, block_t, interpret)
