"""Fused Pallas TPU kernel: CSM -> sliding diagonal window -> exact
kNN binarization (mutual or row-only), entirely VMEM-resident.

This fuses the hottest non-aligner stage of the Serra09/ChenFusion/
Tempogram family (reference hot path `CRPUtils.py:67-84` get_csm ->
`:24-45` sliding_csm -> `:169-219` csm_to_binary(_mutual)). The XLA
formulation in `crp.py` materializes ~5 (B, L, L) float32 intermediates in
HBM per tile (CSM, squared CSM, windowed sum, kNN masks); this kernel
streams the (L, d) feature blocks in once and writes only the final uint8
binary CRP — per pair, HBM traffic drops from ~10 MB to ~0.3 MB, and the
`lax.approx_min_k` selection (11 ms of the 22 ms round-1 Serra09 batch,
RESULTS.md) is replaced by an EXACT in-VMEM selection.

Design notes:
- The sqrt in get_csm/sliding_csm is skipped: binarization is a rank
  threshold and sqrt is monotone, so ranks of the windowed *squared*
  distances are identical (sliding_csm sums csm^2 — exactly the squared
  Euclidean distances).
- Per-row/per-column k-th-smallest is EXACT: binary search over float32
  bit patterns (monotone for non-negative floats), 31 fixed iterations,
  every row searched in parallel as (L, 1) carries against the
  VMEM-resident (L, L) matrix. (Measured: a while_loop early exit and
  MXU-offloaded counts are both slower; 31 plain VPU passes win.)
- Invalid cells (beyond the effective lengths) are poisoned ONCE with the
  +inf bit pattern, so neither the counts nor the final compare need
  masks.
- Ties at the k-th value are all kept (same convention as the
  rank-threshold XLA path; the reference's argpartition keeps an
  arbitrary k of them — measure-zero for real-valued CSMs).
- The sliding window's wrap-around garbage (pltpu.roll) lands only at
  rows/cols >= L - m + 1 >= effective length, which the poisoning
  excludes.
- Two pairs per grid step (PB=2): two independent search chains give the
  scheduler ILP; measured ~7% faster than one, and PB=4 is slower.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF_BITS = 0x7F800000       # +inf: sorts after every finite value
_MAX_FINITE_BITS = 0x7F7FFFFF

_PB = 2                      # pairs per grid step


def _norm_rows(x):
    n = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
    return x / jnp.where(n == 0, 1.0, n)


def _fused_kernel(m, kappa, metric, mutual, dual, L,
                  x_ref, y_ref, l1_ref, l2_ref, s_ref, bits_ref,
                  bitsT_ref=None):
    PB = x_ref.shape[0]
    g = pl.program_id(0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    ks_r, ks_c = [], []
    for p in range(PB):
        x = x_ref[p]
        y = y_ref[p]
        l1 = l1_ref[g * PB + p]
        l2 = l2_ref[g * PB + p]
        l1e = jnp.maximum(l1 - m + 1, 0)
        l2e = jnp.maximum(l2 - m + 1, 0)
        if metric == "cosine":
            # 1 - cos in [0, 2]: non-negative, bit-order == value order.
            # precision=HIGHEST: the default TPU matmul truncates fp32
            # operands to bf16 (~1e-3 relative), which flips kth-neighbor
            # decisions vs the float64 reference scoring path; the (L, d)
            # x (d, L) matmul is a negligible share of this kernel's cost
            xy = jax.lax.dot_general(
                _norm_rows(x), _norm_rows(y), (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            csm = jnp.maximum(1.0 - xy, 0.0)
        else:  # squared Euclidean
            sx = jnp.sum(x * x, axis=1, keepdims=True)
            sy = jnp.sum(y * y, axis=1, keepdims=True)
            xy = jax.lax.dot_general(
                x, y, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            csm = jnp.maximum(sx + sy.T - 2.0 * xy, 0.0)
        # The diagonal window sums csm^2 (`CRPUtils.py:24-45`); for the
        # squared-Euclidean metric `csm` already IS the squared distance.
        if m > 1 and metric == "cosine":
            csm = csm * csm
        acc = csm
        for k in range(1, m):
            acc = acc + pltpu.roll(pltpu.roll(csm, L - k, 0), L - k, 1)
        valid = (ii < l1e) & (jj < l2e)
        bv = jnp.where(valid, acc.view(jnp.int32), _INF_BITS)
        bits_ref[p] = bv
        if dual:
            # transposed copy: BOTH per-iteration counts then reduce
            # along the cheap sublane axis (axis=0) — row counts come
            # from bitsT columns; one transpose amortized over 31
            # passes
            bitsT_ref[p] = bv.T
        ks_r.append(jnp.maximum(
            jnp.round(kappa * l2e.astype(jnp.float32)), 1.0))
        ks_c.append(jnp.maximum(
            jnp.round(kappa * l1e.astype(jnp.float32)), 1.0))

    bits = [bits_ref[p] for p in range(PB)]
    bitsT = [bitsT_ref[p] for p in range(PB)] if dual else None
    # row-count reduction source/axis: baseline sums bits along lanes
    # (axis=1, (L, 1) carries); dual sums the transposed copy along
    # sublanes (axis=0, (1, L) carries) — identical counts, cheaper
    # reduction direction
    r_shape = (1, L) if dual else (L, 1)
    r_axis = 0 if dual else 1

    def search(it, carry):
        out = []
        for p in range(PB):
            lo_r, hi_r, lo_c, hi_c = carry[p]
            mid_r = lo_r + jax.lax.div(hi_r - lo_r, 2)
            src = bitsT[p] if dual else bits[p]
            cnt_r = jnp.sum((src <= mid_r).astype(jnp.float32),
                            axis=r_axis, keepdims=True)
            ge_r = cnt_r >= ks_r[p]
            nlo_r = jnp.where(ge_r, lo_r, mid_r + 1)
            nhi_r = jnp.where(ge_r, mid_r, hi_r)
            if mutual:
                mid_c = lo_c + jax.lax.div(hi_c - lo_c, 2)
                cnt_c = jnp.sum((bits[p] <= mid_c).astype(jnp.float32),
                                axis=0, keepdims=True)
                ge_c = cnt_c >= ks_c[p]
                lo_c = jnp.where(ge_c, lo_c, mid_c + 1)
                hi_c = jnp.where(ge_c, mid_c, hi_c)
            out.append((nlo_r, nhi_r, lo_c, hi_c))
        return tuple(out)

    zr = jnp.zeros(r_shape, jnp.int32)
    fr = jnp.full(r_shape, _MAX_FINITE_BITS, jnp.int32)
    zc = jnp.zeros((1, L), jnp.int32)
    fc = jnp.full((1, L), _MAX_FINITE_BITS, jnp.int32)
    init = tuple((zr, fr, zc, fc) for _ in range(PB))
    res = jax.lax.fori_loop(0, 31, search, init)
    for p in range(PB):
        _, t_r, _, t_c = res[p]
        if dual:
            # (1, L) lane-vector of per-row thresholds -> (L, 1)
            t_r = t_r.reshape(L, 1)
        S = bits[p] <= t_r
        if mutual:
            S = S & (bits[p] <= t_c)
        s_ref[p] = S.astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=("kappa", "m", "metric", "mutual", "interpret",
                     "dual"))
def fused_binary_crp_batch(X, Y, l1, l2, kappa: float = 0.095, m: int = 9,
                           metric: str = "sqeuclidean",
                           mutual: bool = True,
                           interpret: bool = False,
                           dual: bool = False):
    """Batched binary CRPs: per pair b, the kNN binarization of
    sliding_csm(csm(X[b], Y[b]), m) with per-row k = round(kappa *
    valid_cols) (and per-col k = round(kappa * valid_rows) when
    `mutual`); a pair whose rounded k is 0 gets an all-zero CRP (the
    reference's zero-neighbor selection). Requires 0 < kappa < 1 (the
    fractional convention only — see the guard below).

    Args:
      X: (B, L, d) float32 row-song features, zero beyond l1[b] rows.
      Y: (B, L, d) float32 col-song features, zero beyond l2[b] rows.
      l1, l2: (B,) int32 true frame counts (pre-window).
      kappa: neighbor fraction; m: diagonal window (m=1 -> plain CSM).
      metric: "sqeuclidean" (rank-equal to Euclidean) or "cosine".
      mutual: AND of row-kNN and col-kNN (`CRPUtils.py:201-219`) vs
        row-only (`:169-199`).

    Returns (S, l1e, l2e): S (B, L, L) uint8, zero outside
    (l1 - m + 1, l2 - m + 1); l1e/l2e those effective lengths.
    Matches `crp.csm_to_binary[_mutual](crp.sliding_csm_padded(...))` up
    to k-th-value ties.
    """
    if metric not in ("sqeuclidean", "cosine"):
        raise ValueError(f"unknown metric {metric!r}")
    if not 0.0 < kappa < 1.0:
        # the kernel implements only the fractional convention
        # (round(kappa * valid) per row); kappa == 0 means an all-ones
        # CRP and kappa >= 1 a FIXED neighbor count in the reference
        # (`CRPUtils.py:188-193`) — callers must use the XLA binarize
        # path for those
        raise ValueError(
            f"fused_binary_crp_batch requires 0 < kappa < 1 (got "
            f"{kappa}); use crp.csm_to_binary[_mutual] otherwise")
    X = jnp.asarray(X, jnp.float32)
    Y = jnp.asarray(Y, jnp.float32)
    B, L, d = X.shape
    l1 = jnp.broadcast_to(jnp.asarray(l1, jnp.int32), (B,))
    l2 = jnp.broadcast_to(jnp.asarray(l2, jnp.int32), (B,))

    Bp = -(-B // _PB) * _PB
    if Bp != B:  # pad with empty pairs (length 0 -> all-zero S)
        X = jnp.pad(X, ((0, Bp - B), (0, 0), (0, 0)))
        Y = jnp.pad(Y, ((0, Bp - B), (0, 0), (0, 0)))
        l1 = jnp.pad(l1, (0, Bp - B))
        l2 = jnp.pad(l2, (0, Bp - B))

    scratch = [pltpu.VMEM((_PB, L, L), jnp.int32)]
    if dual:
        scratch.append(pltpu.VMEM((_PB, L, L), jnp.int32))
    S = pl.pallas_call(
        functools.partial(_fused_kernel, m, kappa, metric, mutual, dual,
                          L),
        grid=(Bp // _PB,),
        in_specs=[
            pl.BlockSpec((_PB, L, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_PB, L, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp,), lambda b: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((Bp,), lambda b: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_PB, L, L), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, L, L), jnp.uint8),
        scratch_shapes=scratch,
        interpret=interpret,
    )(X, Y, l1, l2)
    l1e = jnp.maximum(l1[:B] - m + 1, 0)
    l2e = jnp.maximum(l2[:B] - m + 1, 0)
    S = S[:B]
    # degenerate pairs whose rounded neighbor count is ZERO: the
    # reference selects no neighbors at all (argpartition[:, 0:0] ->
    # all-zero CRP, `CRPUtils.py:194`), while the kernel clips its
    # per-pair k to >= 1 — zero those pairs' CRPs here (k is uniform
    # per pair, so the whole plot is affected or none of it)
    kr = jnp.round(kappa * l2e.astype(jnp.float32)) > 0
    if mutual:
        kr = kr & (jnp.round(kappa * l1e.astype(jnp.float32)) > 0)
    return S * kr[:, None, None].astype(S.dtype), l1e, l2e


# ---------------------------------------------------------------------------
# Matrix-input binarizer: kNN-binarize an ALREADY-BUILT distance matrix
# ---------------------------------------------------------------------------
#
# `fused_binary_crp_batch` above starts from (L, d) feature blocks, so it
# only serves channels whose CSM the kernel itself can build. The EarlySNF
# tile (`benchmarking/algorithms/early_snf.py`) binarizes four matrices
# that exist only mid-pipeline — the chroma sliding CSM (shared with the
# SNF affinity build), the mfcc sliding CSM, the 20736-dim ssms CSM (its
# features exceed VMEM), and the NEGATED fused SNF cross block — which
# kept it on the XLA `lax.top_k` path (measured 39 ms of the 142 ms tile,
# RESULTS.md tile decomposition). This kernel applies the same exact
# in-VMEM bit-pattern selection to a (B, L, L) matrix input.
#
# Unlike the fused kernel's inputs (windowed squared distances, >= 0),
# the SNF cross block is NEGATIVE ([-1, 0]), so bit patterns alone are
# not rank-ordered. Keys are the standard signed monotone mapping
#   key(b) = b ^ ((b >> 31) & 0x7FFFFFFF)
# (identity on non-negative floats, bit-complement of the magnitude on
# negative ones), after canonicalizing -0.0 to +0.0 so equal floats get
# equal keys. The binary search then runs over the full finite-key range
# with an overflow-safe midpoint (lo+hi would exceed int32).

_MIN_FINITE_KEY = -2139095040        # key of -3.4028235e38 (0xFF7FFFFF)


def _binarize_kernel(kappa, mutual, dual, L,
                     d_ref, l1_ref, l2_ref, s_ref, bits_ref,
                     bitsT_ref=None):
    PB = d_ref.shape[0]
    g = pl.program_id(0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    ks_r, ks_c = [], []
    for p in range(PB):
        D = d_ref[p]
        # -0.0 and +0.0 compare equal as floats but differ as bits; the
        # negated SNF cross block is full of -0.0 (fused >= 0), so
        # canonicalize before keying to keep the XLA path's tie sets
        D = jnp.where(D == 0.0, jnp.float32(0.0), D)
        b = D.view(jnp.int32)
        key = b ^ (jax.lax.shift_right_arithmetic(b, 31)
                   & jnp.int32(0x7FFFFFFF))
        l1 = l1_ref[g * PB + p]
        l2 = l2_ref[g * PB + p]
        valid = (ii < l1) & (jj < l2)
        # +inf keys to its own bit pattern (b >= 0), above every finite
        # key and above the search range's hi — poisoned cells never pass
        bv = jnp.where(valid, key, _INF_BITS)
        bits_ref[p] = bv
        if dual:
            bitsT_ref[p] = bv.T   # see `_fused_kernel`'s dual layout
        ks_r.append(jnp.maximum(
            jnp.round(kappa * l2.astype(jnp.float32)), 1.0))
        ks_c.append(jnp.maximum(
            jnp.round(kappa * l1.astype(jnp.float32)), 1.0))

    bits = [bits_ref[p] for p in range(PB)]
    bitsT = [bitsT_ref[p] for p in range(PB)] if dual else None
    r_shape = (1, L) if dual else (L, 1)
    r_axis = 0 if dual else 1

    def search(it, carry):
        out = []
        for p in range(PB):
            lo_r, hi_r, lo_c, hi_c = carry[p]
            # overflow-safe floor((lo + hi) / 2): lo is very negative and
            # hi very positive, so lo + (hi - lo) / 2 would wrap int32
            mid_r = (lo_r & hi_r) + jax.lax.shift_right_arithmetic(
                lo_r ^ hi_r, 1)
            src = bitsT[p] if dual else bits[p]
            cnt_r = jnp.sum((src <= mid_r).astype(jnp.float32),
                            axis=r_axis, keepdims=True)
            ge_r = cnt_r >= ks_r[p]
            nlo_r = jnp.where(ge_r, lo_r, mid_r + 1)
            nhi_r = jnp.where(ge_r, mid_r, hi_r)
            if mutual:
                mid_c = (lo_c & hi_c) + jax.lax.shift_right_arithmetic(
                    lo_c ^ hi_c, 1)
                cnt_c = jnp.sum((bits[p] <= mid_c).astype(jnp.float32),
                                axis=0, keepdims=True)
                ge_c = cnt_c >= ks_c[p]
                lo_c = jnp.where(ge_c, lo_c, mid_c + 1)
                hi_c = jnp.where(ge_c, mid_c, hi_c)
            out.append((nlo_r, nhi_r, lo_c, hi_c))
        return tuple(out)

    zr = jnp.full(r_shape, _MIN_FINITE_KEY, jnp.int32)
    fr = jnp.full(r_shape, _MAX_FINITE_BITS, jnp.int32)
    zc = jnp.full((1, L), _MIN_FINITE_KEY, jnp.int32)
    fc = jnp.full((1, L), _MAX_FINITE_BITS, jnp.int32)
    init = tuple((zr, fr, zc, fc) for _ in range(PB))
    res = jax.lax.fori_loop(0, 32, search, init)
    for p in range(PB):
        _, t_r, _, t_c = res[p]
        if dual:
            t_r = t_r.reshape(L, 1)
        S = bits[p] <= t_r
        if mutual:
            S = S & (bits[p] <= t_c)
        s_ref[p] = S.astype(jnp.uint8)


@functools.partial(
    jax.jit, static_argnames=("kappa", "mutual", "interpret", "dual"))
def binarize_matrix_batch(D, l1, l2, kappa: float = 0.095,
                          mutual: bool = True,
                          interpret: bool = False,
                          dual: bool = False):
    """Batched exact kNN binarization of (B, L, L) distance matrices.

    Per pair b: rows keep the round(kappa * l2[b]) smallest entries
    (ties at the k-th value all kept), columns — when `mutual` — the
    round(kappa * l1[b]) smallest; the CRP is the AND. Bit-identical to
    `crp.csm_to_binary_mutual(D[b], kappa, l1[b], l2[b])` /
    `crp.csm_to_binary(...)` (`CRPUtils.py:169-219` semantics),
    including the zero-neighbor degenerate convention. Values may be
    negative (signed monotone bit keys). Requires 0 < kappa < 1.

    Args:
      D: (B, L, L) float32; cells beyond (l1[b], l2[b]) may be dirty.
      l1, l2: (B,) int32 valid row / column counts (the EFFECTIVE
        lengths — no window arithmetic happens here).
    Returns: (B, L, L) uint8, zero outside (l1[b], l2[b]).
    """
    if not 0.0 < kappa < 1.0:
        raise ValueError(
            f"binarize_matrix_batch requires 0 < kappa < 1 (got "
            f"{kappa}); use crp.csm_to_binary[_mutual] otherwise")
    D = jnp.asarray(D, jnp.float32)
    B, L, L2 = D.shape
    l1 = jnp.broadcast_to(jnp.asarray(l1, jnp.int32), (B,))
    l2 = jnp.broadcast_to(jnp.asarray(l2, jnp.int32), (B,))

    Bp = -(-B // _PB) * _PB
    if Bp != B:
        D = jnp.pad(D, ((0, Bp - B), (0, 0), (0, 0)))
        l1 = jnp.pad(l1, (0, Bp - B))
        l2 = jnp.pad(l2, (0, Bp - B))

    scratch = [pltpu.VMEM((_PB, L, L2), jnp.int32)]
    if dual:
        scratch.append(pltpu.VMEM((_PB, L, L2), jnp.int32))
    S = pl.pallas_call(
        functools.partial(_binarize_kernel, kappa, mutual, dual, L),
        grid=(Bp // _PB,),
        in_specs=[
            pl.BlockSpec((_PB, L, L2), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp,), lambda b: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((Bp,), lambda b: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_PB, L, L2), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, L, L2), jnp.uint8),
        scratch_shapes=scratch,
        interpret=interpret,
    )(D, l1, l2)
    S = S[:B]
    # zero-neighbor degenerate pairs: all-zero CRP (`CRPUtils.py:194`)
    kr = jnp.round(kappa * l2.astype(jnp.float32)[:B]) > 0
    if mutual:
        kr = kr & (jnp.round(kappa * l1.astype(jnp.float32)[:B]) > 0)
    return S * kr[:, None, None].astype(S.dtype)


# ---------------------------------------------------------------------------
# Row-kNN threshold mask: the get_S selection of the SNF diffusion
# ---------------------------------------------------------------------------
#
# `fusion.get_S` truncates each row of an affinity matrix to its k
# LARGEST entries (rank threshold, ties kept — `SimilarityFusion.py:
# 157-177`) before the diffusion einsums. On the EarlySNF tile the XLA
# `lax.top_k` over the fused 896-wide rows measured 17.2 ms of the tile
# (RESULTS.md round-4 selection micro-benchmarks). The k-th value is a
# pure rank statistic, so the same 32-pass bit-pattern search emits the
# EXACT threshold and the masked matrix bit-identically — in both the
# parity and throughput SNF modes.

def _knn_mask_kernel(largest, RB, n, w_ref, k_ref, v_ref, bits_ref):
    # grid = (B, rows/RB): selections are row-independent, so each
    # step owns an (RB, n) row slab — keeps VMEM (with Pallas's
    # double-buffered blocks) bounded at any n (a whole-(n, n) block
    # OOMed scoped vmem at n >= 896)
    g = pl.program_id(0)
    W = w_ref[0]
    D = -W if largest else W
    D = jnp.where(D == 0.0, jnp.float32(0.0), D)
    b = D.view(jnp.int32)
    bits_ref[0] = b ^ (jax.lax.shift_right_arithmetic(b, 31)
                       & jnp.int32(0x7FFFFFFF))
    k = jnp.clip(k_ref[g], 1, n).astype(jnp.float32)
    bits = bits_ref[0]

    def search(it, carry):
        lo, hi = carry
        mid = (lo & hi) + jax.lax.shift_right_arithmetic(lo ^ hi, 1)
        cnt = jnp.sum((bits <= mid).astype(jnp.float32),
                      axis=1, keepdims=True)
        ge = cnt >= k
        return (jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi))

    init = (jnp.full((RB, 1), _MIN_FINITE_KEY, jnp.int32),
            jnp.full((RB, 1), _MAX_FINITE_BITS, jnp.int32))
    _, t = jax.lax.fori_loop(0, 32, search, init)
    v_ref[0] = jnp.where(bits <= t, w_ref[0], jnp.float32(0.0))


# Mosaic keeps ~22 slab-sized fp32 temporaries live on the kernel VMEM
# stack for `_knn_mask_kernel` (measured from the compiler's scoped-vmem
# reports: 18.07M at a (224, 896) slab and 23.69M at (256, 1024), i.e.
# ~90 bytes/element against the 16M scoped limit). The slab must be
# sized by THAT constant — the previous 4-copies (16 B/elem) estimate
# OOMed scoped vmem at n >= 896 inside the EarlySNF tile program.
_STACK_BYTES_PER_ELEM = 96


def _row_block(n: int, budget_bytes: int = 10 << 20) -> tuple[int, int]:
    """Row-slab height RB (a power of two >= 8) and the padded row
    count n_pad = ceil(n / RB) * RB it tiles. Rows are independent, so
    callers pad the input rows to n_pad and slice the output back —
    this keeps the slab under `budget_bytes` of estimated kernel-stack
    VMEM for ANY n, including odd-factor widths (e.g. 896 = 128 * 7)
    where the old halve-while-even search stalled above the cap."""
    cap = max(budget_bytes // (_STACK_BYTES_PER_ELEM * n), 8)
    if n <= cap:
        return n, n
    rb = 8
    while rb * 2 <= cap:
        rb *= 2
    return rb, -(-n // rb) * rb


def _knn_mask_call(W, k, largest: bool, interpret: bool):
    B, n, n2 = W.shape
    RB, n_pad = _row_block(n)
    if n_pad != n:
        # padded rows are all-zero -> masked output rows are all-zero;
        # sliced off below, never observed
        W = jnp.pad(W, ((0, 0), (0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_knn_mask_kernel, largest, RB, n2),
        grid=(B, n_pad // RB),
        in_specs=[
            pl.BlockSpec((1, RB, n2), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B,), lambda b, r: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, RB, n2), lambda b, r: (b, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, n2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, RB, n2), jnp.int32)],
        interpret=interpret,
    )(W, k)
    return out[:, :n] if n_pad != n else out


_KNN_VMAP_CACHE: dict = {}


def _knn_mask_vmappable(largest: bool, interpret: bool):
    """`_knn_mask_call` wrapped in a custom_vmap that FLATTENS mapped
    axes into the kernel's grid axis. The call sites sit inside vmapped
    per-pair functions (`fusion._get_S_stack` under the EarlySNF tile's
    pair grid); pallas_call's default batching rule adds leading grid
    dims whose squeezed SMEM block spec fails the Mosaic TPU lowering
    (observed: `(Squeezed, Squeezed, Blocked(2))` on args[1]).
    Flattening is exact — the kernel is independent per matrix."""
    key = (largest, interpret)
    fn = _KNN_VMAP_CACHE.get(key)
    if fn is not None:
        return fn

    @jax.custom_batching.custom_vmap
    def fn(W, k):
        return _knn_mask_call(W, k, largest, interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, W, k):   # noqa: ANN001
        wb, kb = in_batched
        if not wb:
            W = jnp.broadcast_to(W[None], (axis_size,) + W.shape)
        if not kb:
            k = jnp.broadcast_to(k[None], (axis_size,) + k.shape)
        out = fn(W.reshape((-1,) + W.shape[2:]), k.reshape(-1))
        return out.reshape(W.shape), True

    _KNN_VMAP_CACHE[key] = fn
    return fn


# ---------------------------------------------------------------------------
# Fused WCSMSSM affinity build (throughput mode)
# ---------------------------------------------------------------------------
#
# `fusion.get_WCSMSSM` builds the joint SNF parent affinity
# [[W_SSMA, W_CSM], [W_CSM^T, W_SSMB]] with SIX mean-of-k-smallest
# selections per build (`SimilarityFusion.py:50-132` semantics) — the
# largest EarlySNF tile compute component after the fast-SNF change
# (44.7 ms of the tile, RESULTS.md round-4 decomposition). This kernel
# fuses the whole build in VMEM: the k-th order statistics come from
# the same 32-pass bit-pattern search, and the mean of the k smallest
# is reconstructed as sum(values < t) + (k - count<t) * t — the same
# SET of values as the XLA ascending cumsum, summed in row order, so
# results are VALUE-equal up to fp32 summation order (~1e-6 relative),
# NOT bit-identical. It therefore serves the EXPLICIT throughput mode
# only (`EarlySNF(snf_precision="default")`, CLI --snf-precision);
# the parity path keeps the XLA build.

def _key_of(D):
    """Signed monotone int32 keys (see `_binarize_kernel`)."""
    D = jnp.where(D == 0.0, jnp.float32(0.0), D)
    b = D.view(jnp.int32)
    return b ^ (jax.lax.shift_right_arithmetic(b, 31)
                & jnp.int32(0x7FFFFFFF))


def _mean_k_smallest_vmem(vals, k, axis):
    """Per-row (axis=1) / per-col (axis=0) mean of the k smallest
    entries of a VMEM-resident (L, N) matrix; k a traced float scalar
    (already clipped to [1, width])."""
    keys = _key_of(vals)
    L, N = vals.shape
    shape = (L, 1) if axis == 1 else (1, N)

    def body(it, c):
        lo, hi = c
        mid = (lo & hi) + jax.lax.shift_right_arithmetic(lo ^ hi, 1)
        cnt = jnp.sum((keys <= mid).astype(jnp.float32),
                      axis=axis, keepdims=True)
        ge = cnt >= k
        return (jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi))

    lo = jnp.full(shape, _MIN_FINITE_KEY, jnp.int32)
    hi = jnp.full(shape, _MAX_FINITE_BITS, jnp.int32)
    _, t_key = jax.lax.fori_loop(0, 32, body, (lo, hi))
    t_val = jax.lax.bitcast_convert_type(
        t_key ^ (jax.lax.shift_right_arithmetic(t_key, 31)
                 & jnp.int32(0x7FFFFFFF)), jnp.float32)
    lt = keys < t_key
    cnt_lt = jnp.sum(lt.astype(jnp.float32), axis=axis, keepdims=True)
    s_lt = jnp.sum(jnp.where(lt, vals, 0.0), axis=axis, keepdims=True)
    return (s_lt + (k - cnt_lt) * t_val) / k


def _wcsmssm_kernel(Mu, L,
                    ssma_ref, ssmb_ref, csm_ref,
                    l1_ref, l2_ref, K_ref,
                    wa_ref, wb_ref, wc_ref):
    g = pl.program_id(0)
    m_len = l1_ref[g]
    n_len = l2_ref[g]
    K = K_ref[g]
    # neighbor budget split (`SimilarityFusion.py:110-132`)
    k1 = (K * m_len) // jnp.maximum(m_len + n_len, 1)
    k2 = K - k1
    ii = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    big = jnp.float32(1e30)          # fusion._BIG, bit-exactly

    def clipf(k):
        return jnp.clip(k, 1, L).astype(jnp.float32)

    def gw(D, K_, length):
        # `fusion.get_W` (SimilarityFusion.py:50-71 / Eq. 1)
        DSym = 0.5 * (D + D.T)
        DSym = jnp.where(ii == jj, 0.0, DSym)
        col_ok = jj < length
        Dknn = jnp.where(col_ok, DSym, big)
        mean_raw = _mean_k_smallest_vmem(Dknn, clipf(K_ + 1), axis=1)
        Kf = K_.astype(jnp.float32)
        mean_d = mean_raw * (Kf + 1.0) / jnp.maximum(Kf, 1.0)
        eps = (mean_d + mean_d.reshape(1, L) + DSym) / 3.0
        denom = 2.0 * (Mu * eps) ** 2
        denom = jnp.where(denom == 0, 1.0, denom)
        W = jnp.exp(-DSym * DSym / denom)
        return jnp.where((ii < length) & col_ok, W, 0.0)

    def gwc(C):
        # `fusion.get_WCSM` (SimilarityFusion.py:74-89), incl. the
        # zero-denominator guard deviation documented there
        Cm = jnp.where(jj < n_len, C, big)
        Cm = jnp.where(ii < m_len, Cm, big)
        m1 = _mean_k_smallest_vmem(Cm, clipf(k2), axis=1)   # (L, 1)
        m2 = _mean_k_smallest_vmem(Cm, clipf(k1), axis=0)   # (1, L)
        eps = (m1 + m2 + C) / 3.0
        denom = 2.0 * (Mu * eps) ** 2
        denom = jnp.where(denom == 0, 1.0, denom)
        W = jnp.exp(-C * C / denom)
        return jnp.where((ii < m_len) & (jj < n_len), W, 0.0)

    wa_ref[0] = gw(ssma_ref[0], k1, m_len)
    wb_ref[0] = gw(ssmb_ref[0], k2, n_len)
    wc_ref[0] = gwc(csm_ref[0])


def _wcsmssm_call(SSMA, SSMB, CSM, l1, l2, K, Mu: float,
                  interpret: bool):
    B, L, L2 = SSMA.shape
    blk = pl.BlockSpec((1, L, L2), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((B,), lambda b: (0,), memory_space=pltpu.SMEM)
    # quadrants come out separately (one (2L, 2L) out block + in-kernel
    # concats would blow the double-buffered VMEM budget); XLA
    # assembles [[WA, WC], [WC^T, WB]] outside
    WA, WB, WC = pl.pallas_call(
        functools.partial(_wcsmssm_kernel, Mu, L),
        grid=(B,),
        in_specs=[blk, blk, blk, smem, smem, smem],
        out_specs=(blk, blk, blk),
        out_shape=tuple(jax.ShapeDtypeStruct((B, L, L2), jnp.float32)
                        for _ in range(3)),
        interpret=interpret,
    )(SSMA, SSMB, CSM, l1, l2, K)
    top = jnp.concatenate([WA, WC], axis=2)
    bot = jnp.concatenate([jnp.swapaxes(WC, 1, 2), WB], axis=2)
    return jnp.concatenate([top, bot], axis=1)


_WCSMSSM_VMAP_CACHE: dict = {}


def _wcsmssm_vmappable(Mu: float, interpret: bool):
    """`_wcsmssm_call` with mapped axes flattened into the grid axis
    (same custom_vmap scheme as `_knn_mask_vmappable` — the call sites
    sit inside the EarlySNF tile's vmapped per-pair function)."""
    key = (Mu, interpret)
    fn = _WCSMSSM_VMAP_CACHE.get(key)
    if fn is not None:
        return fn

    @jax.custom_batching.custom_vmap
    def fn(SSMA, SSMB, CSM, l1, l2, K):
        return _wcsmssm_call(SSMA, SSMB, CSM, l1, l2, K, Mu, interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, *args):   # noqa: ANN001
        full = []
        for a, ab in zip(args, in_batched):
            if not ab:
                a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            full.append(a)
        SSMA, SSMB, CSM, l1, l2, K = full
        out = fn(SSMA.reshape((-1,) + SSMA.shape[2:]),
                 SSMB.reshape((-1,) + SSMB.shape[2:]),
                 CSM.reshape((-1,) + CSM.shape[2:]),
                 l1.reshape(-1), l2.reshape(-1), K.reshape(-1))
        return out.reshape(SSMA.shape[:2] + out.shape[1:]), True

    _WCSMSSM_VMAP_CACHE[key] = fn
    return fn


@functools.partial(jax.jit, static_argnames=("Mu", "interpret"))
def wcsmssm_batch(SSMA, SSMB, CSM, l1, l2, K, Mu: float = 0.5,
                  interpret: bool = False):
    """Batched fused WCSMSSM parent affinities (B, 2L, 2L).

    Value-equal to `fusion.get_WCSMSSM` up to fp32 summation order in
    the neighborhood means (~1e-6 relative) — a THROUGHPUT mode, not
    for bit-parity runs. l1/l2: (B,) valid row/col counts; K: (B,)
    int32 neighbor budgets (kappa * (l1 + l2) at the call site).
    vmap-safe: mapped axes flatten into the grid axis."""
    SSMA = jnp.asarray(SSMA, jnp.float32)
    SSMB = jnp.asarray(SSMB, jnp.float32)
    CSM = jnp.asarray(CSM, jnp.float32)
    B = SSMA.shape[0]
    l1 = jnp.broadcast_to(jnp.asarray(l1, jnp.int32), (B,))
    l2 = jnp.broadcast_to(jnp.asarray(l2, jnp.int32), (B,))
    K = jnp.broadcast_to(jnp.asarray(K, jnp.int32), (B,))
    return _wcsmssm_vmappable(Mu, interpret)(SSMA, SSMB, CSM, l1, l2, K)


@functools.partial(
    jax.jit, static_argnames=("largest", "interpret"))
def knn_mask_matrix_batch(W, k, largest: bool = True,
                          interpret: bool = False):
    """Per-row rank-threshold mask of a (B, n, n) float32 batch.

    Returns `jnp.where(W >= t, W, 0)` with t the per-row k[b]-th
    LARGEST value (or k-th smallest with `largest=False`) — ties at the
    threshold all kept, bit-identical to the `fusion.get_S` /
    `fusion._kth_smallest` rank-threshold convention. k: (B,) int32,
    may be traced; clamped to [1, n] like the XLA path. vmap-safe:
    mapped axes flatten into the grid axis (see `_knn_mask_vmappable`).
    """
    W = jnp.asarray(W, jnp.float32)
    B = W.shape[0]
    k = jnp.broadcast_to(jnp.asarray(k, jnp.int32), (B,))
    return _knn_mask_vmappable(largest, interpret)(W, k)
