"""Batched anti-diagonal wavefront alignment kernels (qmax / dmax / SW).

TPU-native re-design of the reference's C aligners
(`/root/reference/benchmarking/SequenceAlignment.c:73-180`, exposed via the
Cython module `pySeqAlign`, `pySeqAlign.pyx:7-23`). The C code fills an M x N
dynamic-programming table cell-by-cell; here the table is computed one
*anti-diagonal* at a time: every cell on diagonal d = i + j depends only on
diagonals d-2..d-4, so a whole diagonal is one vector op, and a whole batch of
song pairs is processed simultaneously (`lax.scan` over diagonals, batch and
lane axes vectorized on the VPU).

Layout trick: the skew ("shear") of S into diagonal-major form is a pure
pad + reshape — pad each row of S (M, N) with M zeros, view the flat buffer as
(M, N + M - 1); then column d of that view is exactly anti-diagonal d of S,
and every out-of-matrix entry provably lands in the zero padding. No gathers.

Semantics parity notes (vs `SequenceAlignment.c`):
- qmax   (`:113-143`): recurrence over preds (i-1,j-1),(i-2,j-1),(i-1,j-2);
  match +1, else state-dependent gap penalty clamped at 0; loops start at
  i,j >= 2; returns 0 when M < 3 or N < 3 (`:117`).
- dmax   (`:147-180`): adds (i-3,j-1),(i-1,j-3) paths accumulating
  intermediate S values; loops start at i,j >= 3; returns 0 when
  M < 4 or N < 4 (`:151`).
- swconstrained (`:73-99`): +-1 match score with affine Delta gaps
  (opening -0.5, extension -0.7); the C code indexes a (N+1)x(M+1) D table,
  which is equivalent to the 0-based recurrence implemented here; returns 0
  when M < 3 or N < 3 (`:78`).

Inputs are padded to static (M, N); per-pair true lengths are passed
separately. S MUST be zero in the padding (guaranteed by
`acoss_tpu.ops.crp.csm_to_binary`); padded cells then never raise the max,
which is additionally restricted to in-bounds cells.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def skew(S: jax.Array) -> jax.Array:
    """Shear (..., M, N) -> (..., M + N - 1, M): column-major anti-diagonals.

    out[..., d, i] = S[..., i, d - i] when 0 <= d - i < N, else exactly 0.
    Pure pad + reshape + transpose; no gathers.
    """
    *lead, M, N = S.shape
    P = jnp.pad(S, [(0, 0)] * len(lead) + [(0, 0), (0, M)])
    flat = P.reshape(*lead, M * (N + M))
    flat = jax.lax.slice_in_dim(flat, 0, M * (N + M - 1), axis=-1)
    sheared = flat.reshape(*lead, M, N + M - 1)
    return jnp.moveaxis(sheared, -1, -2)


def _shift(x: jax.Array, k: int) -> jax.Array:
    """shift(x, k)[..., i] = x[..., i - k], zeros shifted in at the front."""
    if k == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(k, 0)]
    return jnp.pad(x, pad)[..., : x.shape[-1]]


def _prep(S, m_len, n_len):
    S = jnp.asarray(S)
    if S.ndim == 2:
        S = S[None]
    B, M, N = S.shape
    m_len = jnp.broadcast_to(jnp.asarray(m_len, jnp.int32), (B,))
    n_len = jnp.broadcast_to(jnp.asarray(n_len, jnp.int32), (B,))
    Sk = skew(S)  # (B, M+N-1, M)
    xs = (jnp.moveaxis(Sk, 1, 0), jnp.arange(M + N - 1, dtype=jnp.int32))
    # Derive the zero carries from the inputs so they inherit any
    # shard_map varying-manual-axes provenance (scan requires carry-in and
    # carry-out types to match, including vma, under shard_map).
    z = (S[:, :, 0] * 0).astype(jnp.float32)        # (B, M) zeros
    best0 = z[:, 0]                                 # (B,)  zeros
    return S, Sk, xs, B, M, N, m_len, n_len, z, best0


@functools.partial(jax.jit, static_argnames=("gap_onset", "gap_extension"))
def qmax_batch(
    S: jax.Array,
    m_len: jax.Array,
    n_len: jax.Array,
    gap_onset: float = 0.5,
    gap_extension: float = 0.5,
) -> jax.Array:
    """Batched Serra 2009 Qmax scores.

    Args:
      S: (B, M, N) binary CRP (uint8/float), zero outside (m_len, n_len).
      m_len, n_len: (B,) true row/col counts.
      gap_onset / gap_extension: penalty after a match / after a gap
        (both 0.5 in the reference, `SequenceAlignment.c:104-111`).

    Returns: (B,) float32 max-cell scores (unnormalized, like the C kernel;
    callers divide by m_len + n_len as in `Serra09.py:174`).
    """
    S, Sk, xs, B, M, N, m_len, n_len, z, best0 = _prep(S, m_len, n_len)
    i_idx = jnp.arange(M, dtype=jnp.int32)
    const_gap = gap_onset == gap_extension

    def gamma(sd):
        return jnp.where(sd > 0, gap_onset, gap_extension)

    def step(carry, x):
        # D1..D3 = diagonals d-1..d-3 of the DP table; G* = gamma(S) there.
        D1, D2, D3, G1, G2, G3, best = carry
        sd_raw, d = x
        sd = sd_raw.astype(jnp.float32)
        p1 = _shift(D2, 1)  # (i-1, j-1)
        p2 = _shift(D3, 2)  # (i-2, j-1)
        p3 = _shift(D3, 1)  # (i-1, j-2)
        match = jnp.maximum(jnp.maximum(p1, p2), p3) + 1.0
        if const_gap:
            gap = jnp.maximum(
                jnp.maximum(jnp.maximum(p1, p2), p3) - gap_extension, 0.0
            )
            Gd = z
        else:
            g1 = _shift(G2, 1)
            g2 = _shift(G3, 2)
            g3 = _shift(G3, 1)
            gap = jnp.maximum(
                jnp.maximum(jnp.maximum(p1 - g1, p2 - g2), p3 - g3), 0.0
            )
            Gd = gamma(sd)
        Dd = jnp.where(sd > 0, match, gap)
        j = d - i_idx
        band = (i_idx >= 2) & (j >= 2)
        in_bounds = (i_idx[None, :] < m_len[:, None]) & (
            (j >= 0)[None, :] & (j[None, :] < n_len[:, None])
        )
        Dd = jnp.where(band[None, :] & in_bounds, Dd, 0.0)
        best = jnp.maximum(best, jnp.max(Dd, axis=-1))
        return (Dd, D1, D2, Gd, G1, G2, best), None

    init = (z, z, z, z, z, z, best0)
    (_, _, _, _, _, _, best), _ = jax.lax.scan(step, init, xs)
    ok = (m_len >= 3) & (n_len >= 3)
    return jnp.where(ok, best, 0.0)


@functools.partial(jax.jit, static_argnames=("gap_onset", "gap_extension"))
def dmax_batch(
    S: jax.Array,
    m_len: jax.Array,
    n_len: jax.Array,
    gap_onset: float = 0.5,
    gap_extension: float = 0.5,
) -> jax.Array:
    """Batched Chen 2017 Dmax scores (`SequenceAlignment.c:147-180`).

    Five predecessors; the (i-2,j-1)/(i-1,j-2)/(i-3,j-1)/(i-1,j-3) paths
    accumulate the intermediate S values they skip over.
    """
    S, Sk, xs, B, M, N, m_len, n_len, z, best0 = _prep(S, m_len, n_len)
    i_idx = jnp.arange(M, dtype=jnp.int32)

    def gamma(sd):
        return jnp.where(sd > 0, gap_onset, gap_extension)

    def step(carry, x):
        # D1..D4: DP diagonals d-1..d-4. S1, S2: S diagonals d-1, d-2.
        # G2..G4: gamma(S) diagonals d-2..d-4.
        D1, D2, D3, D4, S1, S2, G2, G3, G4, best = carry
        sd_raw, d = x
        sd = sd_raw.astype(jnp.float32)
        # Intermediate S values skipped by the long paths:
        sa = _shift(S1, 1)  # S[i-1, j]
        sb = S1             # S[i,   j-1]
        sc = _shift(S2, 2)  # S[i-2, j]
        se = S2             # S[i,   j-2]
        p1 = _shift(D2, 1)       # D[i-1, j-1]
        p2 = _shift(D3, 2) + sa  # D[i-2, j-1] + S[i-1, j]
        p3 = _shift(D3, 1) + sb  # D[i-1, j-2] + S[i, j-1]
        p4 = _shift(D4, 3) + sc + sa  # D[i-3, j-1] + S[i-2, j] + S[i-1, j]
        p5 = _shift(D4, 1) + se + sb  # D[i-1, j-3] + S[i, j-2] + S[i, j-1]
        m5 = jnp.maximum(
            jnp.maximum(jnp.maximum(p1, p2), p3), jnp.maximum(p4, p5)
        )
        match = m5 + 1.0
        g1 = _shift(G2, 1)
        g2 = _shift(G3, 2)
        g3 = _shift(G3, 1)
        g4 = _shift(G4, 3)
        g5 = _shift(G4, 1)
        gap = jnp.maximum(
            jnp.maximum(
                jnp.maximum(p1 - g1, p2 - g2),
                jnp.maximum(p3 - g3, p4 - g4),
            ),
            jnp.maximum(p5 - g5, 0.0),
        )
        Dd = jnp.where(sd > 0, match, gap)
        j = d - i_idx
        band = (i_idx >= 3) & (j >= 3)
        in_bounds = (i_idx[None, :] < m_len[:, None]) & (
            (j >= 0)[None, :] & (j[None, :] < n_len[:, None])
        )
        Dd = jnp.where(band[None, :] & in_bounds, Dd, 0.0)
        best = jnp.maximum(best, jnp.max(Dd, axis=-1))
        # Rotation: at the next step, G2 must be gamma(S diag d-1) = gamma(S1).
        return (Dd, D1, D2, D3, sd, S1, gamma(S1), G2, G3, best), None

    init = (z, z, z, z, z, z, z, z, z, best0)
    (*_, best), _ = jax.lax.scan(step, init, xs)
    ok = (m_len >= 4) & (n_len >= 4)
    return jnp.where(ok, best, 0.0)


@functools.partial(jax.jit, static_argnames=("gap_opening", "gap_extension", "match_score", "mismatch_score"))
def swconstrained_batch(
    S: jax.Array,
    m_len: jax.Array,
    n_len: jax.Array,
    gap_opening: float = -0.5,
    gap_extension: float = -0.7,
    match_score: float = 1.0,
    mismatch_score: float = -1.0,
) -> jax.Array:
    """Batched constrained Smith-Waterman (`SequenceAlignment.c:73-99`).

    0-based recurrence equivalent to the C code's offset (N+1)x(M+1) table:
    for a, b >= 2:
      MS = S[a,b] ? match : mismatch
      D[a,b] = max(0, max over preds p in {(a-1,b-1),(a-2,b-1),(a-1,b-2)} of
                   D[p] + MS + Delta(S[p], S[a,b]))
    Delta(prev, cur) = 0 if cur > 0 else (gap_opening if prev > 0
                                          else gap_extension)   (`:43-54`).
    """
    S, Sk, xs, B, M, N, m_len, n_len, z, best0 = _prep(S, m_len, n_len)
    i_idx = jnp.arange(M, dtype=jnp.int32)

    def step(carry, x):
        # D2, D3: DP diagonals d-2, d-3. S2, S3: S diagonals d-2, d-3.
        D1, D2, D3, S1, S2, S3, best = carry
        sd_raw, d = x
        sd = sd_raw.astype(jnp.float32)
        ms = jnp.where(sd > 0, match_score, mismatch_score)
        # Delta depends on S at the predecessor cell and the current cell.
        cur_match = sd > 0
        sp1 = _shift(S2, 1)  # S[a-1, b-1]
        sp2 = _shift(S3, 2)  # S[a-2, b-1]
        sp3 = _shift(S3, 1)  # S[a-1, b-2]

        def delta(sprev):
            return jnp.where(
                cur_match,
                0.0,
                jnp.where(sprev > 0, gap_opening, gap_extension),
            )

        d1 = _shift(D2, 1) + ms + delta(sp1)
        d2 = _shift(D3, 2) + ms + delta(sp2)
        d3 = _shift(D3, 1) + ms + delta(sp3)
        Dd = jnp.maximum(jnp.maximum(jnp.maximum(d1, d2), d3), 0.0)
        j = d - i_idx
        band = (i_idx >= 2) & (j >= 2)
        in_bounds = (i_idx[None, :] < m_len[:, None]) & (
            (j >= 0)[None, :] & (j[None, :] < n_len[:, None])
        )
        Dd = jnp.where(band[None, :] & in_bounds, Dd, 0.0)
        best = jnp.maximum(best, jnp.max(Dd, axis=-1))
        return (Dd, D1, D2, sd, S1, S2, best), None

    init = (z, z, z, z, z, z, best0)
    (*_, best), _ = jax.lax.scan(step, init, xs)
    ok = (m_len >= 3) & (n_len >= 3)
    return jnp.where(ok, best, 0.0)


def _single(batch_fn):
    def fn(S, m_len=None, n_len=None, **kw):
        S = jnp.asarray(S)
        M, N = S.shape
        m = M if m_len is None else m_len
        n = N if n_len is None else n_len
        return batch_fn(S[None], jnp.array([m]), jnp.array([n]), **kw)[0]

    return fn


qmax = _single(qmax_batch)
qmax.__doc__ = "Single-pair qmax; see `qmax_batch`."
dmax = _single(dmax_batch)
dmax.__doc__ = "Single-pair dmax; see `dmax_batch`."
swconstrained = _single(swconstrained_batch)
swconstrained.__doc__ = "Single-pair constrained SW; see `swconstrained_batch`."
