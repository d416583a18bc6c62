"""Segment (beat-synchronous) aggregation helpers.

Replaces the reference's use of `librosa.util.sync` (median/mean aggregation
between boundary frames — used by FTM2D at `FTM2D.py:90` and Serra09 at
`Serra09.py:104,111`). Semantics match librosa: boundaries are augmented
with 0 and L, clipped, uniqued; output has len(boundaries)-1 segments.

These run host-side in numpy: they execute once per song (O(N) total) on
ragged data, while everything O(N^2) runs on device.
"""

from __future__ import annotations

import numpy as np


def fix_frames(boundaries: np.ndarray, length: int) -> np.ndarray:
    """Augment boundary frames with 0 and `length`, clip, unique."""
    b = np.concatenate([[0], np.asarray(boundaries).ravel(), [length]])
    b = np.clip(b, 0, length)
    return np.unique(b).astype(np.int64)


def sync_agg(X: np.ndarray, boundaries: np.ndarray,
             aggregate: str = "median") -> np.ndarray:
    """Aggregate frames of X (L, d) between consecutive boundaries.

    Returns (n_segments, d) with n_segments = len(fix_frames)-1.
    """
    L = X.shape[0]
    b = fix_frames(boundaries, L)
    if aggregate == "mean":
        sums = np.add.reduceat(np.asarray(X, np.float64), b[:-1], axis=0)
        counts = np.diff(b)
        return sums / counts[:, None]
    out = np.empty((len(b) - 1, X.shape[1]), dtype=np.float64)
    for k in range(len(b) - 1):
        out[k] = np.median(X[b[k]:b[k + 1]], axis=0)
    return out


def _uniform_median(X: np.ndarray, fac: int) -> np.ndarray:
    """Median over fixed windows of `fac` frames (+ remainder window) —
    the reshape fast path of `uniform_downsample`."""
    L, d = X.shape
    nfull = L // fac
    out_full = np.median(
        X[:nfull * fac].reshape(nfull, fac, d), axis=1)
    if L % fac:
        rem = np.median(X[nfull * fac:], axis=0, keepdims=True)
        return np.concatenate([out_full, rem], axis=0)
    return out_full


def uniform_downsample(X: np.ndarray, fac: int,
                       aggregate: str = "median") -> np.ndarray:
    """Downsample (L, d) by aggregating windows of `fac` frames — the
    reference's `librosa.util.sync(X.T, np.arange(0, L, fac), ...)`
    (`Serra09.py:104`)."""
    if aggregate == "median":
        return _uniform_median(np.asarray(X), fac)
    return sync_agg(X, np.arange(0, X.shape[0], fac), aggregate)


def stack_memory(X: np.ndarray, n_steps: int, delay: int = 1) -> np.ndarray:
    """History (delay) embedding with zero padding, frames-first.

    librosa.feature.stack_memory semantics transposed: X (t, d) ->
    (t, d * n_steps) where column block k is X delayed by k * delay frames
    (zeros shifted in at the start), matching the layout
    `get_csm_blocked_oti` expects (block-major feature axis).

    NOTE: the reference calls `stack_memory(chroma, self.tau, self.m)`
    (`ChenFusion.py:53`) which binds n_steps=tau=1, delay=m=9 — an
    effective no-op (the intended call is n_steps=m, delay=tau, the Chen
    2017 delay embedding). We implement the intended embedding; pass
    n_steps=1 to reproduce the reference's literal behavior.
    """
    t, d = X.shape
    blocks = []
    for k in range(n_steps):
        s = k * delay
        blk = np.zeros_like(X)
        if s < t:
            blk[s:] = X[:t - s]
        blocks.append(blk)
    return np.concatenate(blocks, axis=1)
