"""Shared pipeline of the structural algorithm family (Struc*).

Parity target: the common `load_features` preamble of
`StrucFTM2D.py:70-120`, `StrucShingles.py`, `StrucLaplacian.py:60-120`,
`StrucScattering.py`: beat-synchronous (or uniformly downsampled) HPCP /
MFCC / tempogram stacks (wins_per_block history embedding), their
SSM / cosine-CSM distance matrices, and SNF fusion into one W.

NOTE (reference quirk, not replicated): the reference zero-pads the
matrices in the `Ds` LIST when they are smaller than 2K
(`StrucFTM2D.py:107-112`) but then passes the ORIGINAL unpadded variables
to the fusion call (`StrucFTM2D.py:119`), making the pad dead code. We pad
the matrices actually fused (the evident intent).
"""

from __future__ import annotations

import numpy as np

from acoss_tpu.data.store import FeatureSet
from acoss_tpu.features.rhythm import tempogram_aggregated
from acoss_tpu.ops import crp, fusion
from acoss_tpu.ops.segment import stack_memory, sync_agg


def autotune_k(K: int, n: int) -> int:
    """K = -1 -> 2 * log2(n) (`StrucFTM2D.py:114-117`)."""
    if K == -1:
        return int(np.round(2 * np.log(n) / np.log(2)))
    return K


def structural_fused_w(
    fs: FeatureSet,
    i: int,
    chroma_type: str = "hpcp",
    wins_per_block: int = 20,
    K: int = 10,
    niters: int = 10,
    do_sync: bool = True,
    downsample_fac: int = 40,
    fuse_features: tuple = ("mfcc", "hpcp", "tempogram"),
    tempogram_win: int = 384,
    sequential: bool = True,
):
    """Fused structural affinity matrix for song `i`.

    Returns (WFused (n, n) np.float32, onsets (n,) int64).
    """
    clen = fs.length(chroma_type)[i]
    mlen = fs.length("mfcc_htk")[i]
    hpcp = fs.feature(chroma_type)[i, :clen]
    mfcc = np.nan_to_num(fs.feature("mfcc_htk")[i, :mlen],
                         nan=0.0, posinf=0.0, neginf=0.0)
    snovfn = fs.feature("snovfn")[i, :fs.length("snovfn")[i], 0]
    if do_sync:
        olen = fs.length("onsets")[i]
        onsets = fs.feature("onsets")[i, :olen, 0].astype(np.int64)
    else:
        onsets = np.arange(0, mfcc.shape[0], downsample_fac)

    def prep(x, agg):
        y = sync_agg(x, onsets, agg)
        y = np.nan_to_num(y, nan=0.0, posinf=0.0, neginf=0.0)
        return stack_memory(y, wins_per_block, 1).astype(np.float32)

    Ds = []
    for name in fuse_features:
        if name == "mfcc":
            Ds.append(np.asarray(crp.get_ssm(prep(mfcc, "mean"))))
        elif name == "hpcp":
            h = prep(hpcp, "median")
            Ds.append(np.asarray(crp.get_csm_cosine(h, h)))
        elif name == "tempogram":
            # mean beat-sync fused into the device tempogram program (the
            # full (L, win) tempogram never crosses the host boundary)
            tg_sync = tempogram_aggregated(snovfn, onsets, tempogram_win)
            tg_sync = np.nan_to_num(tg_sync, nan=0.0, posinf=0.0,
                                    neginf=0.0)
            st = stack_memory(tg_sync, wins_per_block, 1).astype(np.float32)
            Ds.append(np.asarray(crp.get_ssm(st)))
        else:
            raise ValueError(name)
    n = min(D.shape[0] for D in Ds)
    pK = autotune_k(K, n)
    # Bucket-pad the fusion input so a whole corpus compiles O(few) jitted
    # SNF shapes (per-song n would otherwise recompile the diffusion scan
    # for every song); padding is masked exactly inside snf_padded.
    bucket = 128
    npad = max(-(-n // bucket) * bucket, 2 * pK, bucket)
    padded = np.zeros((len(Ds), npad, npad), dtype=np.float32)
    for k_, D in enumerate(Ds):
        padded[k_, :n, :n] = D[:n, :n]
    WFused = fusion.snf_padded(padded, pK, niters=niters, length=n,
                               sequential=sequential)
    return np.asarray(WFused, dtype=np.float32)[:n, :n], onsets[:n]


def sparse_top_shingle(flat: np.ndarray, n_keep: int):
    """log(flat / ||flat|| + 1), keep only the n_keep largest entries
    (`StrucFTM2D.py:136-143`). Returns (indices, values) sorted by index."""
    n = np.sqrt(np.sum(flat.astype(np.float64) ** 2))
    s = np.log(flat / (n if n > 0 else 1.0) + 1)
    if n_keep >= s.size:
        idx = np.arange(s.size)
    else:
        cutoff = -np.partition(-s, n_keep)[n_keep - 1]
        idx = np.flatnonzero(s >= cutoff)[:n_keep]
    return idx.astype(np.int64), s[idx].astype(np.float32)
