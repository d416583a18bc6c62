"""ANFScattering: 1D scattering of audio novelty functions.

Parity target: `/root/reference/benchmarking/ANFScattering.py:10-67`:
novelty functions polyphase-resampled to T = 2^14; per function (a) global
z-normalized Scattering1D(J=6, Q=8) and (b) a 16-segment shingle (each
segment z-normalized, scattered at T/16, median over segments, unit norm);
pair score = plain Euclidean DISTANCE (`ANFScattering.py:54-67` stores
distances — eval negates).

Descriptors are fixed-size, so the sweep is one Gram matmul
(`full_scores`).
"""

from __future__ import annotations

import numpy as np
import scipy.signal

import jax
import jax.numpy as jnp

from acoss_tpu.benchmarking.harness import CoverAlgorithm
from acoss_tpu.data.store import FeatureSet
from acoss_tpu.ops.scattering import Scattering1D

DOWNSAMPLE_FAC = 16


class ANFScattering(CoverAlgorithm):
    NAME = "ANFScattering"
    SIMILARITY_TYPES = ("anfrnn", "anfrnn_shingle",
                        "anfsuperflux", "anfsuperflux_shingle")
    DISTANCE_TYPES = SIMILARITY_TYPES
    SYMMETRIC = True

    def __init__(self, J: int = 6, T: int = 2 ** 14, Q: int = 8):
        self.J = J
        self.T = T
        self.Q = Q
        self.S = Scattering1D(J, T, Q)
        self.S2 = Scattering1D(J, T // DOWNSAMPLE_FAC, Q)

    def _song(self, novfn: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        l = np.lcm(novfn.size, self.T)
        x = scipy.signal.resample_poly(
            novfn, int(l / novfn.size), int(l / self.T))
        y = x - np.mean(x)
        n = np.sqrt(np.sum(y ** 2))
        y = y / (n if n > 0 else 1.0)
        glob = np.asarray(self.S(y)).ravel()
        win = x.size // DOWNSAMPLE_FAC
        segs = x[:win * DOWNSAMPLE_FAC].reshape(DOWNSAMPLE_FAC, win)
        segs = segs - segs.mean(axis=1, keepdims=True)
        norms = np.sqrt(np.sum(segs ** 2, axis=1, keepdims=True))
        segs = segs / np.where(norms == 0, 1.0, norms)
        sc = np.asarray(self.S2(segs))
        sh = np.median(sc.reshape(DOWNSAMPLE_FAC, -1), axis=0)
        n = np.sqrt(np.sum(sh ** 2))
        sh = sh / (n if n > 0 else 1.0)
        return glob.astype(np.float32), sh.astype(np.float32)

    def extract_descriptors(self, fs: FeatureSet) -> dict:
        out = {k: [] for k in self.SIMILARITY_TYPES}
        nlen = fs.length("novfn")
        slen = fs.length("snovfn")
        for i in range(fs.n_songs):
            for name, key, ln in (("novfn", "anfrnn", nlen),
                                  ("snovfn", "anfsuperflux", slen)):
                g, sh = self._song(fs.feature(name)[i, :ln[i], 0])
                out[key].append(g)
                out[f"{key}_shingle"].append(sh)
        return {k: np.stack(v) for k, v in out.items()}

    def full_scores(self, desc: dict) -> dict:
        return {k: np.asarray(_gram_dist(jnp.asarray(desc[k])))
                for k in self.SIMILARITY_TYPES}


@jax.jit
def _gram_dist(X):
    sq = jnp.sum(X * X, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * jnp.matmul(
        X, X.T, precision="highest")
    return jnp.sqrt(jnp.maximum(d2, 0.0))
