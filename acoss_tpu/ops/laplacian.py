"""Graph-Laplacian eigenvectors + sequential spectral clustering.

Parity target: `/root/reference/benchmarking/Laplacian.py:11-127`.
Eigendecompositions run in JAX (`jnp.linalg.eigh`); the random-walk variant
solves the generalized problem L u = lambda D u through the symmetric
normalization D^{-1/2} L D^{-1/2} w = lambda w, u = D^{-1/2} w — which
reproduces scipy.linalg.eigh(L, D)'s u^T D u = 1 normalization (up to
per-vector sign, irrelevant downstream). Clustering is host-side sklearn
KMeans exactly like the reference (`Laplacian.py:113`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.ndimage

EVEC_SMOOTH = 9


@jax.jit
def unweighted_laplacian_eigs(W: jax.Array) -> jax.Array:
    """Eigenvectors of L = D - W (`Laplacian.py:11-30`)."""
    D = jnp.diag(jnp.sum(W, axis=1))
    _, v = jnp.linalg.eigh(D - W)
    return v


@jax.jit
def symmetric_laplacian_eigs(W: jax.Array) -> jax.Array:
    """Eigenvectors of D^{-1/2} (D - W) D^{-1/2} (`Laplacian.py:32-55`)."""
    d = jnp.sum(W, axis=1)
    L = jnp.diag(d) - W
    sq = jnp.sqrt(jnp.maximum(d, 0.0))
    inv = jnp.where(sq == 0, 1.0, 1.0 / sq)
    LSym = inv[:, None] * L * inv[None, :]
    _, v = jnp.linalg.eigh(LSym)
    return v


@jax.jit
def random_walk_laplacian_eigs(W: jax.Array) -> jax.Array:
    """Generalized eigenvectors of L u = lambda D u (`Laplacian.py:57-77`),
    with u^T D u = 1 normalization like scipy.linalg.eigh(L, D)."""
    d = jnp.sum(W, axis=1)
    L = jnp.diag(d) - W
    sq = jnp.sqrt(jnp.maximum(d, 0.0))
    inv = jnp.where(sq == 0, 1.0, 1.0 / sq)
    LSym = inv[:, None] * L * inv[None, :]
    _, w = jnp.linalg.eigh(LSym)
    return inv[:, None] * w


def spectral_cluster_sequential(v: np.ndarray, dim: int, times: np.ndarray,
                                rownorm: bool = False) -> dict:
    """Spectral clustering of Laplacian eigenvectors + merge of adjacent
    same-label points into segment intervals (`Laplacian.py:80-127`)."""
    from sklearn.cluster import KMeans

    v = np.asarray(v)
    x = np.array(v[:, :dim])
    if EVEC_SMOOTH > 0:
        x = scipy.ndimage.median_filter(x, size=(EVEC_SMOOTH, 1))
    if rownorm:
        norms = np.sqrt(np.sum(x ** 2, 1))
        norms[norms == 0] = 1
        x /= norms[:, None]
    labels = KMeans(n_clusters=dim, n_init=50, max_iter=500,
                    random_state=0).fit(x).labels_
    splits = np.where(np.abs(labels[1:] - labels[:-1]) > 0)[0] + 1
    splits = np.concatenate(([0], splits, [labels.size]))
    splits[splits >= times.size] = times.size
    if np.sum(splits == times.size) > 1:
        splits = np.unique(splits)
    groups = np.split(labels, splits)[1:-1]
    intervals_hier = np.zeros((len(groups), 2))
    timesext = np.array(times.tolist() + [times[-1]])
    intervals_hier[:, 0] = timesext[splits[:-1]]
    intervals_hier[:, 1] = timesext[splits[1:]]
    labels_hier = ["%i" % g[0] for g in groups]
    return {"labels": labels, "intervals_hier": intervals_hier,
            "labels_hier": labels_hier}


def meet_matrix(intervals_hier: list, labels_hier: list,
                frame_size: float) -> np.ndarray:
    """Hierarchy meet matrix (replaces `mir_eval.hierarchy._meet`,
    `StrucLaplacian.py:133`): meet[i, j] = deepest level (1-based) at which
    sampled frames i and j carry the same segment label; 0 if none.
    """
    end = max(float(iv[-1, 1]) for iv in intervals_hier)
    n = int(round(end / frame_size))
    n = max(n, 1)
    t = (np.arange(n) + 0.5) * frame_size
    meet = np.zeros((n, n), dtype=np.float64)
    for level, (ivs, labs) in enumerate(zip(intervals_hier, labels_hier), 1):
        frame_labels = np.full(n, -1, dtype=np.int64)
        uniq = {lab: k for k, lab in enumerate(dict.fromkeys(labs))}
        for (a, b), lab in zip(ivs, labs):
            sel = (t >= a) & (t < b)
            frame_labels[sel] = uniq[lab]
        same = (frame_labels[:, None] == frame_labels[None, :]) & \
            (frame_labels[:, None] >= 0)
        meet[same] = level
    return meet
