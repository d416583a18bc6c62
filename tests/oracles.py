"""Tiny numpy oracles for the L2 similarity math, written independently
from first principles (same published semantics as the reference's
CRPUtils) for golden-file testing of the JAX ops."""

import numpy as np


def ssm_np(X):
    n = X.shape[0]
    D = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            if i != j:
                D[i, j] = np.linalg.norm(X[i] - X[j])
    return D


def csm_np(X, Y):
    return np.linalg.norm(X[:, None, :] - Y[None, :, :], axis=-1)


def csm_cosine_np(X, Y):
    def norm1(A):
        n = np.linalg.norm(A, axis=1)
        n[n == 0] = 1
        return A / n[:, None]
    return 1.0 - norm1(X) @ norm1(Y).T


def oti_np(C1, C2):
    scores = [np.sum(np.roll(C1, s) * C2) for s in range(len(C1))]
    return int(np.argmax(scores))


def sliding_window_np(X, win):
    M = X.shape[0] - win + 1
    return np.concatenate([X[i:i + M] for i in range(win)], axis=1)


def sliding_csm_np(D, win):
    M, N = D.shape
    Mo, No = M - win + 1, N - win + 1
    S = np.zeros((Mo, No))
    for i in range(Mo):
        for j in range(No):
            S[i, j] = np.sqrt(sum(D[i + k, j + k] ** 2 for k in range(win)))
    return S


def csm_to_binary_np(D, kappa):
    """Row-kNN binarization: exact k-th-smallest threshold per row."""
    M, N = D.shape
    if kappa == 0:
        return np.ones_like(D, dtype=np.uint8)
    k = int(np.round(kappa * N)) if kappa < 1 else int(kappa)
    B = np.zeros((M, N), dtype=np.uint8)
    for i in range(M):
        thresh = np.sort(D[i])[max(k - 1, 0)]
        B[i] = D[i] <= thresh
    return B


def csm_to_binary_mutual_np(D, kappa):
    return csm_to_binary_np(D, kappa) * csm_to_binary_np(D.T, kappa).T


def qmax_np(S, go=0.5, ge=0.5):
    """Direct per-cell DP for qmax (Serra 2009) — the slow-but-obvious oracle."""
    M, N = S.shape
    if M < 3 or N < 3:
        return 0.0
    D = np.zeros((M, N), dtype=np.float64)
    g = lambda s: go if s else ge  # noqa: E731
    for i in range(2, M):
        for j in range(2, N):
            if S[i, j]:
                D[i, j] = max(D[i-1, j-1], D[i-2, j-1], D[i-1, j-2]) + 1
            else:
                D[i, j] = max(
                    D[i-1, j-1] - g(S[i-1, j-1]),
                    D[i-2, j-1] - g(S[i-2, j-1]),
                    D[i-1, j-2] - g(S[i-1, j-2]),
                    0.0,
                )
    return float(D.max(initial=0.0))


def dmax_np(S, go=0.5, ge=0.5):
    M, N = S.shape
    if M < 4 or N < 4:
        return 0.0
    D = np.zeros((M, N), dtype=np.float64)
    g = lambda s: go if s else ge  # noqa: E731
    Sf = S.astype(np.float64)
    for i in range(3, M):
        for j in range(3, N):
            p1 = D[i-1, j-1]
            p2 = D[i-2, j-1] + Sf[i-1, j]
            p3 = D[i-1, j-2] + Sf[i, j-1]
            p4 = D[i-3, j-1] + Sf[i-2, j] + Sf[i-1, j]
            p5 = D[i-1, j-3] + Sf[i, j-2] + Sf[i, j-1]
            if S[i, j]:
                D[i, j] = max(p1, p2, p3, p4, p5) + 1
            else:
                D[i, j] = max(
                    p1 - g(S[i-1, j-1]), p2 - g(S[i-2, j-1]),
                    p3 - g(S[i-1, j-2]), p4 - g(S[i-3, j-1]),
                    p5 - g(S[i-1, j-3]), 0.0,
                )
    return float(D.max(initial=0.0))


def swconstrained_np(S, gap_opening=-0.5, gap_extension=-0.7,
                     match=1.0, mismatch=-1.0):
    M, N = S.shape
    if M < 3 or N < 3:
        return 0.0
    D = np.zeros((M, N), dtype=np.float64)

    def delta(prev, cur):
        if cur:
            return 0.0
        return gap_opening if prev else gap_extension

    for a in range(2, M):
        for b in range(2, N):
            ms = match if S[a, b] else mismatch
            d1 = D[a-1, b-1] + ms + delta(S[a-1, b-1], S[a, b])
            d2 = D[a-2, b-1] + ms + delta(S[a-2, b-1], S[a, b])
            d3 = D[a-1, b-2] + ms + delta(S[a-1, b-2], S[a, b])
            D[a, b] = max(d1, d2, d3, 0.0)
    return float(D.max(initial=0.0))


def eval_statistics_np(D, labels, topsidx=(1, 10, 100, 1000)):
    """Loop transcription of the reference's getEvalStatistics conventions
    (`CoverAlgorithm.py:330-418`) as the oracle for the vectorized version."""
    D = np.array(D, dtype=np.float32)
    N = D.shape[0]
    labels = np.asarray(labels)
    # build cliques in first-seen order
    seen = {}
    for i, lab in enumerate(labels):
        seen.setdefault(lab, []).append(i)
    cliques = list(seen.values())
    Ks = np.array([len(c) for c in cliques])
    order = np.argsort(-Ks, kind="stable")
    Ks = Ks[order]
    cliques = [cliques[i] for i in order]
    idx = np.array([i for c in cliques for i in c])
    D = D[np.ix_(idx, idx)]
    np.fill_diagonal(D, -np.inf)
    srt = np.argsort(-D, axis=1, kind="stable")
    ranks, aps = [], []
    startidx, kidx = 0, 0
    for i in range(N):
        while i >= startidx + Ks[kidx]:
            startidx += Ks[kidx]
            kidx += 1
        if Ks[kidx] < 2:
            continue
        iranks = [k + 1 for k in range(N)
                  if 0 <= srt[i, k] - startidx < Ks[kidx]]
        iranks = iranks[:-1]
        ranks.append(iranks[0])
        aps.append(np.mean([j / r for j, r in
                            zip(range(1, Ks[kidx]), iranks)]))
    ranks = np.array(ranks, dtype=np.float64)
    return dict(
        mr=float(np.mean(ranks)),
        mrr=float(np.sum(1.0 / ranks) / N),
        mdr=float(np.median(ranks)),
        map=float(np.mean(aps)),
        tops={k: int(np.sum(ranks <= k)) for k in topsidx},
    )
