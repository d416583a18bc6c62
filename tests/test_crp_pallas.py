"""Parity tests for the fused CSM->sliding->binarize Pallas kernel
(interpret mode on CPU) against the reference-parity XLA ops in crp.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acoss_tpu.ops import crp
from acoss_tpu.ops.crp_pallas import fused_binary_crp_batch


def _make(rng, B, L, d):
    l1 = rng.integers(10, L + 1, B).astype(np.int32)
    l2 = rng.integers(10, L + 1, B).astype(np.int32)
    X = rng.standard_normal((B, L, d)).astype(np.float32)
    Y = rng.standard_normal((B, L, d)).astype(np.float32)
    for b in range(B):
        X[b, l1[b]:] = 0
        Y[b, l2[b]:] = 0
    return X, Y, l1, l2


def _xla_ref(X, Y, l1, l2, kappa, m, metric, mutual):
    csm_fn = crp.get_csm_cosine if metric == "cosine" else crp.get_csm
    out = []
    for b in range(X.shape[0]):
        csm = csm_fn(jnp.asarray(X[b]), jnp.asarray(Y[b]))
        if m > 1:
            csm = crp.sliding_csm_padded(csm, m)
        l1e = max(int(l1[b]) - m + 1, 0)
        l2e = max(int(l2[b]) - m + 1, 0)
        fn = crp.csm_to_binary_mutual if mutual else crp.csm_to_binary
        out.append(np.asarray(fn(csm, kappa, l1e, l2e)))
    return np.stack(out)


@pytest.mark.parametrize("metric,mutual,m", [
    ("sqeuclidean", True, 9),
    ("sqeuclidean", False, 9),
    ("sqeuclidean", True, 1),
    ("cosine", False, 1),
    ("cosine", True, 5),
])
def test_fused_matches_xla(rng, metric, mutual, m):
    B, L, d, kappa = 5, 64, 12, 0.095
    X, Y, l1, l2 = _make(rng, B, L, d)
    S, l1e, l2e = fused_binary_crp_batch(
        X, Y, l1, l2, kappa=kappa, m=m, metric=metric, mutual=mutual,
        interpret=True)
    R = _xla_ref(X, Y, l1, l2, kappa, m, metric, mutual)
    np.testing.assert_array_equal(np.asarray(S), R)
    np.testing.assert_array_equal(np.asarray(l1e),
                                  np.maximum(l1 - m + 1, 0))
    np.testing.assert_array_equal(np.asarray(l2e),
                                  np.maximum(l2 - m + 1, 0))


def test_fused_odd_batch_padding(rng):
    """B not a multiple of the per-step pair count exercises the padding."""
    B, L, d = 3, 32, 6
    X, Y, l1, l2 = _make(rng, B, L, d)
    S, _, _ = fused_binary_crp_batch(X, Y, l1, l2, kappa=0.2, m=3,
                                     interpret=True)
    R = _xla_ref(X, Y, l1, l2, 0.2, 3, "sqeuclidean", True)
    np.testing.assert_array_equal(np.asarray(S), R)


def test_fused_zero_length_pair(rng):
    B, L, d = 2, 32, 6
    X, Y, l1, l2 = _make(rng, B, L, d)
    l1[1] = 0
    X[1] = 0
    S, _, _ = fused_binary_crp_batch(X, Y, l1, l2, kappa=0.1, m=9,
                                     interpret=True)
    assert np.asarray(S)[1].sum() == 0


@pytest.mark.parametrize("mutual", [True, False])
def test_binarize_matrix_matches_xla(rng, mutual):
    """Matrix-input binarizer == the XLA rank-threshold path, including
    NEGATIVE values (the signed monotone bit keys)."""
    from acoss_tpu.ops.crp_pallas import binarize_matrix_batch

    B, L, kappa = 5, 64, 0.12
    D = rng.standard_normal((B, L, L)).astype(np.float32)
    l1 = rng.integers(10, L + 1, B).astype(np.int32)
    l2 = rng.integers(10, L + 1, B).astype(np.int32)
    S = binarize_matrix_batch(D, l1, l2, kappa=kappa, mutual=mutual,
                              interpret=True)
    fn = crp.csm_to_binary_mutual if mutual else crp.csm_to_binary
    R = np.stack([np.asarray(fn(jnp.asarray(D[b]), kappa,
                                int(l1[b]), int(l2[b])))
                  for b in range(B)])
    np.testing.assert_array_equal(np.asarray(S), R)


def test_binarize_matrix_negated_similarity(rng):
    """The EarlySNF use: binarize the NEGATED fused cross block, whose
    zeros are -0.0 — canonicalization must keep them tied with +0.0."""
    from acoss_tpu.ops.crp_pallas import binarize_matrix_batch

    B, L, kappa = 3, 48, 0.2
    fused = rng.random((B, L, L)).astype(np.float32)
    fused[rng.random((B, L, L)) < 0.3] = 0.0      # plant exact zeros
    D = -fused                                    # zeros become -0.0
    # plant a few +0.0 next to the -0.0 (mixed-sign ties in one row)
    D[:, :, ::5] = np.abs(D[:, :, ::5])
    l1 = np.full(B, L, np.int32)
    l2 = np.full(B, L, np.int32)
    S = binarize_matrix_batch(D, l1, l2, kappa=kappa, interpret=True)
    R = np.stack([np.asarray(crp.csm_to_binary_mutual(
        jnp.asarray(D[b]), kappa, L, L)) for b in range(B)])
    np.testing.assert_array_equal(np.asarray(S), R)


def test_binarize_matrix_zero_neighbor_and_padding(rng):
    """round(kappa * l) == 0 pairs get all-zero CRPs; odd batch sizes
    exercise the grid padding."""
    from acoss_tpu.ops.crp_pallas import binarize_matrix_batch

    B, L, kappa = 3, 32, 0.05
    D = np.abs(rng.standard_normal((B, L, L))).astype(np.float32)
    l1 = np.array([L, 4, L], np.int32)    # round(0.05 * 4) == 0
    l2 = np.array([L, L, 6], np.int32)
    S = np.asarray(binarize_matrix_batch(D, l1, l2, kappa=kappa,
                                         interpret=True))
    assert S[1].sum() == 0 and S[2].sum() == 0
    R = np.asarray(crp.csm_to_binary_mutual(
        jnp.asarray(D[0]), kappa, int(l1[0]), int(l2[0])))
    np.testing.assert_array_equal(S[0], R)


def test_serra_tile_scores_fused_matches_xla():
    """The full Serra09 tile through the fused kernel == the XLA path."""
    from acoss_tpu.benchmarking.algorithms import Serra09
    from acoss_tpu.data import make_synthetic_dataset
    from acoss_tpu.ops import alignment

    fs = make_synthetic_dataset(n_cliques=4, clique_size=2, seed=7)
    algo = Serra09(chroma_type="hpcp", downsample_fac=4)
    desc = algo.extract_descriptors(fs)
    row = {k: v[:4] for k, v in desc.items()}
    col = {k: v[4:8] for k, v in desc.items()}

    out_x = jax.jit(algo.tile_scores)(row, col)
    prev = alignment.set_alignment_impl("pallas_interpret")
    try:
        out_p = jax.jit(algo.tile_scores)(row, col)
    finally:
        alignment.set_alignment_impl(prev)
    for k in out_x:
        np.testing.assert_allclose(np.asarray(out_p[k]),
                                   np.asarray(out_x[k]), atol=1e-5)


def test_knn_mask_matches_get_s_selection(rng):
    """The Pallas rank-threshold mask == fusion.get_S's selection,
    bit-for-bit (values AND tie sets), for k-th largest and smallest."""
    from acoss_tpu.ops import fusion
    from acoss_tpu.ops.crp_pallas import knn_mask_matrix_batch

    F, n = 3, 96
    W = rng.random((F, n, n)).astype(np.float32)
    W[rng.random((F, n, n)) < 0.2] = 0.25   # plant ties
    k = np.array([5, 17, 96], np.int32)     # incl. k == n edge
    V = np.asarray(knn_mask_matrix_batch(W, k, largest=True,
                                         interpret=True))
    for f in range(F):
        thresh = -np.asarray(fusion._kth_smallest(
            jnp.asarray(-W[f]), int(k[f]), int(k[f])))
        R = np.where(W[f] >= thresh, W[f], 0.0)
        np.testing.assert_array_equal(V[f], R)
    # full get_S equivalence through the stack helper
    S_pl = np.asarray(fusion._get_S_stack(
        jnp.asarray(W), jnp.asarray(17), 17, "pallas_interpret"))
    S_x = np.asarray(fusion._get_S_stack(
        jnp.asarray(W), jnp.asarray(17), 17, "xla"))
    np.testing.assert_array_equal(S_pl, S_x)


def test_knn_mask_under_vmap(rng):
    """vmap flattens into the grid axis (custom_vmap rule) — the
    EarlySNF tile calls the kernel inside a vmapped per-pair function,
    where pallas_call's default batching rule fails the TPU lowering."""
    from acoss_tpu.ops.crp_pallas import knn_mask_matrix_batch

    G, F, n = 4, 2, 64
    W = rng.random((G, F, n, n)).astype(np.float32)
    k = rng.integers(1, n, (G, F)).astype(np.int32)
    fn = lambda w, kk: knn_mask_matrix_batch(w, kk, interpret=True)
    V = np.asarray(jax.vmap(fn)(jnp.asarray(W), jnp.asarray(k)))
    flat = np.asarray(fn(jnp.asarray(W.reshape(-1, n, n)),
                         jnp.asarray(k.reshape(-1))))
    np.testing.assert_array_equal(V, flat.reshape(V.shape))
    # unbatched-k leg of the rule
    V2 = np.asarray(jax.vmap(lambda w: fn(w, jnp.asarray(k[0])))(
        jnp.asarray(W)))
    for g in range(G):
        np.testing.assert_array_equal(
            V2[g], np.asarray(fn(jnp.asarray(W[g]), jnp.asarray(k[0]))))


def test_wcsmssm_fused_matches_xla(rng):
    """The throughput-mode fused WCSMSSM build == fusion.get_WCSMSSM up
    to fp32 summation order in the neighborhood means."""
    from acoss_tpu.ops import fusion
    from acoss_tpu.ops.crp_pallas import wcsmssm_batch

    B, L = 3, 64
    SSMA = rng.random((B, L, L)).astype(np.float32)
    SSMB = rng.random((B, L, L)).astype(np.float32)
    CSM = rng.random((B, L, L)).astype(np.float32)
    l1 = np.array([L, 40, 12], np.int32)
    l2 = np.array([L, 56, 15], np.int32)
    K = np.round(0.095 * (l1 + l2)).astype(np.int32)   # incl. tiny K
    W = np.asarray(wcsmssm_batch(SSMA, SSMB, CSM, l1, l2, K,
                                 interpret=True))
    for b in range(B):
        R = np.asarray(fusion.get_WCSMSSM(
            jnp.asarray(SSMA[b]), jnp.asarray(SSMB[b]),
            jnp.asarray(CSM[b]), int(K[b]),
            m_len=int(l1[b]), n_len=int(l2[b]),
            k_static_max=int(K[b]) + 1))
        np.testing.assert_allclose(W[b], R, rtol=2e-5, atol=2e-6)


def test_wcsmssm_fused_under_vmap(rng):
    """get_WCSMSSM_fast inside a vmap (the EarlySNF call shape) equals
    the flat batched call (custom_vmap flattening)."""
    from acoss_tpu.ops import fusion
    from acoss_tpu.ops.crp_pallas import wcsmssm_batch

    G, L = 4, 48
    SSMA = rng.random((G, L, L)).astype(np.float32)
    SSMB = rng.random((G, L, L)).astype(np.float32)
    CSM = rng.random((G, L, L)).astype(np.float32)
    l1 = rng.integers(L // 2, L + 1, G).astype(np.int32)
    l2 = rng.integers(L // 2, L + 1, G).astype(np.int32)
    K = np.round(0.2 * (l1 + l2)).astype(np.int32)
    V = np.asarray(jax.vmap(
        lambda sa, sb, c, a, b, k: fusion.get_WCSMSSM_fast(
            sa, sb, c, k, m_len=a, n_len=b, interpret=True))(
        *(jnp.asarray(x) for x in (SSMA, SSMB, CSM, l1, l2, K))))
    flat = np.asarray(wcsmssm_batch(SSMA, SSMB, CSM, l1, l2, K,
                                    interpret=True))
    np.testing.assert_array_equal(V, flat)


def test_early_snf_throughput_tile_runs(rng):
    """EarlySNF(snf_precision='default') through the fused Pallas
    WCSMSSM (interpret) produces the same retrieval ORDER as the XLA
    throughput path on separable data (scores are value-equal up to
    fp32 summation order, so exact equality is not asserted)."""
    from acoss_tpu.benchmarking.algorithms import EarlySNF
    from acoss_tpu.data import make_synthetic_dataset
    from acoss_tpu.ops import alignment

    fs = make_synthetic_dataset(n_cliques=4, clique_size=2, seed=3)
    algo = EarlySNF(chroma_type="hpcp", downsample_fac=4,
                    snf_precision="default")
    desc = algo.extract_descriptors(fs)
    row = {k: v[:4] for k, v in desc.items()}
    col = {k: v[4:8] for k, v in desc.items()}
    out_x = jax.jit(algo.tile_scores)(row, col)
    prev = alignment.set_alignment_impl("pallas_interpret")
    try:
        out_p = jax.jit(algo.tile_scores)(row, col)
    finally:
        alignment.set_alignment_impl(prev)
    for k in out_x:
        a, b = np.asarray(out_x[k]), np.asarray(out_p[k])
        np.testing.assert_allclose(a, b, rtol=0.02, atol=0.02)
        # retrieval order (the benchmark statistic) must agree
        np.testing.assert_array_equal(np.argsort(-a, axis=1),
                                      np.argsort(-b, axis=1))


def test_early_snf_tile_scores_pallas_matches_xla():
    """The full EarlySNF tile (incl. the SNF channel's negated cross
    block) through the matrix-input binarizer == the XLA path."""
    from acoss_tpu.benchmarking.algorithms import EarlySNF
    from acoss_tpu.data import make_synthetic_dataset
    from acoss_tpu.ops import alignment

    fs = make_synthetic_dataset(n_cliques=4, clique_size=2, seed=11)
    algo = EarlySNF(chroma_type="hpcp", downsample_fac=4)
    desc = algo.extract_descriptors(fs)
    row = {k: v[:4] for k, v in desc.items()}
    col = {k: v[4:8] for k, v in desc.items()}

    out_x = jax.jit(algo.tile_scores)(row, col)
    prev = alignment.set_alignment_impl("pallas_interpret")
    try:
        out_p = jax.jit(algo.tile_scores)(row, col)
    finally:
        alignment.set_alignment_impl(prev)
    assert set(out_x) == set(out_p)
    assert any(k.startswith("snf_") for k in out_x)
    for k in out_x:
        np.testing.assert_allclose(np.asarray(out_p[k]),
                                   np.asarray(out_x[k]), atol=1e-5)


def test_knn_mask_row_slab_sizing_and_padding(rng):
    """`_row_block` must keep the slab's estimated kernel-stack VMEM
    under budget for ANY n (the r4e hardware queue OOMed scoped vmem
    at n=896/1024 with the old 16 B/elem estimate), padding rows to a
    power-of-two slab when n's divisors are coarse — and the padded
    path must stay bit-identical to the selection semantics."""
    from acoss_tpu.ops import fusion
    from acoss_tpu.ops.crp_pallas import (_STACK_BYTES_PER_ELEM,
                                          _row_block,
                                          knn_mask_matrix_batch)

    for n in (96, 448, 512, 896, 1024, 897, 1000, 13, 3 * 512):
        rb, n_pad = _row_block(n)
        assert n_pad % rb == 0 and n_pad >= n and n_pad - n < rb
        # the measured-constant budget: slab stack under the 16M
        # scoped limit with headroom (allow the rb==8 floor through)
        assert rb == 8 or rb * n * _STACK_BYTES_PER_ELEM <= 12 << 20
    # exact failing shapes from the r4e queue must now size sanely
    for n in (896, 1024):
        rb, n_pad = _row_block(n)
        assert rb * n * _STACK_BYTES_PER_ELEM <= 12 << 20

    # correctness through a genuinely padded width: n=897 -> rb=64,
    # n_pad=960 under the default budget (n_pad != n exercises the
    # pad + slice path)
    n = 897
    rb, n_pad = _row_block(n)
    assert n_pad != n
    W = rng.random((2, n, n)).astype(np.float32)
    W[rng.random((2, n, n)) < 0.2] = 0.25
    k = np.array([7, n], np.int32)
    V = np.asarray(knn_mask_matrix_batch(W, k, largest=True,
                                         interpret=True))
    assert V.shape == W.shape
    for f in range(2):
        thresh = -np.asarray(fusion._kth_smallest(
            jnp.asarray(-W[f]), int(k[f]), int(k[f])))
        np.testing.assert_array_equal(
            V[f], np.where(W[f] >= thresh, W[f], 0.0))
