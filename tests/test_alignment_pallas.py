"""Pallas wavefront kernel parity vs the numpy DP oracle (interpret mode on
CPU; the real-TPU path is exercised by bench.py's sanity check)."""

import numpy as np
import pytest

from acoss_tpu.ops import alignment_pallas
from tests import oracles


def random_crp(rng, m, n, density=0.15):
    return (rng.random((m, n)) < density).astype(np.uint8)


@pytest.mark.parametrize("shape", [(32, 32), (48, 40), (40, 48)])
def test_qmax_pallas_vs_oracle(rng, shape):
    S = random_crp(rng, *shape)
    got = float(alignment_pallas.qmax_batch_pallas(
        S[None], np.array([shape[0]]), np.array([shape[1]]),
        block_b=8, block_t=16, interpret=True)[0])
    assert got == pytest.approx(oracles.qmax_np(S), abs=1e-4)


@pytest.mark.parametrize("shape", [(32, 32), (48, 40), (40, 48)])
def test_dmax_pallas_vs_oracle(rng, shape):
    S = random_crp(rng, *shape)
    got = float(alignment_pallas.dmax_batch_pallas(
        S[None], np.array([shape[0]]), np.array([shape[1]]),
        block_b=8, block_t=16, interpret=True)[0])
    assert got == pytest.approx(oracles.dmax_np(S), abs=1e-4)


def test_pallas_ragged_batch(rng):
    """Multiple chunked batch blocks + ragged lengths + diag-chunk seams."""
    M = N = 40
    sizes = [(40, 40), (31, 36), (17, 23), (2, 10), (40, 33),
             (36, 40), (25, 25), (40, 40), (9, 40), (40, 9)]
    S = np.zeros((len(sizes), M, N), dtype=np.uint8)
    for b, (m, n) in enumerate(sizes):
        S[b, :m, :n] = random_crp(rng, m, n)
    ml = np.array([s[0] for s in sizes])
    nl = np.array([s[1] for s in sizes])
    got_q = np.asarray(alignment_pallas.qmax_batch_pallas(
        S, ml, nl, block_b=4, block_t=8, interpret=True))
    got_d = np.asarray(alignment_pallas.dmax_batch_pallas(
        S, ml, nl, block_b=4, block_t=8, interpret=True))
    want_q = [oracles.qmax_np(S[b, :m, :n]) for b, (m, n) in enumerate(sizes)]
    want_d = [oracles.dmax_np(S[b, :m, :n]) for b, (m, n) in enumerate(sizes)]
    np.testing.assert_allclose(got_q, want_q, atol=1e-4)
    np.testing.assert_allclose(got_d, want_d, atol=1e-4)


@pytest.mark.parametrize("shape", [(32, 32), (48, 40), (40, 48)])
def test_sw_pallas_vs_oracle(rng, shape):
    S = random_crp(rng, *shape)
    got = float(alignment_pallas.swconstrained_batch_pallas(
        S[None], np.array([shape[0]]), np.array([shape[1]]),
        block_b=8, block_t=16, interpret=True)[0])
    assert got == pytest.approx(oracles.swconstrained_np(S), abs=1e-4)


def test_sw_pallas_ragged(rng):
    M = N = 40
    sizes = [(40, 40), (31, 36), (17, 23), (2, 10), (40, 9)]
    S = np.zeros((len(sizes), M, N), dtype=np.uint8)
    for b, (m, n) in enumerate(sizes):
        S[b, :m, :n] = random_crp(rng, m, n)
    ml = np.array([s[0] for s in sizes])
    nl = np.array([s[1] for s in sizes])
    got = np.asarray(alignment_pallas.swconstrained_batch_pallas(
        S, ml, nl, block_b=4, block_t=8, interpret=True))
    want = [oracles.swconstrained_np(S[b, :m, :n])
            for b, (m, n) in enumerate(sizes)]
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("go,ge", [(0.4, 0.8), (0.8, 0.4), (0.0, 0.7)])
def test_qmax_uneq_pallas_vs_oracle(rng, go, ge):
    """Unequal-gap qmax kernel vs the numpy oracle, incl. ragged padding
    (phantom cells must only hold/decay under state-dependent gamma)."""
    M = N = 40
    sizes = [(40, 40), (31, 36), (17, 23), (2, 10), (40, 33), (25, 25)]
    S = np.zeros((len(sizes), M, N), dtype=np.uint8)
    for b, (m, n) in enumerate(sizes):
        S[b, :m, :n] = random_crp(rng, m, n)
    ml = np.array([s[0] for s in sizes])
    nl = np.array([s[1] for s in sizes])
    got = np.asarray(alignment_pallas.qmax_batch_pallas_uneq(
        S, ml, nl, gap_onset=go, gap_extension=ge,
        block_b=4, block_t=8, interpret=True))
    want = [oracles.qmax_np(S[b, :m, :n], go=go, ge=ge)
            for b, (m, n) in enumerate(sizes)]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_qmax_uneq_dispatch(rng):
    """qmax_batch_best routes unequal non-negative gaps to the Pallas
    kernel and negative gaps to the masked scan."""
    from acoss_tpu.ops import alignment
    S = np.zeros((2, 32, 32), np.uint8)
    S[0, :30, :28] = random_crp(rng, 30, 28)
    S[1, :32, :32] = random_crp(rng, 32, 32)
    ml, nl = np.array([30, 32]), np.array([28, 32])
    prev = alignment.set_alignment_impl("pallas_interpret")
    try:
        got = np.asarray(alignment.qmax_batch_best(
            S, ml, nl, gap_onset=0.3, gap_extension=0.9))
    finally:
        alignment.set_alignment_impl(prev)
    want = [oracles.qmax_np(S[0, :30, :28], go=0.3, ge=0.9),
            oracles.qmax_np(S[1], go=0.3, ge=0.9)]
    np.testing.assert_allclose(got, want, atol=1e-4)
