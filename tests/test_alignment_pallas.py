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
