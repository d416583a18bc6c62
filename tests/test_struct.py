"""End-to-end tests of the structural family on planted cliques (scaled
down: small pads, small tempogram windows, uniform downsampling)."""

import numpy as np
import pytest

from acoss_tpu.benchmarking.harness import benchmark
from acoss_tpu.data import make_synthetic_dataset


@pytest.fixture(scope="module")
def dataset():
    return make_synthetic_dataset(n_cliques=6, clique_size=2,
                                  n_distractors=2, seed=5)


def test_struc_ftm2d_and_shingles(dataset):
    from acoss_tpu.benchmarking.algorithms.struc_ftm2d import (StrucFTM2D,
                                                               StrucShingles)
    algo = StrucFTM2D(wins_per_block=5, K=5, niters=5, PAD_LEN=128,
                      tempogram_win=96)
    stats = benchmark(algo, dataset)
    assert stats["main"].map > 0.3
    algo = StrucShingles(wins_per_block=5, K=5, niters=5, PAD_LEN=128,
                         tempogram_win=96)
    stats = benchmark(algo, dataset)
    assert stats["main"].map > 0.3


def test_struc_scattering(dataset):
    from acoss_tpu.benchmarking.algorithms.struc_scattering import \
        StrucScattering
    algo = StrucScattering(wins_per_block=5, K=5, niters=5, final_size=64,
                           J=3, L=4, tempogram_win=96)
    stats = benchmark(algo, dataset)
    assert stats["main"].map > 0.3


def test_struc_laplacian(dataset):
    from acoss_tpu.benchmarking.algorithms.struc_laplacian import \
        StrucLaplacian
    algo = StrucLaplacian(wins_per_block=5, K=5, niters=5, neigs=6,
                          m=6, tempogram_win=96)
    stats = benchmark(algo, dataset)
    # structure-only channel: weak but above chance (~1/13)
    assert stats["snovfn_qmax"].map > 0.12


def test_early_fusion(dataset):
    from acoss_tpu.benchmarking.algorithms.early_fusion import EarlyFusion
    algo = EarlyFusion(blocksize=8, mfccs_per_block=16,
                       chromas_per_block=12, late_K=8, late_niters=5)
    stats = benchmark(algo, dataset)
    assert stats["chromas"].map > 0.3
    assert stats["early"].map > 0.2
    assert "late" in stats and "early+late" in stats
    assert np.isfinite(stats["late"].map)
