"""Tests for the coverstats analytics layer."""

import numpy as np
import pytest

from acoss_tpu.analytics import (get_cover_pairs, get_onset_means,
                                 get_shape_dna, key_stats, key_table,
                                 lower_star_persistence, persistence_image,
                                 shape_dna_study, tag_f_measure, tag_stats,
                                 tempo_stats, tempo_table)
from acoss_tpu.data import make_synthetic_dataset


@pytest.fixture(scope="module")
def dataset():
    return make_synthetic_dataset(n_cliques=6, clique_size=2, seed=9)


def test_get_cover_pairs(dataset):
    pairs = get_cover_pairs(dataset, lambda fs, i: i)
    assert len(pairs) == 6
    assert all(len(v) == 2 for v in pairs.values())


def test_key_pipeline(dataset):
    df = key_table(dataset)
    assert len(df) == 6
    stats = key_stats(df, min_confidence=-1.0)   # keep all synthetic pairs
    assert stats["n_pairs_confident"] == 6
    assert 0 <= stats["frac_same_scale"] <= 1
    assert (stats["transposition_distances"] <= 6).all()


def test_tempo_pipeline(dataset):
    df = tempo_table(dataset)
    stats = tempo_stats(df)
    assert stats["n_pairs"] == 6
    # synthetic tempo factors are within [0.8, 1.25] -> ratios <= ~1.6
    assert stats["q50"] >= 1.0
    assert stats["q75"] < 2.0


def test_tag_stats():
    tags = {
        "a": [[("rock", 0.9), ("pop", 0.5)], [("rock", 0.8)]],
        "b": [[("jazz", 0.9)], [("jazz", 0.7), ("blues", 0.3)]],
        "c": [[("rock", 0.9)], [("jazz", 0.9)]],
    }
    assert tag_f_measure(tags["a"][0], tags["a"][1]) == pytest.approx(2 / 3)
    assert tag_f_measure([], [("x", 1.0)]) == np.inf
    res = tag_stats(tags)
    assert res["true_pairs"].mean() > res["false_pairs"].mean()


def test_lower_star_persistence_known():
    # W-shaped function: two local minima, one saddle
    x = np.array([2.0, 0.0, 1.5, 0.5, 3.0])
    dgm = lower_star_persistence(x)
    dgm = dgm[np.argsort(dgm[:, 0])]
    # global min 0.0 is essential (dies at max 3.0); min 0.5 dies at 1.5
    np.testing.assert_allclose(dgm, [[0.0, 3.0], [0.5, 1.5]])


def test_persistence_image_mass():
    dgm = np.array([[0.3, 0.8], [0.4, 0.6]])
    # grid wide enough that no gaussian mass is cut off
    out = persistence_image(dgm, [-1, 2, -1, 2], res=0.1)
    # total mass = sum of lifetime weights (weightfn = life)
    assert out["PI"].sum() == pytest.approx(0.5 + 0.2, abs=0.02)
    assert (out["PI"] >= -1e-9).all()


def test_onset_means(dataset):
    onsets = dataset.feature("onsets")[0, :dataset.length("onsets")[0], 0]
    curve = get_onset_means(onsets)
    assert curve.ndim == 1 and curve.size > 5
    assert abs(np.median(curve) - 1.0) < 1e-9


def test_shape_dna(dataset):
    h = dataset.feature("hpcp")[0, :dataset.length("hpcp")[0]]
    m = dataset.feature("mfcc_htk")[0, :dataset.length("mfcc_htk")[0]]
    res = get_shape_dna(h, m, downsample_fac=4, m=5, dim=64, neigs=10)
    assert res["w"].shape == (11,)
    assert res["w"][0] == pytest.approx(0.0, abs=2e-2)   # lambda_0 = 0
    assert np.all(np.diff(res["w"]) >= -1e-6)            # sorted

    small = dataset.subset(np.arange(8))
    study = shape_dna_study(small, downsample_fac=4, m=5, dim=64, neigs=10)
    assert study["ws"].shape == (8, 11)
    assert study["ks"] is not None
