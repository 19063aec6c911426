"""Kamitani baseline tests: SLiR recovers sparse linear models, helpers match
bdpy semantics, and the full vmapped feature-prediction pipeline beats chance
on synthetic decodable data."""

import numpy as np
import pytest

from meg_decoding_tpu.kamitani.helpers import add_bias, corrcoef, corrmat, select_top
from meg_decoding_tpu.kamitani.pipeline import (
    feature_prediction,
    get_averaged_feature,
    pairwise_identification_rate,
)
from meg_decoding_tpu.kamitani.slir import SparseLinearRegression


class TestHelpers:
    def test_add_bias(self):
        x = np.ones((3, 4))
        assert add_bias(x, axis=0).shape == (4, 4)
        assert add_bias(x, axis=1).shape == (3, 5)
        np.testing.assert_array_equal(add_bias(x, axis=1)[:, -1], 1.0)

    def test_select_top(self):
        data = np.arange(20).reshape(4, 5)
        value = np.array([0.1, np.nan, 0.9, 0.5, 0.3])
        sel, idx = select_top(data, value, 2, axis=1)
        np.testing.assert_array_equal(idx, [2, 3])
        np.testing.assert_array_equal(sel, data[:, [2, 3]])

    def test_corrcoef_matches_numpy(self):
        rng = np.random.RandomState(0)
        x = rng.randn(5, 30)
        y = rng.randn(5, 30)
        got = corrcoef(x, y)
        expect = [np.corrcoef(x[i], y[i])[0, 1] for i in range(5)]
        np.testing.assert_allclose(got, expect, rtol=1e-6)

    def test_corrmat_matches_numpy(self):
        rng = np.random.RandomState(1)
        x = rng.randn(4, 50)
        y = rng.randn(6, 50)
        got = corrmat(x, y)
        expect = np.corrcoef(np.vstack([x, y]))[:4, 4:]
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


class TestSLiR:
    def test_recovers_sparse_weights(self):
        rng = np.random.RandomState(2)
        N, D = 80, 30
        X = rng.randn(N, D)
        w_true = np.zeros(D)
        w_true[[3, 11, 17]] = [2.0, -1.5, 1.0]
        y = X @ w_true + 0.05 * rng.randn(N)
        model = SparseLinearRegression(n_iter=150).fit(X, y)
        pred = model.predict(X)
        # good fit
        assert np.corrcoef(pred, y)[0, 1] > 0.99
        # sparse: the true support carries most of the weight mass
        mass = np.abs(model.coef_)
        assert mass[[3, 11, 17]].sum() / mass.sum() > 0.9

    def test_underdetermined_branch(self):
        rng = np.random.RandomState(3)
        N, D = 20, 60  # N < D → dual/woodbury branch
        X = rng.randn(N, D)
        w_true = np.zeros(D)
        w_true[[5, 40]] = [1.0, -2.0]
        y = X @ w_true + 0.01 * rng.randn(N)
        model = SparseLinearRegression(n_iter=150).fit(X, y)
        assert np.corrcoef(model.predict(X), y)[0, 1] > 0.98
        # exact support recovery
        assert set(model.valid_index_list) == {5, 40}

    def test_multi_output(self):
        rng = np.random.RandomState(4)
        X = rng.randn(60, 20)
        W = rng.randn(3, 20) * (rng.rand(3, 20) > 0.8)
        Y = X @ W.T + 0.05 * rng.randn(60, 3)
        model = SparseLinearRegression(n_iter=100).fit(X, Y)
        pred = model.predict(X)
        assert pred.shape == (60, 3)
        for j in range(3):
            assert np.corrcoef(pred[:, j], Y[:, j])[0, 1] > 0.98


class TestPipeline:
    def test_feature_prediction_beats_chance(self):
        rng = np.random.RandomState(5)
        N, V, U = 60, 40, 8
        W = rng.randn(V, U) * (rng.rand(V, U) > 0.7)
        Xtr = rng.randn(N, V)
        Xte = rng.randn(20, V)
        Ytr = Xtr @ W + 0.1 * rng.randn(N, U)
        Yte = Xte @ W + 0.1 * rng.randn(20, U)
        pred, true = feature_prediction(Xtr, Ytr, Xte, Yte, n_voxel=20, n_iter=60)
        assert pred.shape == (20, U)
        corr = np.mean([np.corrcoef(pred[:, u], true[:, u])[0, 1]
                        for u in range(U)])
        assert corr > 0.8

    def test_pairwise_identification_perfect(self):
        rng = np.random.RandomState(6)
        feats = rng.randn(10, 16)
        rates = pairwise_identification_rate(feats, feats)
        np.testing.assert_allclose(rates, 1.0)

    def test_get_averaged_feature(self):
        pred = np.arange(12).reshape(6, 2).astype(float)
        labels = np.array([1, 1, 2, 2, 3, 3])
        pa, ta, ls = get_averaged_feature(pred, pred, labels)
        np.testing.assert_array_equal(ls, [1, 2, 3])
        np.testing.assert_allclose(pa[0], pred[:2].mean(0))


class TestSweepExperiments:
    """Tiny-synthetic drives of the three reference sweep mains ported in
    round 5 (reference examples/kamitani_regression.py:284-400 —
    main_meg_repetiton_N, main_meg_repetiton_onsets_per_ch,
    main_meg_run_manual_ch)."""

    @pytest.fixture()
    def god_cfg(self, tmp_path):
        import os
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from tests.fixtures import make_god_fixture

        cfg = make_god_fixture(str(tmp_path / "god"), n_train=16, n_test=8)
        cfg.save_root = str(tmp_path / "out")
        return cfg

    def test_channel_ratio_sweep(self, god_cfg, tmp_path):
        from examples.kamitani_regression import run_channel_ratio_sweep

        res = run_channel_ratio_sweep(god_cfg, ch_ratios=(0.5, 1.0),
                                      roi_names=("occipital", "nonexistent"),
                                      n_iter=5)
        assert list(res) == ["occipital"]  # unknown region skipped, not fatal
        assert len(res["occipital"]) == 2
        assert all(0.0 <= a <= 1.0 for a in res["occipital"])
        out = tmp_path / "out"
        assert (out / "ridge_regression_ch_ratio.pkl").exists()
        assert (out / "ridge_regression_ch_ratio.png").exists()

    def test_onsets_per_channel_sweep(self, god_cfg, tmp_path):
        from examples.kamitani_regression import run_onsets_per_channel_sweep

        res = run_onsets_per_channel_sweep(god_cfg, onsets=(0.02, 0.06),
                                           roi_names=("occipital",), n_iter=5)
        # one ROI x two onsets -> 2 combinations
        assert len(res["acc"]) == 2
        assert res["occipital"] == [0.02, 0.06]
        csv_path = tmp_path / "out" / "ridge_regression_var_onsets_per_ch.csv"
        assert csv_path.exists()
        lines = csv_path.read_text().strip().splitlines()
        assert len(lines) == 3  # header + 2 rows

    def test_manual_channel_sweep(self, god_cfg, tmp_path):
        from examples.kamitani_regression import run_manual_channel_sweep

        accs = run_manual_channel_sweep(
            god_cfg, manual_ch_lists=([1, 2, 3], None), n_iter=5)
        assert len(accs) == 2
        assert all(0.0 <= a <= 1.0 for a in accs)
        assert (tmp_path / "out" / "manual_ch_accs.json").exists()

    def test_manual_ch_selects_exact_channels(self, god_cfg):
        from meg_decoding_tpu.data.god import build_god_dataset

        ds_manual = build_god_dataset(god_cfg, "train", manual_ch=[0, 1, 2])
        assert ds_manual.X.shape[1] == 3
        ds_roi = build_god_dataset(god_cfg, "train")
        # fixture region table: occipital left+right = num_roi=8 channels
        assert ds_roi.X.shape[1] == 8

    def test_onsets_dict_concatenates_regions(self, god_cfg):
        import numpy as np

        from meg_decoding_tpu.data.god import build_god_dataset

        onsets = {"occipital/left": 0.02, "occipital/right": 0.06}
        ds = build_god_dataset(god_cfg, "train", onsets=onsets)
        # 4 left + 4 right channels, epoched at their own windows
        assert ds.X.shape[1] == 8
        # the left block equals a plain build restricted to the left
        # channels with window.start shifted to its onset
        god_cfg.set_dotted("window.start", 0.02)
        god_cfg.set_dotted("window.end", 0.02 + 0.2)
        god_cfg.region = ["occipital/left"]
        god_cfg.preprocs["brain_filter"] = None
        god_cfg.preprocs["brain_resample_rate"] = None
        ds_left = build_god_dataset(god_cfg, "train")
        L = min(ds.X.shape[-1], ds_left.X.shape[-1])
        np.testing.assert_allclose(np.asarray(ds.X[:, :4, :L]),
                                   np.asarray(ds_left.X[..., :L]), rtol=1e-6)
