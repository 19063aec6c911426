"""Auxiliary subsystems: preproc cache, error analysis, CLIP features,
RSA, profiling, DP setup."""

import json
import os

import numpy as np
import pytest

import jax

from meg_decoding_tpu.cli.eval_analysis import (
    binary_confusion,
    double_standardize,
    extend_gallery,
    fp_tp_rates,
    run_error_analysis,
    top5_table,
)
from meg_decoding_tpu.utils.cache import check_preprocs, is_done, mark_done


class TestPreprocCache:
    def test_create_then_match(self, tmp_path):
        params = {"rate": 120, "low": 1.0, "high": 60}
        d1, x1, y1 = check_preprocs(params, str(tmp_path))
        assert d1.endswith("0") and not x1 and not y1
        # same params → same dir
        d2, _, _ = check_preprocs(dict(params), str(tmp_path))
        assert d1 == d2
        # different params → new numbered dir
        d3, _, _ = check_preprocs({**params, "rate": 100}, str(tmp_path))
        assert d3.endswith("1")

    def test_excluded_keys_ignored(self, tmp_path):
        params = {"rate": 120, "mode": "a"}
        d1, _, _ = check_preprocs(params, str(tmp_path))
        d2, _, _ = check_preprocs({"rate": 120, "mode": "b"}, str(tmp_path))
        assert d1 == d2

    def test_done_flags(self, tmp_path):
        d, x, y = check_preprocs({"a": 1}, str(tmp_path))
        assert not is_done(d, "x_done")
        mark_done(d, "x_done")
        assert is_done(d, "x_done")
        d2, x2, y2 = check_preprocs({"a": 1}, str(tmp_path))
        assert d2 == d and x2 and not y2


class TestErrorAnalysis:
    def test_double_standardize(self):
        rng = np.random.RandomState(0)
        Z = double_standardize(rng.randn(20, 16) * 3 + 1)
        np.testing.assert_allclose(Z.mean(1), 0, atol=1e-10)
        np.testing.assert_allclose(Z.std(1), 1, atol=1e-10)

    def test_binary_confusion_perfect(self):
        rng = np.random.RandomState(1)
        Y = rng.randn(10, 8)
        acc, mat, sim = binary_confusion(Y, Y)
        assert acc == 1.0
        # off-diagonal all +1 (self-sim is max), diagonal 0
        assert np.all(np.diagonal(mat) == 0)
        off = mat[~np.eye(10, dtype=bool)]
        assert np.all(off == 1.0)

    def test_fp_tp_rates(self):
        mat = np.array([[0, 1, 1], [1, 0, -1], [-1, 1, 0]], float)
        fp, tp = fp_tp_rates(mat)
        np.testing.assert_allclose(tp, [1.0, 0.5, 0.5])
        np.testing.assert_allclose(fp, [0.5, 0.0, 0.5])

    def test_top5_and_full_analysis(self, tmp_path):
        rng = np.random.RandomState(2)
        Y = rng.randn(12, 16).astype(np.float32)
        Z = Y + 0.3 * rng.randn(12, 16).astype(np.float32)
        labels = np.arange(1, 13)
        out = run_error_analysis(Z, Y, labels, str(tmp_path), make_plots=True)
        assert 0.5 < out["similarity_acc"] <= 1.0
        assert os.path.exists(str(tmp_path / "top5.csv"))
        assert os.path.exists(str(tmp_path / "confusion_mat.png"))
        # csv matches the reference's column layout
        import csv

        with open(tmp_path / "top5.csv") as f:
            rows = list(csv.DictReader(f))
        assert set(rows[0].keys()) >= {"query_image_id", "acc(scene_id)",
                                       "top1_image_id", "top5_image_id"}

    def test_distractor_gallery(self, tmp_path):
        rng = np.random.RandomState(3)
        Y = rng.randn(8, 16).astype(np.float32)
        Z = Y + 0.1 * rng.randn(8, 16).astype(np.float32)
        distractors = rng.randn(100, 16).astype(np.float32)
        out = run_error_analysis(Z, Y, np.arange(1, 9), str(tmp_path),
                                 distractors=distractors, make_plots=False)
        assert os.path.exists(str(tmp_path / "top5_with_imagenet_val.csv"))
        gal = extend_gallery(Y, distractors)
        assert gal.shape == (108, 16)


class TestClipFeatures:
    def test_random_backend_512d(self):
        from meg_decoding_tpu.features.clip_features import (
            encode_images,
            load_clip,
            preprocess_images,
        )

        model, params = load_clip(backend="random")
        imgs = (np.random.RandomState(0).rand(3, 64, 64, 3) * 255).astype(np.uint8)
        pre = preprocess_images(imgs)
        assert pre.shape == (3, 224, 224, 3)
        feats = encode_images(model, params, pre)
        assert feats.shape == (3, 512)
        assert np.all(np.isfinite(feats))


class TestRSA:
    def test_corr_of_corr_detects_shared_structure(self):
        from examples.check_corr_of_corr import rsa_corr_of_corr

        rng = np.random.RandomState(4)
        Y = rng.randn(30, 16)
        mix = rng.randn(16, 24)
        X = Y @ mix + 0.1 * rng.randn(30, 24)  # MEG shares Y's geometry
        r = rsa_corr_of_corr(X, Y)
        assert r > 0.5
        r_null = rsa_corr_of_corr(rng.randn(30, 24), Y)
        assert abs(r_null) < 0.3


class TestProfiling:
    def test_step_timer(self):
        from meg_decoding_tpu.utils.profiling import StepTimer

        t = StepTimer()
        with t.phase("a"):
            pass
        with t.phase("a"):
            pass
        means = t.means_ms()
        assert "t_a_ms" in means and means["t_a_ms"] >= 0


class TestDPSetup:
    def test_setup_on_cpu_mesh(self):
        from meg_decoding_tpu.core.config import Config
        from meg_decoding_tpu.parallel.dp import setup_data_parallel

        mesh, shard_fn, repl = setup_data_parallel(Config({}))
        assert mesh is not None  # 8 virtual devices in tests
        x = np.ones((16, 4), np.float32)
        (xs,) = shard_fn((x,))
        assert "data" in str(xs.sharding.spec)
        # disabled by config
        mesh2, s2, r2 = setup_data_parallel(Config({"data_parallel": False}))
        assert mesh2 is None and s2 is None


class TestBrainstormConverters:
    """scripts/convert_brainstorm_montage.py — reference
    matlab_utils/utils.py:8-44 (create_montage / create_ch_region_pair)."""

    def test_channel_mat_to_montage_and_regions(self, tmp_path):
        import scipy.io

        from scripts.convert_brainstorm_montage import convert

        n = 6
        dt = np.dtype([("Name", object), ("Comment", object),
                       ("Type", object), ("Group", object), ("Loc", object)])
        chans = np.zeros((1, n), dtype=dt)
        rng = np.random.RandomState(0)
        sides = ["Left", "Right"]
        for i in range(n):
            chans[0, i] = (f"MEG{i:03d}", f"Occipital {sides[i % 2]}",
                           "MEG", "", rng.rand(3, 8))
        p = tmp_path / "channel.mat"
        scipy.io.savemat(p, {"Channel": chans})
        montage_path, region_path = convert(str(p), str(tmp_path / "out"),
                                            num_channels=n)
        locs = np.loadtxt(montage_path, delimiter=",")
        assert locs.shape == (n, 3)
        import json

        regions = json.load(open(region_path))
        assert set(regions["occipital"]) == {"left", "right"}
        assert sorted(regions["occipital"]["left"]
                      + regions["occipital"]["right"]) == list(range(1, n + 1))

    def test_region_mat_to_ch_region_json(self, tmp_path):
        import json

        import scipy.io

        from scripts.convert_brainstorm_montage import convert_region_mat

        p = tmp_path / "region.mat"
        scipy.io.savemat(p, {
            "occipital": {"left": np.arange(1, 5, dtype=np.int64),
                          "right": np.arange(5, 9, dtype=np.int64)},
            "frontal": {"mid": np.arange(9, 12, dtype=np.int64)}})
        out = tmp_path / "ch_region.json"
        convert_region_mat(str(p), str(out), expected_total=11)
        regions = json.load(open(out))
        assert regions["occipital"]["left"] == [1, 2, 3, 4]
        assert regions["frontal"]["mid"] == [9, 10, 11]
