"""Smoke tests for the notebook-analog example scripts (reference
notebooks/ → examples/): each must run offline (synthetic fallbacks) and
produce its outputs."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *argv, cwd):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), *argv],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=240)


class TestNotebookAnalogExamples:
    def test_check_cross_entropy(self, tmp_path):
        p = _run("check_cross_entropy.py", cwd=str(tmp_path))
        assert p.returncode == 0, p.stderr[-2000:]
        assert "soft targets" in p.stdout

    def test_check_god_image_features(self, tmp_path):
        p = _run("check_god_image_features.py", cwd=str(tmp_path))
        assert p.returncode == 0, p.stderr[-2000:]
        assert "test_categories_seen_in_train: []" in p.stdout

    def test_vis_meg(self, tmp_path):
        p = _run("vis_meg.py", "--out", str(tmp_path / "viz"),
                 cwd=str(tmp_path))
        assert p.returncode == 0, p.stderr[-2000:]
        assert (tmp_path / "viz" / "raw_traces.png").exists()
        assert (tmp_path / "viz" / "epochs_ch0.png").exists()

    def test_check_category_similarity(self, tmp_path):
        p = _run("check_category_similarity.py", "--out",
                 str(tmp_path / "cs"), cwd=str(tmp_path))
        assert p.returncode == 0, p.stderr[-2000:]
        assert "label-averaged items" in p.stdout
        assert (tmp_path / "cs" / "category_similarity.png").exists()


class TestUtilityExamples:
    """The small analysis utilities (reference examples/ scripts): smoke
    them end to end on synthetic inputs."""

    def test_view_training_curve(self, tmp_path):
        import json

        path = tmp_path / "metrics.jsonl"
        with open(path, "w") as f:
            for e in range(3):
                f.write(json.dumps({"epoch": e, "train_loss": 3.0 - e,
                                    "test_top10": 0.1 * e,
                                    "train_temp": 5.1}) + "\n")
        out = str(tmp_path / "curves.png")
        p = _run("view_training_curve.py", str(path), out, cwd=str(tmp_path))
        assert p.returncode == 0, p.stderr[-2000:]
        assert os.path.exists(out)

    def test_calc_correcoeff(self, tmp_path):
        import numpy as np

        rng = np.random.RandomState(0)
        d = tmp_path / "inference"
        d.mkdir()
        Y = rng.randn(20, 16).astype(np.float32)
        np.save(d / "Y_test.npy", Y)
        np.save(d / "Z_test.npy", Y)  # perfect predictions
        p = _run("calc_correcoeff.py", str(d), cwd=str(tmp_path))
        assert p.returncode == 0, p.stderr[-2000:]
        assert "mean per-sample corr 1.0000" in p.stdout
        assert "mean per-unit corr  1.0000" in p.stdout

    def test_rest(self, tmp_path):
        import yaml

        from meg_decoding_tpu.core.config import to_dict
        from tests.fixtures import make_god_fixture

        cfg = make_god_fixture(str(tmp_path / "d"), subjects=("sbj01",))
        conf = tmp_path / "conf"
        conf.mkdir()
        with open(conf / "config_GOD.yaml", "w") as f:
            yaml.safe_dump(to_dict(cfg), f)
        p = _run("rest.py", "--config-path", str(conf),
                 "--config-name", "config_GOD", cwd=str(tmp_path))
        assert p.returncode == 0, p.stderr[-2000:]
        assert "sbj01/" in p.stdout and "mean" in p.stdout


class TestQuickstart:
    def _run_quickstart(self, tmp_path, *argv):
        return subprocess.run(
            [sys.executable,
             os.path.join(REPO, "examples", "quickstart_synthetic.py"),
             "--out", str(tmp_path / "qs"), "--epochs", "1", *argv],
            cwd=str(tmp_path), capture_output=True, text=True, timeout=600,
            env=dict(os.environ, PALLAS_AXON_POOL_IPS="",
                     JAX_PLATFORMS="cpu"))

    def test_quickstart_synthetic_full_tour(self, tmp_path):
        """The zero-data quickstart must run the whole tour — synthetic
        cache → train → evaluate → serving export → artifact call — through
        the public entry points."""
        p = self._run_quickstart(tmp_path)
        assert p.returncode == 0, p.stderr[-2000:]
        assert "served artifact predicts (4, 16, 360)" in p.stdout
        assert (tmp_path / "qs" / "run" / "export").exists()

    @pytest.mark.slow
    @pytest.mark.parametrize("dataset", ["god", "brennan"])
    def test_quickstart_other_workloads(self, tmp_path, dataset):
        """GOD and Brennan quickstart legs (train + evaluate; the export leg
        is covered by the flagship tour above)."""
        p = self._run_quickstart(tmp_path, "--dataset", dataset,
                                 "--skip-export")
        assert p.returncode == 0, p.stderr[-2000:]
        assert "[quickstart] evaluate:" in p.stdout
