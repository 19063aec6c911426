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
