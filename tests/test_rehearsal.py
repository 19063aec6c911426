"""Real-data rehearsal (VERDICT r3 #8): the one command chain a reference
user runs on the day real GOD data is mounted —

    reference ``model_last.pt``
      → ``scripts/import_torch_checkpoint.py``
      → ``eval_wowandb_cv.py`` (``cli/evaluate_god.py`` + error analysis)
      → ``top5.csv`` whose acc column mean reproduces the reference's
        committed 0.7397 (``/root/reference/tmps/top5.csv``, writer
        ``eval_wowandb_cv.py:352-366``)

This smoke test runs that exact chain on synthetic GOD .mats: a torch
checkpoint with the REFERENCE's module names is fabricated via the
certified transplant, imported through the real importer entry point, and
evaluated through the real evaluator entry point; the resulting top5.csv
must carry the reference's header and self-consistent contents.  README
§"Real-data rehearsal" documents the same chain as shell commands.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REFERENCE_TOP5_HEADER = [
    "", "query_image_id", "acc(scene_id)", "top1_image_id", "top2_image_id",
    "top3_image_id", "top4_image_id", "top5_image_id",
]


@pytest.mark.slow
def test_reference_checkpoint_to_top5_csv(tmp_path):
    import jax

    from scripts.import_torch_checkpoint import run as import_run

    from meg_decoding_tpu.cli.evaluate_god import run as eval_run
    from meg_decoding_tpu.data.layout import ch_locations_2d
    from meg_decoding_tpu.data.roi import roi
    from meg_decoding_tpu.models.factory import get_model
    from tests.fixtures import make_god_fixture, reference_named_state_dict

    root = str(tmp_path / "god")
    cfg = make_god_fixture(root, subjects=("sbj01", "sbj02"))
    save_root = os.path.join(root, "out")
    dims = dict(D1=8, D2=12, F=16, K=4)
    for k, v in dict(save_root=save_root, model="brain_encoder",
                     seq2seq=False, num_subjects=2, batch_size=16,
                     updates=4, epochs=1, lr=1e-3, lr_scheduler="none",
                     init_temperature=5.1, error_analysis=True, seed=0,
                     **dims).items():
        cfg.set_dotted(k, v)

    # --- 1. fabricate the reference user's model_last.pt ------------------
    roi_channels = roi(cfg)
    loc = ch_locations_2d(cfg, roi_channels)
    cfg.num_channels = len(roi_channels)
    model = get_model(cfg, loc=loc, num_channels=len(roi_channels))
    rng = np.random.RandomState(0)
    X = np.asarray(rng.randn(4, len(roi_channels), 20), np.float32)
    subs = np.asarray(rng.randint(0, 2, 4))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "spatial": jax.random.PRNGKey(1)},
        X, subs)
    sd, _ = reference_named_state_dict(
        jax.device_get(variables), np.asarray(loc), d1=dims["D1"],
        d2=dims["D2"], f_dim=dims["F"], k_dim=dims["K"], num_subjects=2,
        seq2seq=False)
    pt_path = str(tmp_path / "model_last.pt")
    torch.save(sd, pt_path)

    # --- 2. import through the real entry point ---------------------------
    ckpt_path = import_run(pt_path, cfg)
    assert os.path.isdir(ckpt_path)

    # --- 3. evaluate through the real entry point (error analysis on) -----
    results = eval_run(cfg)
    assert np.isfinite(results["pairwise_correlation"])

    # --- 4. the reference's top5.csv artifact -----------------------------
    top5 = os.path.join(save_root, "top5.csv")
    assert os.path.exists(top5), os.listdir(save_root)
    with open(top5) as f:
        header = f.readline().strip().split(",")
        rows = [line.strip().split(",") for line in f if line.strip()]
    assert header == REFERENCE_TOP5_HEADER, header
    accs = np.array([float(r[2]) for r in rows])
    # per-query pairwise acc in [0, 1]; the run's mean is the number that
    # must reproduce 0.7397 on the real data + real checkpoint
    assert ((accs >= 0) & (accs <= 1)).all()
    assert len(rows) > 0
    print(f"rehearsal top5.csv mean acc = {accs.mean():.4f} "
          f"({len(rows)} queries)")
