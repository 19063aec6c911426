"""Kamitani-lab classical baseline: SLiR feature prediction on GOD MEG.

Reference: ``examples/kamitani_regression.py`` (``run_meg_fit_and_evaluate``
:215-255): load train/val GOD epochs → SCP (time-mean) → per-unit voxel
selection + SLiR regression → category-averaged pairwise identification
accuracy.  Here the per-unit loop is one vmapped TPU program
(``kamitani/pipeline.py``).

    python examples/kamitani_regression.py --config-name config_GOD \
        save_root=runs_out ch_ratios=1.0
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meg_decoding_tpu.cli.main import parse_cli
from meg_decoding_tpu.data.god import build_god_dataset
from meg_decoding_tpu.kamitani.pipeline import (
    feature_prediction,
    get_averaged_feature,
    pairwise_identification_rate,
)


def run(cfg, ch_ratios: float = 1.0, n_iter: int = 200):
    train = build_god_dataset(cfg, "train")
    test = build_god_dataset(cfg, "val")

    # SCP: mean over the time window (reference :226-228)
    train_X = np.asarray(train.X).mean(-1)
    test_X = np.asarray(test.X).mean(-1)
    train_Y = np.asarray(train.Y)
    test_Y = np.asarray(test.Y)
    test_label = np.asarray(test.labels)

    n_voxel = max(int(ch_ratios * train_X.shape[1]), 1)
    pred_y, true_y = feature_prediction(train_X, train_Y, test_X, test_Y,
                                        n_voxel=n_voxel, n_iter=n_iter)

    pred_avg, true_avg, label_set = get_averaged_feature(pred_y, true_y, test_label)
    rates = pairwise_identification_rate(pred_avg, true_avg)
    acc = float(np.mean(rates))
    cat_wise = {int(k): float(v) for k, v in zip(label_set, rates)}
    print("ACC from binary corr", acc)

    save_root = cfg.get("save_root", "runs_out")
    os.makedirs(save_root, exist_ok=True)
    with open(os.path.join(save_root, "kamitani_regression.json"), "w") as f:
        json.dump({"acc": acc, "category_wise": cat_wise}, f, indent=2)
    return acc, cat_wise


def run_roi_onset_sweep(cfg, onsets=(0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.4),
                        duration: float = 0.2,
                        roi_names=("occipital", "parietal", "frontal",
                                   "temporal", "central"),
                        n_iter: int = 200):
    """ROI × onset-window sweep (reference main_meg_repetiton_roi,
    examples/kamitani_regression.py:261-283): per region, slide a
    ``duration``-long window across onsets and plot accuracy."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import json as _json

    # same packaged-table fallback as data/roi.py:roi — the sweep must not
    # crash in setups where plain run() works
    region_path = cfg.get("ch_region_path")
    if not (region_path and os.path.exists(region_path)):
        from meg_decoding_tpu.data import roi as _roi_mod

        region_path = os.path.join(
            os.path.dirname(os.path.abspath(_roi_mod.__file__)),
            "layouts", "god_ch_region.json")
    with open(region_path) as f:
        known_regions = set(_json.load(f).keys())

    results = {}
    for roi_name in roi_names:
        if roi_name not in known_regions:
            print(f"[sweep] region {roi_name!r} not in ch_region.json — skipped")
            continue
        cfg.region = [f"{roi_name}/right", f"{roi_name}/left"]
        xs, accs = [], []
        for start in onsets:
            cfg.set_dotted("window.start", float(start))
            cfg.set_dotted("window.end", float(start) + duration)
            acc, _ = run(cfg, n_iter=n_iter)
            xs.append(start)
            accs.append(acc)
        results[roi_name] = dict(zip(xs, accs))
        plt.plot(xs, accs, label=roi_name)
    plt.xlabel("onset [s]")
    plt.ylabel("Acc")
    plt.legend()
    plt.title(f"{duration*1000:.0f} ms window")
    out = os.path.join(cfg.get("save_root", "runs_out"),
                       f"ridge_regression_{duration}s.png")
    plt.savefig(out, bbox_inches="tight")
    print("saved", out)
    return results


if __name__ == "__main__":
    cfg = parse_cli(default_config_name="config_GOD")
    if cfg.get("sweep") == "roi_onset":
        run_roi_onset_sweep(cfg, n_iter=int(cfg.get("slir_n_iter", 200)))
    else:
        run(cfg, ch_ratios=float(cfg.get("ch_ratios", 1.0)),
            n_iter=int(cfg.get("slir_n_iter", 200)))
