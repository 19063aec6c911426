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


def run(cfg, ch_ratios: float = 1.0, n_iter: int = 200, manual_ch=None,
        onsets=None):
    train = build_god_dataset(cfg, "train", manual_ch=manual_ch, onsets=onsets)
    test = build_god_dataset(cfg, "val", manual_ch=manual_ch, onsets=onsets)

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


def _known_roi_names(cfg, roi_names):
    """Filter the requested region names against the run's ch_region.json —
    the sweeps must not crash in setups where plain run() works."""
    import json as _json

    region_path = cfg.get("ch_region_path")
    if not (region_path and os.path.exists(region_path)):
        from meg_decoding_tpu.data import roi as _roi_mod

        region_path = os.path.join(
            os.path.dirname(os.path.abspath(_roi_mod.__file__)),
            "layouts", "god_ch_region.json")
    with open(region_path) as f:
        known = set(_json.load(f).keys())
    kept = [r for r in roi_names if r in known]
    for r in roi_names:
        if r not in known:
            print(f"[sweep] region {r!r} not in ch_region.json — skipped")
    return kept


def run_channel_ratio_sweep(cfg,
                            ch_ratios=(0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8,
                                       0.9, 1.0),
                            roi_names=("occipital", "parietal", "frontal",
                                       "temporal", "central"),
                            n_iter: int = 200):
    """Channel-count sweep over every ROI combination (reference
    ``main_meg_repetiton_N``, examples/kamitani_regression.py:284-318): for
    each non-empty subset of ROI names (both hemispheres), fit at each
    channel ratio and record accuracy; pickle + plot the curves."""
    import itertools
    import pickle

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    roi_names = _known_roi_names(cfg, roi_names)
    pairs = []
    for n in range(1, len(roi_names) + 1):
        pairs += list(itertools.combinations(roi_names, n))

    plt.figure(figsize=(12, 6))
    results = {}
    for pair in pairs:
        region = []
        for r in pair:
            region += [f"{r}/right", f"{r}/left"]
        cfg.region = region
        accs = []
        for ratio in ch_ratios:
            acc, _ = run(cfg, ch_ratios=float(ratio), n_iter=n_iter)
            accs.append(acc)
        label = "-".join(pair)
        results[label] = accs
        plt.plot(list(ch_ratios), accs, label=label)

    save_root = cfg.get("save_root", "runs_out")
    os.makedirs(save_root, exist_ok=True)
    with open(os.path.join(save_root, "ridge_regression_ch_ratio.pkl"),
              "wb") as f:
        pickle.dump(results, f)
    plt.xlabel("ch_ratio")
    plt.ylabel("Acc")
    plt.legend(bbox_to_anchor=(1.05, 1), loc="upper left", borderaxespad=0)
    out = os.path.join(save_root, "ridge_regression_ch_ratio.png")
    plt.savefig(out, bbox_inches="tight")
    print("figure is saved as", out)
    print(results)
    return results


def run_onsets_per_channel_sweep(cfg, onsets=(0.2, 0.25, 0.3),
                                 roi_names=("occipital", "parietal",
                                            "frontal", "temporal", "central"),
                                 n_iter: int = 200):
    """Per-region onset sweep (reference ``main_meg_repetiton_onsets_per_ch``,
    examples/kamitani_regression.py:320-355): for every assignment of an
    onset to each ROI (cartesian product), epoch each region at its own
    window and record accuracy; CSV written incrementally like the
    reference."""
    import csv
    import itertools

    roi_names = _known_roi_names(cfg, roi_names)
    save_root = cfg.get("save_root", "runs_out")
    os.makedirs(save_root, exist_ok=True)
    savefile = os.path.join(save_root, "ridge_regression_var_onsets_per_ch.csv")

    results = {"acc": []}
    for r in roi_names:
        results[r] = []
    for onset_list in itertools.product(onsets, repeat=len(roi_names)):
        onset_dict = {}
        for r, o in zip(roi_names, onset_list):
            onset_dict[f"{r}/right"] = o
            onset_dict[f"{r}/left"] = o
        acc, _ = run(cfg, onsets=onset_dict, n_iter=n_iter)
        results["acc"].append(acc)
        for r, o in zip(roi_names, onset_list):
            results[r].append(o)
        # incremental rewrite after each combination, like the reference's
        # df.to_csv inside the loop
        with open(savefile, "w", newline="") as f:
            w = csv.writer(f)
            cols = ["acc"] + list(roi_names)
            w.writerow([""] + cols)
            for i in range(len(results["acc"])):
                w.writerow([i] + [results[c][i] for c in cols])
    print("results is saved as", savefile)
    return results


# reference manual channel lists (examples/kamitani_regression.py:363-368),
# 1-indexed MATLAB channels; None = full ROI
_MANUAL_CH_LISTS = (
    [136, 137, 139, 151, 152, 154],
    [136, 137, 139, 151, 152, 154, 135, 153],
    [136, 137, 139, 151, 152, 154, 135, 153, 134, 149],
    [136, 137, 139, 151, 152, 154, 135, 153, 134, 149, 133, 138, 150, 155],
    None,
)


def run_manual_channel_sweep(cfg, manual_ch_lists=_MANUAL_CH_LISTS,
                             n_iter: int = 200):
    """Manual channel-list runs (reference ``main_meg_run_manual_ch``,
    examples/kamitani_regression.py:357-372): fit on each explicit channel
    list (1-indexed in the lists, converted like the reference) and on the
    full ROI (None)."""
    import json as _json

    acc_list = []
    for manual_ch in manual_ch_lists:
        if manual_ch is not None:
            manual_ch = [c - 1 for c in manual_ch]  # matlab → python
        acc, _ = run(cfg, manual_ch=manual_ch, n_iter=n_iter)
        acc_list.append(acc)
    print(acc_list)
    save_root = cfg.get("save_root", "runs_out")
    os.makedirs(save_root, exist_ok=True)
    with open(os.path.join(save_root, "manual_ch_accs.json"), "w") as f:
        _json.dump({"acc_list": acc_list,
                    "manual_ch_lists": [list(m) if m else None
                                        for m in manual_ch_lists]}, f)
    return acc_list


if __name__ == "__main__":
    cfg = parse_cli(default_config_name="config_GOD")
    sweep = cfg.get("sweep")
    n_iter = int(cfg.get("slir_n_iter", 200))
    if sweep == "roi_onset":
        run_roi_onset_sweep(cfg, n_iter=n_iter)
    elif sweep == "ch_ratio":
        run_channel_ratio_sweep(cfg, n_iter=n_iter)
    elif sweep == "onsets_per_ch":
        run_onsets_per_channel_sweep(cfg, n_iter=n_iter)
    elif sweep == "manual_ch":
        run_manual_channel_sweep(cfg, n_iter=n_iter)
    else:
        run(cfg, ch_ratios=float(cfg.get("ch_ratios", 1.0)), n_iter=n_iter)
