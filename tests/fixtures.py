"""Synthetic GOD-format dataset fixtures for tests.

Writes Brainstorm-style .mat triples (MEG 'F', labels 'vec_image'/'vec_index',
'trigger'), a montage CSV, and a ch_region JSON compatible with the loaders —
tiny shapes so tests run fast.
"""

import json
import os

import numpy as np
import scipy.io

from meg_decoding_tpu.core.config import Config


def make_god_fixture(root, num_channels=12, num_roi=8, fs=200.0,
                     n_train=20, n_test=10, feat_dim=16, subjects=("sbj01",),
                     seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)

    # region json: one region with num_roi channels (1-indexed)
    ch_region_path = os.path.join(root, "ch_region.json")
    with open(ch_region_path, "w") as f:
        json.dump({"occipital": {"left": list(range(1, num_roi // 2 + 1)),
                                 "right": list(range(num_roi // 2 + 1, num_roi + 1))}},
                  f)
    # montage csv: (num_channels, 3)
    montage_path = os.path.join(root, "montage.csv")
    mont = rng.rand(num_channels, 3)
    np.savetxt(montage_path, mont, delimiter=",")

    subjects_cfg = {}
    for si, sub in enumerate(subjects):
        for d in ["mat", "labels", "trigger"]:
            os.makedirs(os.path.join(root, sub, d), exist_ok=True)

        def write_session(split, n):
            T = int(fs * (n + 4))
            meg = rng.randn(num_channels, T) * 1e-12  # MEG-scale amplitudes
            triggers = (np.arange(n) + 1.0)  # seconds
            labels = rng.permutation(n) + 1  # 1-indexed image ids
            feats = rng.randn(n, feat_dim)
            # embed a decodable signal: channel pattern depends on label
            for i, (t, lab) in enumerate(zip(triggers, labels)):
                s = int(t * fs)
                meg[:, s : s + int(0.3 * fs)] += (
                    1e-12 * np.outer(np.sin(np.arange(num_channels) * lab),
                                     np.ones(int(0.3 * fs)))
                )
            events = np.empty((1, 1), dtype=object)
            # rest-file event struct: [name, ?, ?, onsets]
            ev = np.empty((1, 4), dtype=object)
            ev[0, 0] = np.array(["visual"], dtype=object)
            ev[0, 1] = np.array([[0]])
            ev[0, 2] = np.array([[0]])
            ev[0, 3] = np.linspace(1.0, n, 60).reshape(1, -1)
            scipy.io.savemat(os.path.join(root, sub, "mat", f"{split}.mat"),
                             {"F": meg, "Events": ev})
            scipy.io.savemat(os.path.join(root, sub, "labels", f"{split}.mat"),
                             {"vec_image": feats, "vec_index": labels.reshape(1, -1)})
            scipy.io.savemat(os.path.join(root, sub, "trigger", f"{split}.mat"),
                             {"trigger": triggers.reshape(1, -1)})

        write_session("train", n_train)
        write_session("val", n_test)
        subjects_cfg[sub] = {
            "fs": fs,
            "train": {"mat": ["train.mat"], "labels": ["train.mat"],
                      "trigger": ["train.mat"], "rest": ["train.mat"]},
            "val": {"mat": ["val.mat"], "labels": ["val.mat"],
                    "trigger": ["val.mat"], "rest": ["val.mat"]},
        }

    cfg = Config({
        "dataset": "GOD",
        "data_root": root,
        "subjects": subjects_cfg,
        "region": ["occipital/left", "occipital/right"],
        "ch_region_path": ch_region_path,
        "montage_path": montage_path,
        "num_meg_channels": num_channels,
        "z_scoring": False,
        "rest_duration": 10,
        "normalize_meg": False,
        "normalize_image_features": False,
        "window": {"start": 0.0, "end": 0.2},
        "preprocs": {
            "brain_filter": [1.0, 40.0],
            "brain_resample_rate": 100,
            "baseline_len_sec": 0.05,
            "clamp": True,
            "clamp_lim": 20,
            "last4layers": False,
        },
    })
    return cfg
