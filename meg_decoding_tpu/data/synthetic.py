"""Synthetic datasets in the exact on-disk formats the real builders read.

Lets a new user (or a CI machine) drive the full pipeline — cache loading,
packing, training, evaluation, serving export — with zero access to the
real Gwilliams2022/Brennan/GOD data: the generated cache is bit-format
compatible with the reference's preprocessed layout
(``x_dict.npy``/``y_dict.npy``/onset tables under
``data/Gwilliams2022/preprocessed/<n>/`` — reference
``gwilliams2022.py:64-109``), so every downstream code path is the real
one.  The MEG channels are a random linear mix of the task's embedding
stream plus noise, so contrastive retrieval is actually learnable and a
few epochs visibly move top-k.

Used by ``examples/quickstart_synthetic.py`` and the test fixtures
(``tests/fixtures.py``).
"""

from __future__ import annotations

import json
import os

import numpy as np
import scipy.io

from meg_decoding_tpu.core.config import Config

__all__ = ["make_synthetic_gwilliams_cache",
           "make_synthetic_god_dataset",
           "make_synthetic_brennan_raw"]


def make_synthetic_gwilliams_cache(cache_dir: str, n_subjects: int = 2,
                                   n_sessions_per: int = 2, C: int = 12,
                                   rate: int = 120, rec_sec: float = 30.0,
                                   words_per_task: int = 24, F: int = 16,
                                   seed: int = 0) -> Config:
    """Write a reference-format Gwilliams preprocessed cache with synthetic
    recordings, embedding streams, and word-onset tables; returns a minimal
    config pointing at it (extend with model/training keys and pass to the
    trainers)."""
    rng = np.random.RandomState(seed)
    os.makedirs(cache_dir, exist_ok=True)
    T = int(rec_sec * rate)
    x_dict, meg_onsets, speech_onsets, sentence_idxs, y_dict = {}, {}, {}, {}, {}
    for t in range(4):
        task = f"task{t}"
        onsets = np.sort(rng.uniform(0.5, rec_sec - 4.0, words_per_task))
        speech_onsets[task] = onsets
        # one sentence index per word (groups of 4; a remainder forms a
        # final shorter sentence) — must stay the same length as the onset
        # tables for every words_per_task
        sentence_idxs[task] = np.arange(words_per_task) // 4
        y_dict[task] = rng.randn(F, T).astype(np.float64)
    for s in range(n_subjects):
        for sess in range(n_sessions_per):
            for t in range(4):
                key = f"subject{s+1:02d}_sess{sess}_task{t}"
                # MEG correlated with the task's embedding stream via a
                # random channel mixer so retrieval is learnable
                task = f"task{t}"
                mix = rng.randn(C, F) * 0.5
                x = mix @ y_dict[task] + 0.1 * rng.randn(C, T)
                x_dict[key] = x.astype(np.float64)
                meg_onsets[key] = speech_onsets[task]  # same alignment
    # a cache-resident sensor layout, as build_gwilliams_cache.py persists
    # from the first BIDS recording (ch_locations_2d prefers it)
    from meg_decoding_tpu.data.layout import synthetic_cap_locations

    np.save(os.path.join(cache_dir, "layout.npy"),
            synthetic_cap_locations(C).astype(np.float32))
    # channel-count sidecar, as scripts/build_gwilliams_cache.py writes
    # (metadata-only consumers read this instead of the multi-GB x_dict)
    with open(os.path.join(cache_dir, "meta.json"), "w") as f:
        json.dump({"num_channels": int(C)}, f)
    np.save(os.path.join(cache_dir, "x_dict.npy"), x_dict, allow_pickle=True)
    np.save(os.path.join(cache_dir, "y_dict.npy"), y_dict, allow_pickle=True)
    np.save(os.path.join(cache_dir, "meg_onsets.npy"), meg_onsets,
            allow_pickle=True)
    np.save(os.path.join(cache_dir, "speech_onsets.npy"), speech_onsets,
            allow_pickle=True)
    np.save(os.path.join(cache_dir, "sentence_idxs.npy"), sentence_idxs,
            allow_pickle=True)
    return Config({
        "dataset": "Gwilliams2022",
        "cache_dir": cache_dir,
        "split_ratio": 0.8,
        "split_mode": "sentence",
        "num_channels": C,
        "preprocs": {
            "brain_resample_rate": rate,
            "seq_len_sec": 3,
            "baseline_len_sec": 0.5,
            "shift_brain": True,
            "shift_len": 150,
            "clamp": True,
            "clamp_lim": 20,
            "last4layers": False,
        },
    })


def make_synthetic_god_dataset(root, num_channels=12, num_roi=8, fs=200.0,
                               n_train=20, n_test=10, feat_dim=16,
                               subjects=("sbj01",), seed=0) -> Config:
    """Write synthetic GOD sessions in the Brainstorm-export .mat schema the
    real loaders read (MEG ``F`` + struct-array ``Events``, label .mats with
    ``vec_image``/``vec_index``, trigger .mats — reference
    load_meg.py:12-103), plus montage.csv and ch_region.json; returns a
    minimal config pointing at them.  A label-dependent channel pattern is
    planted so classification/retrieval is learnable."""
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
            # Brainstorm-style Events: a MATLAB STRUCT ARRAY (one record per
            # event type; the loaders index records by field POSITION —
            # [0]=label, [3]=times — matching reference load_meg.py:12-31).
            # A non-visual first record exercises the search loop.
            ev_dt = np.dtype([("label", object), ("color", object),
                              ("epochs", object), ("times", object)])
            ev = np.zeros((1, 2), dtype=ev_dt)
            ev[0, 0] = (np.array(["motor"]), np.zeros((1, 1)),
                        np.zeros((1, 1)), np.array([[0.5]]))
            ev[0, 1] = (np.array(["visual"]), np.zeros((1, 1)),
                        np.zeros((1, 1)),
                        np.linspace(1.0, n, 60).reshape(1, -1))
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


def make_synthetic_brennan_raw(root, n_subjects=4, C=8, fs=500.0,
                               rec_sec=60.0, F=16, seed=0) -> Config:
    """Write synthetic Brennan-format raw .mat EEG files (fieldtrip-style
    ``raw`` struct — reference brennan2018.py:248-258) + a precomputed Y
    embedding stream at the brain rate (skips wav2vec; the loader accepts a
    cached ``Y_embeds``); returns a minimal config pointing at them."""
    rng = np.random.RandomState(seed)
    raw_dir = os.path.join(root, "data", "Brennan2018", "raw")
    os.makedirs(raw_dir, exist_ok=True)
    T = int(fs * rec_sec)
    rate = 120.0
    Ty = int(rate * rec_sec)
    Y = rng.randn(F, Ty).astype(np.float32)
    # EEG = channel-mixed, upsampled Y + noise (decodable)
    from scipy.signal import resample as sp_resample

    Y_at_fs = sp_resample(Y, T, axis=-1)
    subj_ids = [1, 3, 4, 5, 6, 8][:n_subjects]  # avoid excluded S02/S07
    for i in subj_ids:
        mix = rng.randn(C, F) * 0.5
        eeg = mix @ Y_at_fs + 0.1 * rng.randn(C, T)
        entry = np.zeros((1,), dtype=[("trial", "O"), ("fsample", "O"), ("label", "O")])
        trial = np.zeros((1, 1), dtype=object)
        trial[0, 0] = eeg
        entry[0]["trial"] = trial
        entry[0]["fsample"] = np.array([[fs]])
        entry[0]["label"] = np.array([["ch"]])
        scipy.io.savemat(os.path.join(raw_dir, f"S{i:02d}.mat"),
                         {"raw": entry.reshape(1, 1)})
    y_dir = os.path.join(root, "data", "Brennan2018", "Y_embeds")
    os.makedirs(y_dir, exist_ok=True)
    np.save(os.path.join(y_dir, "embd_wav2vec.npy"), Y)
    cfg = Config({
        "dataset": "Brennan2018",
        "root_dir": root,
        "split_ratio": 0.8,
        "num_channels": C,
        "preprocs": {
            "brain_resample_rate": rate,
            "brain_filter_low": 1.0,
            "brain_filter_high": 50.0,
            "seq_len_sec": 3,
            "baseline_len_sec": 0.5,
            "shift_brain": True,
            "shift_len": 150,
            "subject_wise": True,
            "clamp": True,
            "clamp_lim": 20,
            "last4layers": False,
        },
    })
    return cfg
