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


def make_gwilliams_cache(cache_dir, n_subjects=2, n_sessions_per=2, C=12,
                         rate=120, rec_sec=30.0, words_per_task=24, F=16,
                         seed=0):
    """Reference-format synthetic Gwilliams cache — the generator lives in
    the package (``data/synthetic.py``) so users get the same zero-data
    quickstart path the tests exercise."""
    from meg_decoding_tpu.data.synthetic import make_synthetic_gwilliams_cache

    return make_synthetic_gwilliams_cache(
        cache_dir, n_subjects=n_subjects, n_sessions_per=n_sessions_per,
        C=C, rate=rate, rec_sec=rec_sec, words_per_task=words_per_task,
        F=F, seed=seed)


def make_brennan_raw(root, n_subjects=4, C=8, fs=500.0, rec_sec=60.0, F=16,
                     seed=0):
    """Write synthetic Brennan-format raw .mat EEG files + a Y embedding
    stream at the brain rate."""
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
        raw = np.zeros((1, 1), dtype=object)
        entry = np.zeros((1,), dtype=[("trial", "O"), ("fsample", "O"), ("label", "O")])
        trial = np.zeros((1, 1), dtype=object)
        trial[0, 0] = eeg
        entry[0]["trial"] = trial
        entry[0]["fsample"] = np.array([[fs]])
        entry[0]["label"] = np.array([["ch"]])
        raw[0, 0] = entry.reshape(1, 1)[0, 0]
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


# --- shared flax→torch transplant helpers (torch imported lazily: most -----
# --- fixture users don't need it) ------------------------------------------

def torch_t(x):
    import torch

    return torch.tensor(np.asarray(x))


def torch_conv1d_w(kernel):
    """flax conv kernel (ks, in, out) → torch Conv1d weight (out, in, ks)."""
    return torch_t(np.transpose(np.asarray(kernel), (2, 1, 0)))


def transplant_conv_blocks(params, torch_blocks, n_blocks: int = 5):
    """Copy the flax ``conv{k}`` ConvBlock trees into torch block modules.

    Accepts both attribute-style blocks (``blk.conv0``, tools/baseline_torch)
    and ModuleDict-style (``blk["conv0"]``).  Centralizes the GLU-halves
    mapping — flax stores the 2·D2 GLU conv as ``conv2a``/``conv2b``
    (models/layers.py layout optimization) while every torch replica keeps
    the reference's single ``conv2`` — so a layer-layout change edits ONE
    place, not every transplant site.
    """
    import torch

    with torch.no_grad():
        for kk in range(n_blocks):
            blk = params[f"conv{kk}"]
            tblk = torch_blocks[kk]
            get = (tblk.__getitem__ if hasattr(tblk, "__getitem__")
                   else lambda name, _m=tblk: getattr(_m, name))
            for cname in ["conv0", "conv1"]:
                get(cname).weight.copy_(torch_conv1d_w(blk[cname]["kernel"]))
                get(cname).bias.copy_(torch_t(blk[cname]["bias"]))
            get("conv2").weight.copy_(torch.cat(
                [torch_conv1d_w(blk["conv2a"]["kernel"]),
                 torch_conv1d_w(blk["conv2b"]["kernel"])]))
            get("conv2").bias.copy_(torch.cat(
                [torch_t(blk["conv2a"]["bias"]),
                 torch_t(blk["conv2b"]["bias"])]))
            for bname in ["bn0", "bn1"]:
                get(bname).weight.copy_(torch_t(blk[bname]["scale"]))
                get(bname).bias.copy_(torch_t(blk[bname]["bias"]))
