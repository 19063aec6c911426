"""GOD (Generic Object Decoding) MEG→image dataset builder.

Reference: ``meg_decoding/dataclass/god.py`` (``GODDatasetBase``) +
``meg_decoding/matlab_utils/load_meg.py`` (``get_meg_data``, ``get_baseline``,
``roi``, ``time_window``).

Pipeline per (subject, session): load Brainstorm-exported ``.mat`` triples
(MEG ``F`` matrix, label file with CLIP ``vec_image``/``vec_index``, trigger
onsets) → optional rest-period z-scoring (``god.py:124-126``) → ROI channel
selection (``god.py:127``) → optional bandpass + resample — **on device, all
channels at once** (``god.py:128-135`` did this per-recording on host CPU via
MNE) → trigger-based epoching into windows (``god.py:99-108,136-139``) as one
gather.  Optional global normalization with reusable stats (``god.py:44-65``);
``val`` split averages epochs sharing (image, subject) (``god.py:70-71,154-167``).

Host I/O (scipy.io.loadmat) stays on host; everything numeric runs under jit.
"""

from __future__ import annotations

import numpy as np
import scipy.io

import jax.numpy as jnp

from meg_decoding_tpu.data.packed import PackedDataset
from meg_decoding_tpu.data.roi import roi
from meg_decoding_tpu.ops.fir import bandpass_filter
from meg_decoding_tpu.ops.resample import resample_fft
from meg_decoding_tpu.ops.scaling import epoch_slice

__all__ = [
    "get_baseline",
    "get_meg_data",
    "time_window",
    "build_god_dataset",
]

_SPLIT_SIZES = {"train": 600, "test": 50, "rest": 60}


def get_baseline(meg_filepath: str, fs: float, duration: float):
    """Rest-period per-channel mean/std from the 60 s window after the last
    visual event (reference ``load_meg.py:12-31``)."""
    data = scipy.io.loadmat(meg_filepath)
    MEG_Data = data["F"]
    events = data["Events"][0]
    visual_id = None
    for i in range(len(events)):
        if events[i][0][0] == "visual":
            visual_id = i
            break
    assert visual_id is not None, "no visual events in rest file"
    onset_timing = events[visual_id][3][0]
    start = int(onset_timing[-1] * fs)
    end = start + int(duration * fs)
    rest = MEG_Data[:, start:end]
    return rest.mean(axis=1), rest.std(axis=1)


def get_meg_data(
    meg_filepath: str,
    label_filepath: str,
    trigger_filepath: str,
    rest_mean=None,
    rest_std=None,
    split: str = "train",
    num_channels: int = 203,
    enforce_split_sizes: bool = False,
):
    """Load one session's (MEG, image_features, labels, triggers)
    (reference ``load_meg.py:34-103``).  ``enforce_split_sizes`` enables the
    reference's hard-coded GOD cardinality asserts (600/50/60)."""
    data = scipy.io.loadmat(meg_filepath)
    MEG_Data = np.asarray(data["F"], dtype=np.float64)
    assert len(MEG_Data) == num_channels, f"expected {num_channels} channels"
    if rest_mean is not None:
        MEG_Data = MEG_Data - rest_mean[:, None]
    if rest_std is not None:
        MEG_Data = MEG_Data / rest_std[:, None]

    label_data = scipy.io.loadmat(label_filepath)
    image_features = np.asarray(label_data["vec_image"])
    labels = np.asarray(label_data["vec_index"][0])
    triggers = np.asarray(scipy.io.loadmat(trigger_filepath)["trigger"][0])
    if enforce_split_sizes and split in _SPLIT_SIZES:
        n = _SPLIT_SIZES[split]
        assert image_features.shape[0] == n, image_features.shape
        assert len(labels) == n and len(triggers) == n
    return MEG_Data, image_features, labels, triggers


def time_window(cfg, triggers: np.ndarray, fs: float,
                start: float | None = None,
                end: float | None = None) -> np.ndarray:
    """Trigger times → (start, end) sample index pairs
    (reference ``load_meg.py:123-130``).  ``start``/``end`` override
    ``cfg.window`` without mutating the config (the per-region-onset sweep
    epochs each region at its own window — reference
    examples/kamitani_regression.py:101-104 mutates ``args.window``)."""
    trigger_point = np.round(triggers * fs)
    start_pt = np.round((cfg.window.start if start is None else start) * fs)
    end_pt = np.round((cfg.window.end if end is None else end) * fs)
    return np.stack(
        [(trigger_point + start_pt).astype(int),
         (trigger_point + end_pt).astype(int)], axis=1
    )


def _normalize_per_unit(arr: np.ndarray, mean=None, std=None):
    """Per-unit (column) z-scoring with reusable stats (god.py:20-30)."""
    if mean is None:
        mean = np.mean(arr, axis=0, keepdims=True)
        std = np.std(arr, axis=0, keepdims=True)
    return (arr - mean) / std, mean, std


def build_god_dataset(
    cfg,
    split: str,
    mean_X=None,
    std_X=None,
    mean_Y=None,
    std_Y=None,
    manual_ch=None,
    onsets=None,
) -> PackedDataset:
    """Build the packed GOD dataset for ``split`` ('train' or 'val').

    Mirrors ``GODDatasetBase.__init__`` + ``prepare_data`` (god.py:32-152).

    ``manual_ch``: explicit 0-indexed channel list that bypasses the ROI
    lookup (the Kamitani manual-channel experiment — reference
    examples/kamitani_regression.py:48).

    ``onsets``: dict of region string → onset seconds.  Each region's
    channels are epoched at their own (onset, onset + window-duration)
    window and the epochs concatenated along the channel axis — the
    reference's per-region-onset branch (kamitani_regression.py:95-109),
    which also SKIPS the bandpass/resample path (mirrored here; windows
    index the raw-rate recording).
    """
    data_root = cfg.data_root
    sub_list = list(cfg.subjects.keys())
    sub_id_map = {s: i for i, s in enumerate(sub_list)}
    if manual_ch is not None:
        roi_channels = np.asarray(manual_ch, dtype=int)
    else:
        roi_channels = np.asarray(roi(cfg))

    meg_epochs, sub_epochs, label_epochs, feat_epochs = [], [], [], []
    for sub in sub_list:
        scfg = cfg.subjects[sub]
        fs = float(scfg["fs"])
        file_split = scfg[split]
        for meg_name, label_name, trig_name, rest_name in zip(
            file_split["mat"], file_split["labels"], file_split["trigger"],
            file_split["rest"],
        ):
            meg_path = f"{data_root}/{sub}/mat/{meg_name}"
            label_path = f"{data_root}/{sub}/labels/{label_name}"
            trig_path = f"{data_root}/{sub}/trigger/{trig_name}"
            rest_path = f"{data_root}/{sub}/mat/{rest_name}"

            rest_mean = rest_std = None
            if cfg.get("z_scoring", False):
                rest_mean, rest_std = get_baseline(rest_path, fs, cfg.rest_duration)
            num_ch = int(cfg.get("num_meg_channels", 203))
            MEG, feats, labels, triggers = get_meg_data(
                meg_path, label_path, trig_path, rest_mean, rest_std,
                split=split, num_channels=num_ch,
                enforce_split_sizes=bool(cfg.get("enforce_split_sizes", False)),
            )
            if onsets is not None:
                # per-region onset epoching (reference branch at
                # kamitani_regression.py:95-109): no filter/resample, each
                # region's window starts at its own onset; parts concatenate
                # along the channel axis.  Rounding can make windows differ
                # by one sample across onsets — trim to the shortest (the
                # reference would crash on the mismatch).
                duration = float(cfg.window.end) - float(cfg.window.start)
                parts = []
                for reg, onset in onsets.items():
                    reg_list = [reg] if isinstance(reg, str) else list(reg)
                    chans = np.asarray(roi(cfg, region=reg_list), dtype=int)
                    xr = jnp.asarray(MEG[chans], dtype=jnp.float32)
                    win = time_window(cfg, triggers, fs, start=float(onset),
                                      end=float(onset) + duration)
                    ln = int(win[0, 1] - win[0, 0])
                    parts.append(epoch_slice(xr, jnp.asarray(win[:, 0]), ln))
                min_len = min(int(p.shape[-1]) for p in parts)
                epochs = jnp.concatenate(
                    [p[..., :min_len] for p in parts], axis=1)
            else:
                x = jnp.asarray(MEG[roi_channels], dtype=jnp.float32)  # (C_roi, T)

                brain_filter = cfg.preprocs.get("brain_filter")
                if brain_filter is not None:
                    x = bandpass_filter(x, fs, float(brain_filter[0]), float(brain_filter[1]))
                rate = cfg.preprocs.get("brain_resample_rate")
                if rate is not None:
                    x = resample_fft(x, down=fs / float(rate))
                    fs_eff = float(rate)
                else:
                    fs_eff = fs
                windows = time_window(cfg, triggers, fs_eff)
                length = int(windows[0, 1] - windows[0, 0])
                epochs = epoch_slice(x, jnp.asarray(windows[:, 0]), length)  # (N, C, L)

            meg_epochs.append(np.asarray(epochs))
            sub_epochs += [sub_id_map[sub]] * len(epochs)
            label_epochs.append(labels)
            feat_epochs.append(feats)

    X = np.concatenate(meg_epochs, axis=0).astype(np.float32)
    Y = np.concatenate(feat_epochs, axis=0).astype(np.float32)
    labels = np.concatenate(label_epochs, axis=0)
    subs = np.asarray(sub_epochs)

    if mean_X is not None:
        X = (X - mean_X) / std_X
    elif cfg.get("normalize_meg", False):
        X, mean_X, std_X = _normalize_per_unit(X)
    if mean_Y is not None:
        Y = (Y - mean_Y) / std_Y
    elif cfg.get("normalize_image_features", False):
        Y, mean_Y, std_Y = _normalize_per_unit(Y)

    if split == "val":
        X, Y, subs, labels = _avg_same_image_sub_epochs(X, Y, subs, labels)

    return PackedDataset(
        X=jnp.asarray(X),
        Y=jnp.asarray(Y),
        subject_idxs=jnp.asarray(subs),
        labels=jnp.asarray(labels.astype(np.int32)),
        # count CONFIGURED subjects, not observed ones: if a configured
        # subject contributes no epochs here, unique(subs) would undercount
        # and the per-subject weight gather W[subject_idxs] would silently
        # clamp the out-of-range index onto another subject's weights
        num_subjects=len(sub_list),
        mean_X=mean_X, std_X=std_X, mean_Y=mean_Y, std_Y=std_Y,
    )


def _avg_same_image_sub_epochs(Xs, Ys, subs, labels):
    """Average epochs sharing (image label, subject) — god.py:154-167."""
    subs = np.asarray(subs)
    avg_X, avg_Y, new_subs, new_labels = [], [], [], []
    for lab in np.unique(labels):
        for s in np.unique(subs):
            flag = (labels == lab) & (subs == s)
            if not np.any(flag):
                continue
            avg_X.append(np.mean(Xs[flag], axis=0, keepdims=True))
            avg_Y.append(np.mean(Ys[flag], axis=0, keepdims=True))
            new_subs.append(s)
            new_labels.append(lab)
    return (np.concatenate(avg_X), np.concatenate(avg_Y), np.asarray(new_subs),
            np.asarray(new_labels))
