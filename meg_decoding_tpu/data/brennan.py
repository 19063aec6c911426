"""Brennan2018 (EEG ↔ audiobook) dataset builder.

Reference: ``meg_decoding/dataclass/brennan2018.py`` — 49 raw .mat EEG files →
exclude 16 low-comprehension subjects (:216-233) → keep first 60 channels,
trim to the shortest recording (:244-258) → bandpass 1-60 Hz → resample so
EEG length matches the wav2vec embedding stream (:263-270) → 150 ms shift
(:289-301) → RobustScaler+clamp subject-wise or pooled (:109-134) → split
into fixed-length segments → per-segment baseline correction (:136-142).
``__getitem__`` returns a **random subject's** EEG for chunk i (:147-152).

TPU-native: X stays one (S, C, T) array in HBM; a batch is a jitted gather
(chunk id, random subject) — no host Dataset.  Scaling/baseline run once on
device.

Note on the reference's ``split(num_segments)`` bug: it passes the segment
*count* as torch.split's chunk-size argument (:103-104), so the effective
segment length is ``num_segments`` samples, not ``seq_len_samp``.  We
implement the *intended* semantics (segments of ``seq_len_samp``), and offer
``faithful_split=True`` to reproduce the reference's literal behavior
(SURVEY §7 hard-part 7).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import scipy.io

import jax.numpy as jnp

from meg_decoding_tpu.ops.fir import bandpass_filter
from meg_decoding_tpu.ops.resample import resample_fft
from meg_decoding_tpu.ops.scaling import robust_scale

# comprehension-score exclusions (brennan2018.py:216-233)
EXCLUDED_SUBJECTS = [
    "S02", "S07", "S09", "S23", "S24", "S27", "S28", "S29", "S30", "S31",
    "S32", "S33", "S43", "S46", "S47", "S49",
]

__all__ = ["EXCLUDED_SUBJECTS", "load_brennan_eeg", "build_brennan_dataset",
           "BrennanPacked"]


def load_brennan_eeg(raw_dir: str, num_channels: int = 60,
                     expected_fs: float = 500.0):
    """Load + trim the usable subjects' raw EEG → (S, C, T) float64, fs."""
    paths = sorted(glob.glob(os.path.join(raw_dir, "*.mat")))
    paths = [p for p in paths
             if os.path.basename(p).split(".")[0][-3:] not in EXCLUDED_SUBJECTS]
    if not paths:
        raise FileNotFoundError(f"no usable subject .mat files under {raw_dir}")
    eegs, fss = [], []
    for p in paths:
        mat_raw = scipy.io.loadmat(p)["raw"][0, 0]
        eeg = np.asarray(mat_raw["trial"][0, 0][:num_channels], dtype=np.float64)
        fs = float(np.asarray(mat_raw["fsample"]).reshape(-1)[0])
        assert fs == expected_fs, f"{p} has wrong srate {fs}"
        eegs.append(eeg)
        fss.append(fs)
    trim = min(e.shape[1] for e in eegs)
    X = np.stack([e[:, :trim] for e in eegs])
    return X, fss[0]


class BrennanPacked:
    """Device-resident packed Brennan dataset.

    X: (num_chunks, S, C, L) baseline-corrected segments;
    Y: (num_chunks, F, L) embedding segments.
    A training sample = (chunk i, random subject) — the sampler picks the
    subject, reproducing ``__getitem__``'s distribution (:147-152).
    """

    def __init__(self, X_chunks, Y_chunks):
        self.X = X_chunks
        self.Y = Y_chunks
        self.num_subjects = int(X_chunks.shape[1])

    def __len__(self):
        return int(self.X.shape[0])

    @property
    def host_resident(self) -> bool:
        return isinstance(self.X, np.ndarray)

    def gather(self, idx, subject_idxs=None, rng=None):
        as_arr = np.asarray if self.host_resident else jnp.asarray
        idx = as_arr(idx)
        if subject_idxs is None:
            assert rng is not None
            subject_idxs = rng.randint(0, self.num_subjects, size=len(idx))
        subject_idxs = as_arr(subject_idxs)
        X = self.X[idx, subject_idxs]  # (B, C, L)
        Y = self.Y[idx]
        return X, Y, subject_idxs, idx  # idx doubles as chunkIDs (train.py:193)

    def subset(self, idx):
        out = BrennanPacked(self.X[np.asarray(idx)], self.Y[np.asarray(idx)])
        return out

    def to_host(self) -> "BrennanPacked":
        """Spill the packed chunks to host RAM (see PackedDataset.to_host)."""
        return BrennanPacked(np.asarray(self.X), np.asarray(self.Y))


def build_brennan_dataset(cfg, Y_stream: np.ndarray,
                          X_raw: np.ndarray | None = None,
                          fs: float | None = None,
                          faithful_split: bool = False) -> BrennanPacked:
    """Full Brennan preprocessing chain on device.

    Y_stream: (F, T_y) wav2vec embeddings already at the brain rate (built by
    ``features/wav2vec.py`` + ``ops/resample.py``, cached by the caller).
    X_raw: (S, C, T_raw) raw EEG at ``fs``; if None, loaded from
    ``{root_dir}/data/Brennan2018/raw``.
    """
    pre = cfg.preprocs
    if X_raw is None:
        X_raw, fs = load_brennan_eeg(f"{cfg.root_dir}/data/Brennan2018/raw")
    S, C, _ = X_raw.shape

    x = jnp.asarray(X_raw, dtype=jnp.float32)
    x = bandpass_filter(x, fs, float(pre.brain_filter_low), float(pre.brain_filter_high))
    # resample EEG so its length matches the embedding stream (brennan :269-270)
    audio_len = Y_stream.shape[-1]
    x = resample_fft(x, up=audio_len / x.shape[-1])
    srate = fs * audio_len / X_raw.shape[-1]
    y = jnp.asarray(Y_stream, dtype=jnp.float32)

    # 150 ms shift: EEG forward, audio cropped (brennan :289-301)
    if pre.get("shift_brain", True):
        shift = int(srate * (float(pre.get("shift_len", 150)) / 1000))
        x = x[..., shift:]
        y = y[..., : y.shape[-1] - shift]
    T = min(x.shape[-1], y.shape[-1])
    x, y = x[..., :T], y[..., :T]

    seq_len_samp = int(float(pre.seq_len_sec) * srate)
    num_segments = (T // seq_len_samp)
    if faithful_split:
        # reference's literal behavior: chunk size = num_segments samples
        seg_len = num_segments
        num_segments = T // seg_len
    else:
        seg_len = seq_len_samp
    trim = num_segments * seg_len
    x, y = x[..., :trim], y[..., :trim]

    # robust scale per subject over the full recording (brennan :109-134)
    if pre.get("subject_wise", True):
        x = robust_scale(x, axis=-1)
    else:
        flat = x.transpose(1, 0, 2).reshape(C, -1)  # pool subjects
        flat = robust_scale(flat, axis=-1)
        x = flat.reshape(C, S, -1).transpose(1, 0, 2)
    if pre.get("clamp", True):
        x = jnp.clip(x, -float(pre.clamp_lim), float(pre.clamp_lim))

    # segment: (S, C, trim) → (num_segments, S, C, seg_len)
    Xc = x.reshape(S, C, num_segments, seg_len).transpose(2, 0, 1, 3)
    Yc = y.reshape(y.shape[0], num_segments, seg_len).transpose(1, 0, 2)

    # per-chunk baseline correction (brennan :136-142)
    baseline_len = int(seg_len * float(pre.baseline_len_sec) / float(pre.seq_len_sec))
    if baseline_len > 0:
        from meg_decoding_tpu.ops.scaling import baseline_correct

        Xc = baseline_correct(Xc, baseline_len)

    return BrennanPacked(Xc, Yc)
