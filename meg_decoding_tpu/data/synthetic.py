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

import os

import numpy as np

from meg_decoding_tpu.core.config import Config

__all__ = ["make_synthetic_gwilliams_cache"]


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
        sentence_idxs[task] = np.repeat(np.arange(words_per_task // 4),
                                        4)[:words_per_task]
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
