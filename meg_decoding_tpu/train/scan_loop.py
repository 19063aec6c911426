"""Whole-epoch training as ONE jitted ``lax.scan`` — zero host dispatch.

The classic loop (``train/loop.py``) dispatches one jitted step per batch;
at millisecond step times the Python dispatch and host↔device metric sync
become a real fraction of the epoch.  Here the entire epoch — index
sampling, batch gather from the device-resident dataset, collate,
forward/backward, Adam update, metric accumulation — runs inside a single
XLA program.  The host sees one call per epoch and gets back averaged
metrics.

IMPORTANT implementation constraint: dataset arrays are passed as jit
ARGUMENTS, never closed over — a closed-over ``jnp`` array is baked into the
program as a constant, shipping the whole dataset to the compiler (a
remote-compile relay rejects such multi-hundred-MB programs outright).

No reference analog (the reference feeds batches through DataLoader worker
processes); this is the fully TPU-native epoch the packed-dataset design
enables.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from meg_decoding_tpu.data.gwilliams import GwilliamsPacked, _gather_batch
from meg_decoding_tpu.train.steps import CollateConfig, LossConfig

__all__ = ["make_scan_epoch", "make_gwilliams_scan_epoch", "make_fused_speech_step"]


def make_fused_speech_step(model, optimizer, loss_cfg: LossConfig,
                           collate_cfg: CollateConfig, ds: GwilliamsPacked):
    """Single-dispatch Gwilliams step: the window gather (Pallas DMA kernel)
    and the train step compile into ONE XLA program — saves the per-call
    dispatch round-trip between the two (~2.4 ms on this rig).

    Returns ``fused(state, seg_rows (B,2), key) → (state, metrics)``.
    """
    from meg_decoding_tpu.train.steps import make_train_step

    step = make_train_step(model, optimizer, loss_cfg, collate_cfg, donate=False)
    n_sessions = int(ds.recordings.shape[0])
    seq_len = int(ds.seq_len)
    seg_table = jnp.asarray(ds.segment_table())

    @partial(jax.jit, donate_argnums=(0,))
    def _fused(state, idx, key, seg_table, recordings, y_stream, meg_onsets,
               speech_onsets, session_subject):
        seg_rows = seg_table[idx]  # indexed inside the single program
        sess = jax.random.randint(key, (idx.shape[0],), 0, n_sessions)
        X, Y, subs = _gather_batch(
            recordings, y_stream, meg_onsets, speech_onsets, session_subject,
            seg_rows[:, 0], seg_rows[:, 1], sess, seq_len,
        )
        return step(state, X, Y, subs)

    def fused(state, idx, key):
        """idx: (B,) global segment ids (host or device ints)."""
        return _fused(state, jnp.asarray(idx), key, seg_table, ds.recordings,
                      ds.y_stream, ds.meg_onsets, ds.speech_onsets,
                      ds.session_subject)

    return fused


def _build_epoch(step_fn, gather_fn, updates: int, batch_size: int, n: int,
                 data_args: tuple):
    """Common scaffold: sample (updates, B) indices, scan step_fn over them.
    ``data_args`` (dataset arrays) are jit arguments — see module docstring."""

    @partial(jax.jit, donate_argnums=(0,))
    def epoch(state, key, *data):
        ikey, key = jax.random.split(key)
        idx = jax.random.randint(ikey, (updates, batch_size), 0, n)

        def body(state, args):
            i, subkey = args
            batch = gather_fn(i, subkey, *data)
            state, metrics = step_fn(state, *batch)
            return state, metrics

        subkeys = jax.random.split(key, updates)
        state, metrics = jax.lax.scan(body, state, (idx, subkeys))
        return state, jax.tree_util.tree_map(lambda m: jnp.mean(m, axis=0), metrics)

    return lambda state, key: epoch(state, key, *data_args)


def make_scan_epoch(model, optimizer, loss_cfg: LossConfig,
                    collate_cfg: CollateConfig, dataset,
                    updates: int, batch_size: int):
    """Scan-epoch over a PackedDataset held in HBM (GOD / Brennan-style)."""
    from meg_decoding_tpu.train.steps import make_train_step

    step_jit = make_train_step(model, optimizer, loss_cfg, collate_cfg,
                               donate=False)

    def gather(i, _key, X, Y, subs):
        return X[i], Y[i], subs[i]

    return _build_epoch(step_jit, gather, updates, batch_size,
                        int(dataset.X.shape[0]),
                        (dataset.X, dataset.Y, dataset.subject_idxs))


def make_gwilliams_scan_epoch(model, optimizer, loss_cfg: LossConfig,
                              collate_cfg: CollateConfig, ds: GwilliamsPacked,
                              updates: int, batch_size: int):
    """Scan-epoch over the packed Gwilliams dataset: the random
    subject-session pairing and window gather run inside the scan."""
    from meg_decoding_tpu.train.steps import make_train_step

    step_jit = make_train_step(model, optimizer, loss_cfg, collate_cfg,
                               donate=False)
    seg = jnp.asarray(ds.segment_table())  # (N, 2): task, i_in_task
    n_sessions = int(ds.recordings.shape[0])
    seq_len = int(ds.seq_len)

    def gather(i, key, seg_table, recordings, y_stream, meg_onsets,
               speech_onsets, session_subject):
        rows = seg_table[i]  # (B, 2)
        sess = jax.random.randint(key, (i.shape[0],), 0, n_sessions)
        return _gather_batch(
            recordings, y_stream, meg_onsets, speech_onsets, session_subject,
            rows[:, 0], rows[:, 1], sess, seq_len,
        )

    return _build_epoch(step_jit, gather, updates, batch_size, int(len(ds)),
                        (seg, ds.recordings, ds.y_stream, ds.meg_onsets,
                         ds.speech_onsets, ds.session_subject))
