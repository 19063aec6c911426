"""Whole-epoch training as ONE jitted ``lax.scan`` — zero host dispatch.

The classic loop (``train/loop.py``) dispatches one jitted step per batch;
at ~0.7 ms/step the Python dispatch and host↔device metric sync become a
real fraction of the epoch.  Here the entire epoch — index sampling, batch
gather from the device-resident dataset, collate, forward/backward, Adam
update, metric accumulation — runs inside a single XLA program.  The host
sees one call per epoch and gets back averaged metrics.

No reference analog (the reference feeds batches through DataLoader worker
processes); this is the fully TPU-native epoch the packed-dataset design
enables.  Works for PackedDataset-style (X, Y, subject_idxs) data; the
Gwilliams gather (random session + window slice) composes the same way via
``make_gwilliams_scan_epoch``.

Opt-in (``use_scan_epochs: true``): scan programs at full model scale are
large compiles; certain remote-compile setups (e.g. this repo's CI relay)
can't build them, while the per-step driver always works.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from meg_decoding_tpu.data.gwilliams import GwilliamsPacked, _gather_batch
from meg_decoding_tpu.train.steps import CollateConfig, LossConfig

__all__ = ["make_scan_epoch", "make_gwilliams_scan_epoch"]


def _build_epoch(step_fn, gather_fn, updates: int, batch_size: int, n: int):
    """Common scaffold: sample (updates, B) indices, scan step_fn over them."""

    def epoch(state, key):
        ikey, key = jax.random.split(key)
        idx = jax.random.randint(ikey, (updates, batch_size), 0, n)

        def body(state, args):
            i, subkey = args
            batch = gather_fn(i, subkey)
            state, metrics = step_fn(state, *batch)
            return state, metrics

        subkeys = jax.random.split(key, updates)
        state, metrics = jax.lax.scan(body, state, (idx, subkeys))
        return state, jax.tree_util.tree_map(lambda m: jnp.mean(m, axis=0), metrics)

    return jax.jit(epoch, donate_argnums=(0,))


def make_scan_epoch(model, optimizer, loss_cfg: LossConfig,
                    collate_cfg: CollateConfig, dataset,
                    updates: int, batch_size: int):
    """Scan-epoch over a PackedDataset held in HBM (GOD / Brennan-style)."""
    from meg_decoding_tpu.train.steps import make_train_step

    # reuse the un-jitted step logic by rebuilding it here (donate handled
    # at the epoch level, so the inner step stays a plain function)
    step_jit = make_train_step(model, optimizer, loss_cfg, collate_cfg,
                               donate=False)
    # the jitted step works inside scan too (jit-of-jit is free inlining)
    X, Y, subs = dataset.X, dataset.Y, dataset.subject_idxs

    def gather(i, _key):
        return X[i], Y[i], subs[i]

    return _build_epoch(step_jit, gather, updates, batch_size, int(X.shape[0]))


def make_gwilliams_scan_epoch(model, optimizer, loss_cfg: LossConfig,
                              collate_cfg: CollateConfig, ds: GwilliamsPacked,
                              updates: int, batch_size: int):
    """Scan-epoch over the packed Gwilliams dataset: the random
    subject-session pairing and window gather run inside the scan."""
    import numpy as np

    from meg_decoding_tpu.train.steps import make_train_step

    step_jit = make_train_step(model, optimizer, loss_cfg, collate_cfg,
                               donate=False)
    seg = jnp.asarray(ds.segment_table())  # (N, 2): task, i_in_task
    n_sessions = int(ds.recordings.shape[0])
    recordings, y_stream = ds.recordings, ds.y_stream
    meg_onsets, speech_onsets = ds.meg_onsets, ds.speech_onsets
    session_subject, seq_len = ds.session_subject, ds.seq_len

    def gather(i, key):
        rows = seg[i]  # (B, 2)
        sess = jax.random.randint(key, (i.shape[0],), 0, n_sessions)
        X, Y, subs = _gather_batch(
            recordings, y_stream, meg_onsets, speech_onsets, session_subject,
            rows[:, 0], rows[:, 1], sess, seq_len,
        )
        return X, Y, subs

    return _build_epoch(step_jit, gather, updates, batch_size, int(len(ds)))
