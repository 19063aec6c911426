"""Gwilliams2022 (MEG ↔ naturalistic speech) dataset: packed, device-resident.

Reference: ``meg_decoding/dataclass/gwilliams2022.py`` — BIDS MEG →
20-process preprocessing fan-out (filter 1-60 Hz, resample 1000→120 Hz,
word-onset extraction; :193-326) cached as ``x_dict.npy`` {subjectNN_sessS_taskT
→ (208, T)}, ``y_dict.npy`` {taskN → (1024, T)}, onset/sentence tables
(:64-109) → ``batchfy`` segments Y by word onsets and keeps X as full
recordings + onset indices (:391-638); ``__getitem__`` slices a 3 s window of
a **random subject-session** holding the segment's task (:130-143).

TPU-native redesign:
* The reference materializes every Y segment (~12 GB host RAM for ~8k
  overlapping 1024×360 windows).  Here **both X and Y stay continuous** in
  HBM ((sessions, 4, C, T) padded recordings ≈ 3-6 GB, (4, F, T) streams
  ≈ 0.7 GB) and a batch is one jitted gather: random session pick, dynamic
  window slice of X and Y, fused with the collate kernel — replacing
  DataLoader workers entirely.
* The preprocessing fan-out is sharded over the mesh by recordings
  (SURVEY §5.7): filtering/resampling is one vmapped XLA program.

The cache directory format stays compatible with the reference's
(``x_dict.npy`` / ``y_dict.npy`` / ``meg_onsets.npy`` / ``speech_onsets.npy``
/ ``sentence_idxs.npy`` — gwilliams2022.py:64-109), so caches built by either
implementation interoperate.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from meg_decoding_tpu.ops.fir import bandpass_filter
from meg_decoding_tpu.ops.resample import resample_fft

__all__ = ["GwilliamsPacked", "load_gwilliams_cache", "build_gwilliams_dataset",
           "preprocess_recordings", "sentence_split", "deep_split",
           "compute_collate_stats"]

NUM_TASKS = 4


# ---------------------------------------------------------------------------
# cache I/O (reference-compatible layout)
# ---------------------------------------------------------------------------

def load_gwilliams_cache(cache_dir: str):
    """Load the reference-format preprocessed cache dicts."""
    x = np.load(os.path.join(cache_dir, "x_dict.npy"), allow_pickle=True).item()
    y = np.load(os.path.join(cache_dir, "y_dict.npy"), allow_pickle=True).item()
    meg_onsets = np.load(os.path.join(cache_dir, "meg_onsets.npy"),
                         allow_pickle=True).item()
    speech_onsets = np.load(os.path.join(cache_dir, "speech_onsets.npy"),
                            allow_pickle=True).item()
    sentence_idxs = np.load(os.path.join(cache_dir, "sentence_idxs.npy"),
                            allow_pickle=True).item()
    return x, y, meg_onsets, speech_onsets, sentence_idxs


def parse_sessions(keys):
    """Session/subject bookkeeping from cache keys ``{subj}_{sess}_{task}``:
    sessions with all ``NUM_TASKS`` tasks present, and the sorted subject
    list.  Shared by ``build_gwilliams_dataset`` and metadata-only consumers
    (``cli/export_model.py``) that must not stage the recordings."""
    keys = sorted(keys)
    sess_names = sorted({"_".join(k.split("_")[:-1]) for k in keys})
    sess_names = [s for s in sess_names
                  if sum(1 for k in keys if k.startswith(s + "_")) == NUM_TASKS]
    subjects = sorted({s.split("_")[0] for s in sess_names})
    return sess_names, subjects


def preprocess_recordings(raw: np.ndarray, fs: float, l_freq: float,
                          h_freq: float, new_rate: float) -> np.ndarray:
    """Bandpass + resample a stack of recordings (..., C, T) on device — the
    XLA replacement for the reference's 20-process MNE pool
    (gwilliams2022.py:254-261, 299-306).  Shard the leading axis over the
    mesh for multi-chip preprocessing."""
    x = jnp.asarray(raw, dtype=jnp.float32)
    x = bandpass_filter(x, fs, l_freq, h_freq)
    return np.asarray(resample_fft(x, down=fs / new_rate))


# ---------------------------------------------------------------------------
# splits (host-side index logic; reference gwilliams2022.py:391-638)
# ---------------------------------------------------------------------------

def sentence_split(sentence_idxs: dict, split_ratio: float, seed: int = 0):
    """Sentence-granularity split: shuffle sentence ids per task, 80/20, map
    back to word indices (Gwilliams2022SentenceSplit, :425-451)."""
    rng = np.random.RandomState(seed)
    train_word_idxs, test_word_idxs = {}, {}
    for task, sidxs in sentence_idxs.items():
        uniq = np.unique(sidxs)
        rng.shuffle(uniq)
        split = int(len(uniq) * split_ratio)
        train_s = set(uniq[:split].tolist())
        words = np.arange(len(sidxs))
        is_train = np.asarray([s in train_s for s in sidxs])
        train_word_idxs[task] = words[is_train]
        test_word_idxs[task] = words[~is_train]
    return train_word_idxs, test_word_idxs


def drop_overlapping_words(word_idxs: dict, other_idxs: dict,
                           speech_onsets: dict, seq_len_sec: float):
    """Drop words whose segment window leaks into the *other* split.

    The reference leaves this as a TODO stub (gwilliams2022.py:691-698:
    "Word onsets that have less than 3 seconds until next sentence onset
    should be dropped so that they don't go across splits").  Implemented
    here: a word in this split is dropped when its ``seq_len_sec`` window
    reaches past the onset of any word belonging to the other split.
    """
    out = {}
    for task, widx in word_idxs.items():
        onsets = np.asarray(speech_onsets[task], float)
        other = np.sort(onsets[other_idxs[task]])
        if len(other) == 0:
            out[task] = widx
            continue
        keep = []
        for w in widx:
            # first other-split onset strictly after this word's onset
            j = np.searchsorted(other, onsets[w], side="right")
            if j >= len(other) or other[j] >= onsets[w] + seq_len_sec:
                keep.append(w)
        out[task] = np.asarray(keep, dtype=int)
    return out


def deep_split(speech_onsets: dict, split_ratio: float):
    """Temporal head/tail split per task (Gwilliams2022DeepSplit, :591-629)."""
    train_word_idxs, test_word_idxs = {}, {}
    for task, onsets in speech_onsets.items():
        n = len(onsets)
        cut = int(n * split_ratio)
        train_word_idxs[task] = np.arange(cut)
        test_word_idxs[task] = np.arange(cut, n)
    return train_word_idxs, test_word_idxs


# ---------------------------------------------------------------------------
# packed dataset
# ---------------------------------------------------------------------------

@dataclass
class GwilliamsPacked:
    """Device-resident packed Gwilliams dataset (one split).

    recordings: (n_sessions, 4, C, T_max) padded MEG at the brain rate,
      already shifted 150 ms (X side).
    y_stream:   (4, F, Ty_max) padded embedding streams (end-cropped).
    meg_onsets: (n_sessions, 4, W_max) int sample onsets (this split's words).
    speech_onsets: (4, W_max) int sample onsets into y_stream.
    n_words:    (4,) valid word counts per task for this split.
    session_subject: (n_sessions,) subject index of each session.
    seq_len: segment length in samples (360).
    """

    recordings: jnp.ndarray
    y_stream: jnp.ndarray
    meg_onsets: jnp.ndarray
    speech_onsets: jnp.ndarray
    n_words: np.ndarray
    session_subject: jnp.ndarray
    seq_len: int
    num_subjects: int
    _seg_table: np.ndarray | None = None  # lazily built, immutable per split

    def __len__(self):
        return int(self.n_words.sum())

    @property
    def host_resident(self) -> bool:
        return isinstance(self.recordings, np.ndarray)

    @property
    def task_offsets(self) -> np.ndarray:
        return np.concatenate([[0], np.cumsum(self.n_words)[:-1]])

    def segment_table(self):
        """(N, 2) rows (task, i_in_task) for global segment ids (cached —
        this sits on the per-batch gather hot path)."""
        if self._seg_table is None:
            rows = [np.stack([np.full(n, t), np.arange(n)], 1)
                    for t, n in enumerate(self.n_words)]
            object.__setattr__(self, "_seg_table", np.concatenate(rows, axis=0))
        return self._seg_table


@partial(jax.jit, static_argnames=("seq_len", "y_dtype"))
def _gather_batch(recordings, y_stream, meg_onsets, speech_onsets,
                  session_subject, task_ids, i_in_task, sess_ids, seq_len,
                  y_dtype=None):
    """One fused gather of (X, Y, subject) windows for a batch.

    Uses the Pallas scalar-prefetch DMA kernel
    (``ops/pallas/window_gather.py``): XLA lowers both vmapped
    ``dynamic_slice`` and advanced-indexing formulations of this
    data-dependent window gather to general gathers measuring 170-480 ms per
    64-batch on v5e; the DMA kernel does it in ~1 ms.

    ``y_dtype``: optional dtype the Y windows are cast to INSIDE the gather
    kernel (VMEM, before the HBM write-back) — bf16 training gathers Y at
    bf16 to halve its HBM round-trip (a documented numerics deviation of
    the bf16 path: Y is quantized once, ~0.4% relative, symmetric with the
    bf16 model output Z — PARITY.md deviation 15).  X always stays f32 —
    the collate chain's RobustScaler must see the exact recorded values."""
    from meg_decoding_tpu.ops.pallas.window_gather import window_gather

    S, NT, C, T = recordings.shape
    rec_flat = recordings.reshape(S * NT, C, T)
    rec_ids = sess_ids * NT + task_ids

    x_onsets = meg_onsets[sess_ids, task_ids, i_in_task]        # (B,)
    X = window_gather(rec_flat, rec_ids, x_onsets, seq_len)     # (B, C, L)

    y_onsets = speech_onsets[task_ids, i_in_task]
    Y = window_gather(y_stream, task_ids, y_onsets, seq_len,
                      out_dtype=y_dtype)                        # (B, F, L)

    return X, Y, session_subject[sess_ids]


def stats_lane_pad(C: int) -> int:
    """Per-stat row width in the collate-stats table: C rounded up to the
    TPU lane multiple (128) — see ``_stats_sweep`` for why."""
    return -(-C // 128) * 128


def _stats_sweep(recordings, meg_onsets, seq_len: int,
                 baseline_len_samp: int, impl: str = "sort",
                 chunk: int = 512):
    """Sweep EVERY (session, task, word) window once and return its collate
    stats as a FLAT row table (ceil(S·NT·W / chunk)·chunk, 2·Cp) with
    Cp = C rounded up to a lane multiple (128): row ``(s·NT + t)·W + w``
    holds [:C] = median, [Cp:Cp+C] = IQR of that window, baseline-corrected,
    exactly as ``robust_stats`` computes them inside the inline collate.
    Chunk-padded tail rows and the [C:Cp] lane padding are garbage, never
    gathered.

    Every aspect of the shape is load-bearing (traced,
    tools/trace_step.py r3, + layout probes):

    * med/iqr CONCATENATED along the minor dim — a trailing dim of 2 forces
      a (2, 128) tiling whose gather relayout-copies the whole table EVERY
      step (2.9 ms at full scale);
    * each half padded to the 128-lane multiple — XLA picks entry layouts
      minimizing tile padding, so a non-multiple minor dim (e.g. 2C=416 <
      512) makes it emit the table COLUMN-major (rows divide 128 ⇒ zero
      padding that way) and the consuming step pays a 2.5 ms relayout
      before its row gather; at a lane-multiple width row-major has zero
      padding too and wins the tie;
    * the chunk padding is kept — slicing [:total] after the scan hands the
      result layout back to the compiler.

    Pinning the layout explicitly instead does not survive this rig:
    ``out_shardings=Format(Layout(...))`` executables die with
    INVALID_ARGUMENT whenever reloaded from the persistent compile cache
    (axon relay limitation; fresh compiles work), and a trailing Pallas
    identity gets a transpose inserted right after it.

    Pure and jittable: the caller jits it directly (single device) or wraps
    it in ``shard_map`` over the session axis (each device sweeps its own
    recordings shard).  The sweep runs as a ``lax.scan`` over window chunks
    so one executable covers any dataset size; padded grid entries (words
    beyond ``n_words``, chunk padding) compute harmless garbage that is
    never gathered at train time (a zero-padded window has IQR 0 → the
    sklearn fallback scale of 1.0, so not even a NaN exists in the table).
    """
    from meg_decoding_tpu.ops.pallas.window_gather import window_gather
    from meg_decoding_tpu.ops.scaling import baseline_correct, robust_stats

    S, NT, C, T = recordings.shape
    W = meg_onsets.shape[-1]
    Cp = stats_lane_pad(C)
    rec_flat = recordings.reshape(S * NT, C, T)
    total = S * NT * W
    n_chunks = -(-total // chunk)
    pad = n_chunks * chunk - total
    onsets = jnp.pad(meg_onsets.reshape(total), (0, pad))
    rec_ids = jnp.pad(
        jnp.repeat(jnp.arange(S * NT, dtype=jnp.int32), W), (0, pad))

    def body(_, args):
        ons, ids = args
        X = window_gather(rec_flat, ids, ons, seq_len)
        if baseline_len_samp > 0:
            X = baseline_correct(X, baseline_len_samp)
        med, iqr = robust_stats(X, axis=-1, impl=impl)
        return None, jnp.concatenate(
            [jnp.pad(med, ((0, 0), (0, Cp - C))),
             jnp.pad(iqr, ((0, 0), (0, Cp - C)))], axis=-1)  # (chunk, 2Cp)

    _, stats = jax.lax.scan(
        body, None,
        (onsets.reshape(n_chunks, chunk), rec_ids.reshape(n_chunks, chunk)))
    return stats.reshape(n_chunks * chunk, 2 * Cp)


def compute_collate_stats(ds: GwilliamsPacked, baseline_len_samp: int,
                          impl: str = "sort", chunk: int = 512, mesh=None):
    """Precompute the epoch-invariant RobustScaler fits for every possible
    batch window of a packed split → flat (≥S·NT·W, 2·Cp) device table,
    Cp = ``stats_lane_pad(C)`` (row ``(s·NT + t)·W + w``; [:, :C] median,
    [:, Cp:Cp+C] IQR; chunk-padded tail rows and lane padding unused — the
    flat 2-D lane-aligned shape keeps both the sweep output and the
    per-step row gather layout-clean; see ``_stats_sweep``).

    A Gwilliams batch row is a (session, task, word) window whose collate
    stats (median/IQR of the baseline-corrected window) never change across
    epochs, yet the inline collate re-sorts (B, C, T) every step — the
    costliest non-matmul op in the traced step (~5.3 ms at B=256 bf16,
    tools/trace_step.py).  The reference pays the same redundancy on the
    host: sklearn ``RobustScaler`` is refit per batch
    (``gwilliams2022.py:654-662``).  One ~O(dataset · sessions) sweep at
    trainer start amortizes it away; the train step then gathers (B, 2·Cp)
    rows and applies the same elementwise transform (ulp-exact)
    (``ops/scaling.py collate_preprocess_cached``).

    With ``mesh``, ``ds`` must already be session-sharded
    (``shard_gwilliams_splits``) and the sweep runs inside ``shard_map`` —
    each device fits its own session shard's windows; the returned table is
    sharded over rows, each device holding its own sessions' (S_local·NT·W,
    2·Cp) block (row indices are per-shard, matching the local session draw in
    ``local_shard_gather``).

    HBM cost: S·NT·W·2·Cp f32 with Cp = stats_lane_pad(C) — ~0.86 GB at
    full Gwilliams scale (54 sessions × ~8k words, Cp=256 for C=208; the
    128-lane padding costs ~40% over the tight 2·C layout but keeps the
    table row-major, see ``_stats_sweep``), vs the 9.3 GB recordings it
    sits next to.  Sweep cost ≈ gathering + sorting the whole grid once
    (~10 s at full scale) — repaid in the first ~2 epochs at updates=1200.
    """
    seq_len = int(ds.seq_len)
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        fn = jax.jit(jax.shard_map(
            partial(_stats_sweep, seq_len=seq_len,
                    baseline_len_samp=baseline_len_samp, impl=impl,
                    chunk=chunk),
            mesh=mesh,
            in_specs=(P("data", None, None, None), P("data", None, None)),
            out_specs=P("data", None),
            check_vma=False,
        ))
        return fn(ds.recordings, ds.meg_onsets)
    fn = jax.jit(partial(_stats_sweep, seq_len=seq_len,
                         baseline_len_samp=baseline_len_samp, impl=impl,
                         chunk=chunk))
    return fn(jnp.asarray(ds.recordings), jnp.asarray(ds.meg_onsets))


def pad_sessions(ds: GwilliamsPacked, multiple: int) -> GwilliamsPacked:
    """Pad the sessions axis to a multiple of ``multiple`` by cyclically
    repeating sessions, so recordings can be sharded evenly over the mesh's
    data axis.

    Known deviation (PARITY.md): a repeated session appears twice in the
    random subject-session pairing pool, so its pairing probability is
    2/S_pad instead of 1/S (e.g. 2/56 vs 1/54 at full Gwilliams scale on 8
    chips) — the pairing is a training-time augmentation
    (gwilliams2022.py:134), not a labeled quantity, so this only perturbs
    sampling weights slightly.
    """
    S = int(ds.recordings.shape[0])
    pad = (-S) % multiple
    if pad == 0:
        return ds
    extra = np.arange(pad) % S
    take = np.concatenate([np.arange(S), extra])
    # preserve residence: a host dataset pads in numpy (the multi-chip
    # sharding path pads on host so the padded copy never has to fit one
    # chip — see train/scan_loop._shard_gwilliams); a device dataset
    # round-trips (one-time, at trainer start)
    wrap = np.asarray if ds.host_resident else jnp.asarray
    return GwilliamsPacked(
        recordings=wrap(np.asarray(ds.recordings)[take]),
        y_stream=ds.y_stream,
        meg_onsets=wrap(np.asarray(ds.meg_onsets)[take]),
        speech_onsets=ds.speech_onsets,
        n_words=ds.n_words,
        session_subject=wrap(np.asarray(ds.session_subject)[take]),
        seq_len=ds.seq_len,
        num_subjects=ds.num_subjects,
    )


def local_shard_gather(idx_local, key, rec_local, meg_onsets_local, y_stream,
                       speech_onsets, session_subject, seg_table,
                       seq_len: int, axis_name: str = "data", y_dtype=None,
                       stats_local=None):
    """Per-device half of the sharded batch gather, for use inside
    ``shard_map``: recordings/meg_onsets are sharded over sessions (axis 0),
    everything else replicated.

    ``stats_local`` (optional, flat (≥S_local·NT·W, 2·Cp) rows): this
    device's shard of the precomputed collate-stats table
    (``compute_collate_stats`` with a mesh); when given, the matching
    (B_local, 2·Cp) stats rows are returned as a fourth output for
    ``collate_preprocess_cached``.

    Each device pairs its ``B_local`` segments with sessions drawn uniformly
    from ITS OWN session shard (key folded with the device index).  With
    equal shards the session marginal stays uniform over all sessions, so
    the sampling distribution matches the unsharded
    ``gather_speech_batch`` (reference ``__getitem__`` pairing,
    gwilliams2022.py:134) exactly.
    """
    from meg_decoding_tpu.ops.pallas.window_gather import window_gather

    d = jax.lax.axis_index(axis_name)
    S_local, NT, C, T = rec_local.shape
    rows = seg_table[idx_local]
    task_ids, i_in_task = rows[:, 0], rows[:, 1]
    k = jax.random.fold_in(key, d)
    sess_local = jax.random.randint(k, (idx_local.shape[0],), 0, S_local)

    rec_flat = rec_local.reshape(S_local * NT, C, T)
    rec_ids = sess_local * NT + task_ids
    x_onsets = meg_onsets_local[sess_local, task_ids, i_in_task]
    X = window_gather(rec_flat, rec_ids, x_onsets, seq_len)

    y_onsets = speech_onsets[task_ids, i_in_task]
    Y = window_gather(y_stream, task_ids, y_onsets, seq_len,
                      out_dtype=y_dtype)

    subs = session_subject[d * S_local + sess_local]
    if stats_local is not None:
        W = meg_onsets_local.shape[-1]
        return X, Y, subs, stats_local[rec_ids * W + i_in_task]
    return X, Y, subs


def device_major_sessions(key, n_dev: int, n_sessions: int, batch: int):
    """The session draw a ``local_shard_gather`` over ``n_dev`` devices
    would produce, computed WITHOUT a mesh: per device ``d``, fold ``key``
    with ``d`` and draw ``batch/n_dev`` sessions from that device's
    ``pad_sessions(n_dev)``-padded shard, then map padded ids back to the
    unpadded sessions they alias.  Lets a host-resident (spilled) dataset
    replay bit-identical batches to a session-sharded device run — the
    spill path stays a drop-in for the HBM path under a mesh."""
    S_pad = -(-n_sessions // n_dev) * n_dev
    S_local = S_pad // n_dev
    b_local = batch // n_dev
    parts = []
    for d in range(n_dev):
        kd = jax.random.fold_in(key, d)
        parts.append(d * S_local
                     + jax.random.randint(kd, (b_local,), 0, S_local))
    padded = np.concatenate([np.asarray(p) for p in parts])
    # pad_sessions repeats sessions cyclically: padded id p >= S aliases
    # session (p - S) % S
    return np.where(padded < n_sessions, padded,
                    (padded - n_sessions) % n_sessions)


def gather_speech_batch(ds: GwilliamsPacked, segment_ids: np.ndarray, key,
                        device_major: int | None = None):
    """Batch = segments by global id + a random session each (reproducing
    ``__getitem__``'s random subject-session pairing, :130-143).

    On a host-resident dataset (``to_host``) the windows are numpy slices
    with the SAME ``jax.random`` session draw — batches are bit-identical
    to the device path; only the transfer strategy differs.

    ``device_major``: draw sessions as an ``n``-device session-sharded
    gather would (``device_major_sessions``), so a host-resident run under
    a data-parallel mesh logs exactly what the device-resident sharded run
    logs (requires ``len(segment_ids) % n == 0``; the trainer's loader
    falls back to the global draw otherwise)."""
    seg = ds.segment_table()[np.asarray(segment_ids)]
    n_sessions = ds.recordings.shape[0]
    if device_major is not None and len(seg) % device_major == 0:
        sess_ids = device_major_sessions(key, device_major, n_sessions,
                                         len(seg))
    else:
        sess_ids = jax.random.randint(key, (len(seg),), 0, n_sessions)
    if isinstance(ds.recordings, np.ndarray):  # host spill path
        X, Y, subs = _gather_batch_host(ds, seg[:, 0], seg[:, 1],
                                        np.asarray(sess_ids))
        return X, Y, subs, np.asarray(segment_ids)
    X, Y, subs = _gather_batch(
        ds.recordings, ds.y_stream, ds.meg_onsets, ds.speech_onsets,
        ds.session_subject, jnp.asarray(seg[:, 0]), jnp.asarray(seg[:, 1]),
        sess_ids, ds.seq_len,
    )
    return X, Y, subs, jnp.asarray(segment_ids)


def to_host(ds: GwilliamsPacked, buffer_cache: dict | None = None) -> GwilliamsPacked:
    """Spill the packed arrays to host RAM (numpy): the flagship-dataset
    variant of ``PackedDataset.to_host`` for deployments whose recordings
    exceed HBM.  Batches are then sliced on host (``gather_speech_batch``
    detects the numpy arrays) and streamed through the prefetch pipeline
    (``data/prefetch.py``; ``host_resident: true`` + ``prefetch: N`` on the
    speech trainer).

    ``buffer_cache`` (optional ``id(device buffer) → host array`` dict):
    pass the SAME dict when spilling two packs that alias device buffers
    (sentence/deep splits share recordings/y_stream across distinct objects,
    ``build_gwilliams_dataset``) so each ~GB buffer is pulled device→host
    once and the host copy stays shared.  Keep every source pack referenced
    until all spills through one cache are done — the keys are ``id()``s of
    the live device buffers."""
    import dataclasses

    cache = {} if buffer_cache is None else buffer_cache

    def pull(a):
        if isinstance(a, np.ndarray):
            return a
        k = id(a)
        if k not in cache:
            cache[k] = np.asarray(a)
        return cache[k]

    return dataclasses.replace(
        ds,
        recordings=pull(ds.recordings),
        y_stream=pull(ds.y_stream),
        meg_onsets=pull(ds.meg_onsets),
        speech_onsets=pull(ds.speech_onsets),
        session_subject=pull(ds.session_subject),
    )


def _gather_batch_host(ds: GwilliamsPacked, task_ids, i_in_task, sess_ids):
    """Numpy twin of ``_gather_batch`` for host-resident datasets: same
    windows, same onset clamping, pure host slices (the device copy happens
    downstream in the prefetch pipeline)."""
    L = int(ds.seq_len)
    T = ds.recordings.shape[-1]
    x_onsets = np.clip(ds.meg_onsets[sess_ids, task_ids, i_in_task], 0, T - L)
    Ty = ds.y_stream.shape[-1]
    y_onsets = np.clip(ds.speech_onsets[task_ids, i_in_task], 0, Ty - L)
    X = np.stack([ds.recordings[s, t, :, o:o + L]
                  for s, t, o in zip(sess_ids, task_ids, x_onsets)])
    Y = np.stack([ds.y_stream[t, :, o:o + L]
                  for t, o in zip(task_ids, y_onsets)])
    return X, Y, ds.session_subject[sess_ids]


def build_gwilliams_dataset(cfg, x_dict: dict, y_dict: dict, meg_onsets: dict,
                            speech_onsets: dict, sentence_idxs: dict,
                            split_mode: str = "shallow", seed: int = 0):
    """Pack the cache dicts into device arrays; returns (train, test) for
    sentence/deep splits or a single packed dataset for shallow.

    Sessions with missing tasks are dropped (gwilliams2022.py:183-191);
    recordings are zero-padded to the longest (ragged → static shapes,
    SURVEY §7 hard-part 6).
    """
    pre = cfg.preprocs
    rate = float(pre.brain_resample_rate)
    seq_len = int(rate * float(pre.seq_len_sec))
    shift = int(rate * float(pre.get("shift_len", 150)) / 1000) \
        if pre.get("shift_brain", True) else 0

    # --- session bookkeeping ------------------------------------------------
    sess_names, subjects = parse_sessions(x_dict.keys())
    subject_of = {s: subjects.index(s.split("_")[0]) for s in sess_names}

    n_sessions = len(sess_names)
    tasks = [f"task{t}" for t in range(NUM_TASKS)]
    C = next(iter(x_dict.values())).shape[0]
    F = next(iter(y_dict.values())).shape[0]
    # pad the time axes so the Pallas gather's lane-aligned overfetch stays
    # in bounds (ops/pallas/window_gather.py)
    from meg_decoding_tpu.ops.pallas.window_gather import pad_time_for_gather

    T_max = pad_time_for_gather(
        max(v.shape[1] for v in x_dict.values()) - shift, seq_len)
    Ty_max = pad_time_for_gather(
        max(v.shape[1] for v in y_dict.values()) - shift, seq_len)

    recordings = np.zeros((n_sessions, NUM_TASKS, C, T_max), dtype=np.float32)
    for si, sname in enumerate(sess_names):
        for t, task in enumerate(tasks):
            v = x_dict[f"{sname}_{task}"][:, shift:]  # X shifted forward
            recordings[si, t, :, : v.shape[1]] = v
    y_stream = np.zeros((NUM_TASKS, F, Ty_max), dtype=np.float32)
    for t, task in enumerate(tasks):
        v = y_dict[task]
        v = v[:, : v.shape[1] - shift] if shift else v  # Y end-cropped
        y_stream[t, :, : v.shape[1]] = v

    def word_onsets_samples(d):  # seconds → sample indices (·rate, round)
        return {k: np.round(np.asarray(v) * rate).astype(int) for k, v in d.items()}

    meg_on = word_onsets_samples(meg_onsets)
    sp_on = word_onsets_samples(speech_onsets)

    # --- split word indices -------------------------------------------------
    if split_mode == "sentence":
        tr_idx, te_idx = sentence_split(sentence_idxs, float(cfg.split_ratio), seed)
        if cfg.get("drop_overlapping", False):
            seq_sec = float(pre.seq_len_sec)
            tr_idx = drop_overlapping_words(tr_idx, te_idx, speech_onsets,
                                            seq_sec)
            te_idx = drop_overlapping_words(te_idx, tr_idx, speech_onsets,
                                            seq_sec)
        splits = [tr_idx, te_idx]
    elif split_mode == "deep":
        tr_idx, te_idx = deep_split(speech_onsets, float(cfg.split_ratio))
        splits = [tr_idx, te_idx]
    else:  # shallow: no split here (random_split over segments happens later)
        splits = [{t: np.arange(len(sp_on[t])) for t in tasks}]

    # the splits differ ONLY in their onset tables — recordings / y_stream /
    # session_subject are uploaded ONCE and aliased by every split, so the
    # sentence/deep builds hold ONE ~9.3 GB device copy, not one per split
    # (2×9.34 GB would not fit a 16 GB v5e at full Gwilliams scale)
    recordings_dev = jnp.asarray(recordings)
    y_stream_dev = jnp.asarray(y_stream)
    session_subject_dev = jnp.asarray([subject_of[s] for s in sess_names])

    out = []
    for word_idxs in splits:
        n_words = np.asarray([len(word_idxs[t]) for t in tasks])
        W_max = max(int(n_words.max()), 1)
        mo = np.zeros((n_sessions, NUM_TASKS, W_max), dtype=np.int32)
        so = np.zeros((NUM_TASKS, W_max), dtype=np.int32)
        for t, task in enumerate(tasks):
            widx = word_idxs[task]
            so[t, : len(widx)] = sp_on[task][widx]
            for si, sname in enumerate(sess_names):
                ons = meg_on[f"{sname}_{task}"][widx]
                mo[si, t, : len(widx)] = ons
        out.append(GwilliamsPacked(
            recordings=recordings_dev,
            y_stream=y_stream_dev,
            meg_onsets=jnp.asarray(mo),
            speech_onsets=jnp.asarray(so),
            n_words=n_words,
            session_subject=session_subject_dev,
            seq_len=seq_len,
            num_subjects=len(subjects),
        ))
    return tuple(out) if len(out) > 1 else out[0]
