"""Speech-decoding trainer: Gwilliams2022 (MEG) and Brennan2018 (EEG).

Reference: ``train.py`` — builds the dataset per ``split_mode``
(sentence/shallow/deep, :57-90), per-batch Adam updates, single-batch test
pass, model_last each epoch.  The north-star metric is top-10 segment
retrieval on Gwilliams2022 (BASELINE.md).

Data sources, in order of preference:
1. reference-format preprocessed cache (``data/Gwilliams2022/preprocessed/<n>/``
   with x_dict/y_dict/onset .npy — interoperable with caches built by the
   reference; ``cfg.cache_dir`` points at it directly);
2. raw BIDS via mne_bids when installed (not in this image);
3. for Brennan: raw .mat EEG + audio .wav → wav2vec embeddings on device.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from meg_decoding_tpu.core.config import Config
from meg_decoding_tpu.data.brennan import build_brennan_dataset
from meg_decoding_tpu.data.gwilliams import (
    GwilliamsPacked,
    build_gwilliams_dataset,
    gather_speech_batch,
    load_gwilliams_cache,
)
from meg_decoding_tpu.data.layout import ch_locations_2d
from meg_decoding_tpu.data.sampling import random_split
from meg_decoding_tpu.models.factory import get_model
from meg_decoding_tpu.parallel.dp import maybe_distributed_init, setup_data_parallel
from meg_decoding_tpu.train.checkpoint import CheckpointManager
from meg_decoding_tpu.train.loop import fit
from meg_decoding_tpu.train.schedules import make_optimizer
from meg_decoding_tpu.train.state import create_train_state
from meg_decoding_tpu.train.steps import (
    CollateConfig,
    LossConfig,
    make_eval_step,
    make_train_step,
)
from meg_decoding_tpu.utils.logging import RunLogger

__all__ = ["run"]


class _SpeechLoader:
    """Adapter giving GwilliamsPacked/BrennanPacked the ``gather(idx)``
    interface the epoch driver expects, with deterministic per-call PRNG for
    the random subject/session pairing (reference gwilliams2022.py:134,
    brennan2018.py:148).

    ``stochastic = True`` tells the epoch driver to pass an explicit ``key``
    derived from (seed, epoch, step) so a resumed run replays exactly the
    batches a continuous run would have; the in-process call counter is only
    a fallback for direct/interactive calls."""

    stochastic = True

    def __init__(self, ds, seed: int = 0):
        self.ds = ds
        self.base_key = jax.random.PRNGKey(seed)
        self._n_calls = 0
        self.num_subjects = ds.num_subjects
        # set by run() after shard_gwilliams_splits: eval/direct gathers from
        # a session-sharded dataset must run per shard (see _gather_sharded)
        self.mesh = None
        self._sharded_gather = None
        self._seg_table_dev = None

    @property
    def host_resident(self) -> bool:
        # host-resident packed arrays → the epoch driver streams batches
        # through the prefetch pipeline (train/loop.py)
        return bool(getattr(self.ds, "host_resident", False))

    def __len__(self):
        return len(self.ds)

    def gather(self, idx, key=None):
        if key is None:
            key = jax.random.fold_in(self.base_key, self._n_calls)
            self._n_calls += 1
        if isinstance(self.ds, GwilliamsPacked):
            if self.mesh is not None:
                n_dev = self.mesh.shape["data"]
                # a non-divisible batch (tiny test pool / direct call) is
                # padded cyclically to the next multiple and trimmed after:
                # falling back to a plain gather on the session-sharded
                # recordings would transiently all-gather the full ~9.3 GB
                # pack onto every chip (see _gather_sharded)
                n = len(idx)
                pad = (-n) % n_dev
                idx_p = (np.resize(np.asarray(idx), n + pad) if pad
                         else np.asarray(idx))
                if self.ds.host_resident:
                    # spilled data can't be gathered in shard_map, but the
                    # session draw still emulates the sharded device run's
                    # (device_major_sessions) so a spill run logs exactly
                    # what the HBM run logs
                    X, Y, subs, _ = gather_speech_batch(self.ds, idx_p, key,
                                                        device_major=n_dev)
                else:
                    X, Y, subs = self._gather_sharded(idx_p, key)
                return (X[:n], Y[:n], subs[:n]) if pad else (X, Y, subs)
            X, Y, subs, seg_ids = gather_speech_batch(self.ds, idx, key)
            return X, Y, subs
        # Brennan: random subject per chunk
        subs = jax.random.randint(key, (len(idx),), 0, self.ds.num_subjects)
        X, Y, subs, _ = self.ds.gather(idx, subject_idxs=subs)
        return X, Y, subs

    def _gather_sharded(self, idx, key):
        """Gather from a session-sharded dataset per shard (shard_map): the
        Pallas window-gather custom call has no GSPMD partitioning rule, so
        a plain jit on sharded operands would all-gather the FULL padded
        recordings onto every chip first (a transient ~9.3 GB unsharded
        copy at full Gwilliams scale) — exactly what session sharding
        exists to avoid.  Sessions are drawn per device from its own shard
        (distribution-identical with equal shards; PARITY.md deviation 11),
        matching the fused/scan train paths.  Batch size must divide the
        data-axis size — ``gather`` pads non-divisible index sets
        cyclically and trims the result, so no caller ever reaches the
        replicating plain-jit gather on sharded recordings."""
        if self._sharded_gather is None:
            from meg_decoding_tpu.train.scan_loop import _make_sharded_gather

            self._sharded_gather = jax.jit(
                _make_sharded_gather(self.mesh, int(self.ds.seq_len)))
            self._seg_table_dev = jnp.asarray(self.ds.segment_table())
        X, Y, subs = self._sharded_gather(
            jnp.asarray(np.asarray(idx)), key, self._seg_table_dev,
            self.ds.recordings, self.ds.meg_onsets, self.ds.y_stream,
            self.ds.speech_onsets, self.ds.session_subject)
        return X, Y, subs


def find_gwilliams_cache(cfg) -> str:
    """Locate the reference-format preprocessed cache: ``cfg.cache_dir`` if
    set, else the first dir under ``{root_dir}/data/Gwilliams2022/preprocessed``
    holding an ``x_dict.npy`` (reference ``gwilliams2022.py:64-76`` numbers
    the cache dirs the same way).  Records the discovery on ``cfg.cache_dir``
    so ``ch_locations_2d`` can find a cache-resident ``layout.npy``."""
    cache_dir = cfg.get("cache_dir")
    if cache_dir is None:
        base = os.path.join(cfg.get("root_dir", "."), "data", "Gwilliams2022",
                            "preprocessed")
        cands = sorted(os.listdir(base)) if os.path.isdir(base) else []
        for c in cands:
            if os.path.exists(os.path.join(base, c, "x_dict.npy")):
                cache_dir = os.path.join(base, c)
                break
    if cache_dir is None:
        raise FileNotFoundError(
            "No Gwilliams preprocessed cache found. Build one with "
            "scripts in meg_decoding_tpu/data/gwilliams.py (preprocess_recordings) "
            "or point cfg.cache_dir at a reference-format cache."
        )
    cfg.cache_dir = cache_dir
    return cache_dir


def _load_gwilliams(cfg, seed):
    cache_dir = find_gwilliams_cache(cfg)
    x, y, meg_on, sp_on, sent = load_gwilliams_cache(cache_dir)
    split_mode = cfg.get("split_mode", "shallow")
    packed = build_gwilliams_dataset(cfg, x, y, meg_on, sp_on, sent,
                                     split_mode=split_mode, seed=seed)
    if split_mode in ("sentence", "deep"):
        train_ds, test_ds = packed
        return _SpeechLoader(train_ds, seed), _SpeechLoader(test_ds, seed + 1)
    # shallow: random_split over segments of one packed set (train.py:73-77)
    n = len(packed)
    tr, te = random_split(jax.random.PRNGKey(seed), n, float(cfg.split_ratio))
    # index remapping shares the packed arrays; wrap with index translation
    return (_SubsetLoader(packed, tr, seed), _SubsetLoader(packed, te, seed + 1))


class _SubsetLoader(_SpeechLoader):
    def __init__(self, ds, indices, seed=0):
        super().__init__(ds, seed)
        self.indices = np.asarray(indices)

    def __len__(self):
        return len(self.indices)

    def gather(self, idx, key=None):
        return super().gather(self.indices[np.asarray(idx)], key=key)


def _load_brennan(cfg, seed):
    pre = cfg.preprocs
    root = cfg.get("root_dir", ".")
    y_path = cfg.get("y_embeds_path",
                     f"{root}/data/Brennan2018/Y_embeds/embd_wav2vec.npy")
    if os.path.exists(y_path):
        Y_stream = np.load(y_path)
    else:
        Y_stream = _embed_brennan_audio(cfg, y_path)
    packed = build_brennan_dataset(cfg, Y_stream)
    n = len(packed)
    tr, te = random_split(jax.random.PRNGKey(seed), n, float(cfg.split_ratio))
    return (_SpeechLoader(packed.subset(tr), seed),
            _SpeechLoader(packed.subset(te), seed + 1))


def _embed_brennan_audio(cfg, y_path):
    """Audio → wav2vec last-4 (or conv features) → resample to the brain rate
    (brennan2018.py:154-212), cached to .npy."""
    import glob

    from scipy.io import wavfile

    from meg_decoding_tpu.features.wav2vec import (
        embed_features,
        embed_last4_avg,
        load_wav2vec,
    )
    from meg_decoding_tpu.ops.resample import resample_fft

    pre = cfg.preprocs
    root = cfg.get("root_dir", ".")
    paths = sorted(glob.glob(f"{root}/data/Brennan2018/audio/*.wav"))
    assert paths, f"no audio under {root}/data/Brennan2018/audio"
    wavs, rates = [], []
    for p in paths:
        sr, w = wavfile.read(p)
        if w.dtype.kind == "i":
            w = w / np.iinfo(w.dtype).max
        wavs.append(np.asarray(w, dtype=np.float32).reshape(-1))
        rates.append(sr)
    assert len(set(rates)) == 1
    wav = np.concatenate(wavs)
    target = int(pre.get("audio_resample_rate", 16000))
    if rates[0] != target:
        wav = np.asarray(resample_fft(jnp.asarray(wav)[None], down=rates[0] / target))[0]
    model, params = load_wav2vec(cfg.get("wav2vec_model",
                                         "facebook/wav2vec2-large-xlsr-53"),
                                 backend=cfg.get("wav2vec_backend", "auto"))
    if pre.get("last4layers", True):
        emb = embed_last4_avg(model, params, wav)
    else:
        emb = embed_features(model, params, wav)
    # resample embeddings to the brain rate (~50 → 120 Hz; the reference
    # hard-codes up=2.4, brennan2018.py:197-201 — we compute it)
    len_audio_s = len(wav) / target
    emb_rate = emb.shape[-1] / len_audio_s
    emb = np.asarray(resample_fft(jnp.asarray(emb),
                                  up=float(pre.brain_resample_rate) / emb_rate))
    os.makedirs(os.path.dirname(y_path), exist_ok=True)
    np.save(y_path, emb)
    return emb


def run(cfg: Config) -> dict:
    maybe_distributed_init(cfg)
    seed = int(cfg.get("seed", 0))
    save_root = cfg.get("save_root", "runs_out")
    os.makedirs(save_root, exist_ok=True)

    if cfg.dataset == "Gwilliams2022":
        train_set, test_set = _load_gwilliams(cfg, seed)
    else:
        train_set, test_set = _load_brennan(cfg, seed)
    cfg.num_subjects = train_set.num_subjects
    if cfg.get("host_resident", False):
        # spill path: recordings stay in host RAM, windows are numpy slices
        # streamed through the prefetch pipeline (train/loop.py).  Bypasses
        # the device-resident fast paths (fuse_gather / scan epochs).
        from meg_decoding_tpu.data.gwilliams import to_host

        # check sharing BEFORE reassigning: shallow-split loaders wrap the
        # SAME packed object, and sentence/deep splits alias the multi-GB
        # recordings/y_stream buffers across DISTINCT packed objects
        # (build_gwilliams_dataset) — spill through one id-keyed buffer
        # cache so each device buffer is pulled host-side exactly once
        shared = test_set.ds is train_set.ds
        buf_cache = {}
        spill = ((lambda d: to_host(d, buf_cache))
                 if isinstance(train_set.ds, GwilliamsPacked)
                 else lambda d: d.to_host())
        # spill BOTH before reassigning either: the cache keys are id()s of
        # the live device buffers, which train_set.ds keeps alive meanwhile
        train_host = spill(train_set.ds)
        test_host = train_host if shared else spill(test_set.ds)
        train_set.ds, test_set.ds = train_host, test_host
        cfg.fuse_gather = False
        cfg.use_scan_epochs = False

    if (len(jax.devices()) > 1 and bool(cfg.get("data_parallel", True))
            and not cfg.get("bn_impl")):
        # auto-spmd turns plain BN reductions into synced-BN collectives;
        # the Pallas BN-stats kernel has no partitioning rule — keep XLA BN
        # whenever the data-parallel mesh will engage (setup_data_parallel)
        cfg.bn_impl = "xla"
    num_channels = int(train_set.gather(np.arange(1))[0].shape[1])
    cfg.num_channels = num_channels
    loc = ch_locations_2d(cfg)
    assert loc.shape[0] == num_channels, (loc.shape, num_channels)
    model = get_model(cfg, loc=loc, num_channels=num_channels)

    rate = float(cfg.preprocs.brain_resample_rate)
    collate_cfg = CollateConfig(
        baseline_len_samp=int(rate * float(cfg.preprocs.get("baseline_len_sec", 0))),
        clamp_lim=float(cfg.preprocs.get("clamp_lim", 20)),
        clamp=bool(cfg.preprocs.get("clamp", True)),
        # Brennan pre-scales/corrects at build time (brennan2018.py:99-107);
        # Gwilliams collates per batch (gwilliams2022.py:641-662)
        enabled=cfg.dataset == "Gwilliams2022",
        quantile_impl=str(cfg.get("quantile_impl", "auto")),
    )
    loss_cfg = LossConfig(kind=cfg.select("loss.kind", "clip"),
                          reduction=cfg.get("reduction", "mean"),
                          temp_trainable=bool(cfg.get("temp_trainable", True)),
                          clip_impl=str(cfg.select("loss.clip_impl",
                                                   "factored")))

    updates = int(cfg.get("updates", 1200))
    optimizer = make_optimizer(cfg, updates)
    example = train_set.gather(np.arange(min(len(train_set), int(cfg.batch_size))))
    state = create_train_state(model, optimizer, example, jax.random.PRNGKey(seed),
                               init_temperature=float(cfg.get("init_temperature", 5.1)))
    mesh, shard_fn, replicate_fn = setup_data_parallel(cfg)
    state = replicate_fn(state)
    if mesh is not None and isinstance(train_set.ds, GwilliamsPacked):
        if not train_set.ds.host_resident:
            # session-shard BOTH splits over the mesh up front.  Splits
            # alias one recordings/y_stream buffer by construction
            # (build_gwilliams_dataset), and shard_gwilliams_splits stages
            # aliased buffers once — so the sentence/deep test split is
            # sharded too instead of staying fully replicated per chip, and
            # the whole dataset holds ONE sharded copy.  (host_resident
            # datasets were spilled ABOVE precisely because they don't fit
            # HBM — sharding would re-upload them; they stream batches
            # through the prefetch pipeline instead.)
            from meg_decoding_tpu.train.scan_loop import shard_gwilliams_splits

            if test_set.ds is train_set.ds:  # shallow split shares the object
                train_set.ds = test_set.ds = \
                    shard_gwilliams_splits(mesh, train_set.ds)[0]
            else:
                train_set.ds, test_set.ds = shard_gwilliams_splits(
                    mesh, train_set.ds, test_set.ds)
        # eval/direct gathers from the sharded splits must run per shard
        # (_SpeechLoader._gather_sharded) — a plain jit gather would
        # all-gather the full recordings onto every chip; a host-resident
        # loader instead emulates the sharded run's session draw
        # (device_major_sessions) so spill runs log identical metrics
        train_set.mesh = test_set.mesh = mesh
    train_step = make_train_step(model, optimizer, loss_cfg, collate_cfg,
                                 mesh=mesh)
    eval_step = make_eval_step(model, loss_cfg, collate_cfg, mesh=mesh)
    # the whole-epoch scan path (checked below) supersedes the per-step
    # fused path — don't build a fused step (and under a mesh, a session-
    # sharded dataset copy) that fit_scan would immediately discard
    scan_path = (cfg.get("use_scan_epochs", False)
                 and isinstance(train_set.ds, GwilliamsPacked)
                 and getattr(train_set, "indices", None) is None)
    fused_engaged = False
    if (cfg.dataset == "Gwilliams2022"
            and not scan_path
            and bool(cfg.get("fuse_gather", True))
            and isinstance(train_set.ds, GwilliamsPacked)):
        # single-dispatch gather+step (train/scan_loop.py); under a mesh the
        # recordings are session-sharded and the gather runs in shard_map
        from meg_decoding_tpu.train.scan_loop import make_fused_speech_step

        # under a mesh train_set.ds is already session-sharded (above), so
        # make_fused_speech_step reuses it as-is (fused.ds is train_set.ds)
        fused = make_fused_speech_step(
            model, optimizer, loss_cfg, collate_cfg, train_set.ds, mesh=mesh,
            cache_collate_stats=bool(cfg.get("cache_collate_stats", False)))
        fused_engaged = True
        base_key = jax.random.PRNGKey(seed + 17)
        call_counter = {"n": 0}
        indices = getattr(train_set, "indices", None)

        class _FusedLoader:
            """gather() returns (segment ids, pairing key); the 'step' does
            the gather.  The epoch driver supplies a (seed, epoch, step)-
            derived key (stochastic protocol) so resume is deterministic."""

            stochastic = True
            num_subjects = train_set.num_subjects

            def __len__(self):
                return len(train_set)

            def gather(self, idx, key=None):
                idx = np.asarray(idx)
                if indices is not None:
                    idx = indices[idx]
                if key is None:  # direct-call fallback only
                    key = jax.random.fold_in(base_key, call_counter["n"])
                    call_counter["n"] += 1
                return jnp.asarray(idx), key

        train_set_for_fit = _FusedLoader()
        train_step_for_fit = lambda state, idx, key: fused(state, idx, key)
    else:
        train_set_for_fit = train_set
        train_step_for_fit = train_step

    logger = RunLogger(save_root, run_name=cfg.get("run_name"),
                       use_wandb=bool(cfg.get("use_wandb", False)),
                       wandb_cfg=cfg.get("wandb"))
    logger.dump_config(cfg)  # Hydra-parity .hydra/config.yaml (ref runs)
    ckpt = CheckpointManager(os.path.join(save_root, "ckpt"))
    from meg_decoding_tpu.train.loop import resume_if_requested, steps_per_epoch

    state, start_epoch = resume_if_requested(
        cfg, ckpt, state, save_root,
        steps_per_epoch_n=steps_per_epoch(
            cfg, len(train_set), mesh.shape["data"] if mesh else 1))
    if scan_path:
        # whole-epoch scan fast path (sentence/deep splits: the packed set IS
        # the training split; shallow subsets need the per-step driver);
        # runs sharded over the mesh when one is active
        from meg_decoding_tpu.train.loop import fit_scan
        from meg_decoding_tpu.train.scan_loop import make_gwilliams_scan_epoch

        n_data = mesh.shape["data"] if mesh else 1
        bs = max((int(cfg.batch_size) // n_data) * n_data, n_data)
        scan_epoch = make_gwilliams_scan_epoch(
            model, optimizer, loss_cfg, collate_cfg, train_set.ds,
            updates=updates, batch_size=bs, mesh=mesh,
            cache_collate_stats=bool(cfg.get("cache_collate_stats", False)))
        state, best = fit_scan(cfg, train_set, test_set, state, scan_epoch,
                               eval_step, logger, ckpt, seed=seed,
                               start_epoch=start_epoch,
                               batch_multiple=n_data)
        return best

    state, best = fit(cfg, train_set_for_fit, test_set, state,
                      train_step_for_fit, eval_step,
                      logger, ckpt, seed=seed,
                      shard_fn=None if fused_engaged else shard_fn,
                      batch_multiple=(mesh.shape["data"] if mesh else 1),
                      start_epoch=start_epoch)
    return best
