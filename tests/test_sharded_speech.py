"""Multi-chip speech fast paths on the CPU mesh (VERDICT round-1 item 2).

The sharded fused gather+step and the sharded whole-epoch scan must produce
the same math as a single-device run fed the identical batches.  The sharded
session sampling is device-major (device d draws uniformly from its own
session shard), so the single-device oracle emulates exactly that scheme;
equality then holds up to float reduction order (psum vs single-device sum),
checked with SGD so near-zero gradients can't amplify into ±lr Adam flips.
"""

import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from meg_decoding_tpu.core.mesh import make_mesh, replicated
from meg_decoding_tpu.data.gwilliams import (
    _gather_batch,
    build_gwilliams_dataset,
    load_gwilliams_cache,
    pad_sessions,
)
from meg_decoding_tpu.data.layout import normalize_locations, synthetic_cap_locations
from meg_decoding_tpu.models.brain_encoder import BrainEncoder
from meg_decoding_tpu.train.scan_loop import (
    _make_sharded_gather,
    _shard_gwilliams,
    make_fused_speech_step,
    make_gwilliams_scan_epoch,
)
from meg_decoding_tpu.train.state import create_train_state
from meg_decoding_tpu.train.steps import CollateConfig, LossConfig, make_train_step

from tests.fixtures import make_gwilliams_cache

N_DEV = 4
B = 8


@pytest.fixture(scope="module")
def packed():
    tmp = tempfile.mkdtemp()
    cfg = make_gwilliams_cache(tmp)
    x, y, mo, so, sent = load_gwilliams_cache(tmp)
    train, test = build_gwilliams_dataset(cfg, x, y, mo, so, sent,
                                          split_mode="sentence")
    return cfg, train, test


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(n_data=N_DEV, devices=jax.devices("cpu")[:N_DEV])


def _setup(ds, seq2seq=True, optimizer=None):
    C = ds.recordings.shape[2]
    loc = normalize_locations(synthetic_cap_locations(C))
    model = BrainEncoder(loc=loc, num_subjects=ds.num_subjects,
                         D1=8, D2=12, F=16, K=4, seq2seq=seq2seq)
    rng = np.random.RandomState(0)
    Xe = jnp.asarray(rng.randn(B, C, ds.seq_len), jnp.float32)
    Ye = jnp.asarray(rng.randn(B, 16, ds.seq_len), jnp.float32) if seq2seq \
        else jnp.asarray(rng.randn(B, 16), jnp.float32)
    subs_e = jnp.asarray(rng.randint(0, ds.num_subjects, B))
    opt = optimizer or optax.sgd(1e-2)
    state = create_train_state(model, opt, (Xe, Ye, subs_e), jax.random.PRNGKey(0))
    return model, opt, state


def _emulated_sessions(key, n_dev, S_pad, b):
    """The device-major session draw every device performs inside shard_map."""
    S_local, B_local = S_pad // n_dev, b // n_dev
    parts = []
    for d in range(n_dev):
        kd = jax.random.fold_in(key, d)
        parts.append(d * S_local + jax.random.randint(kd, (B_local,), 0, S_local))
    return jnp.concatenate(parts)


class TestPadSessions:
    def test_pads_cyclically_and_keeps_metadata(self, packed):
        _, train, _ = packed
        S = train.recordings.shape[0]
        ds = pad_sessions(train, N_DEV)
        S_pad = ds.recordings.shape[0]
        assert S_pad % N_DEV == 0 and S_pad - S < N_DEV
        for i in range(S_pad - S):
            np.testing.assert_array_equal(np.asarray(ds.recordings[S + i]),
                                          np.asarray(train.recordings[i % S]))
            assert int(ds.session_subject[S + i]) == int(train.session_subject[i % S])
        assert len(ds) == len(train)  # segment count unchanged

    def test_noop_when_divisible(self, packed):
        _, train, _ = packed
        S = train.recordings.shape[0]
        assert pad_sessions(train, S) is train


class TestShardedFusedStep:
    def test_matches_emulated_single_device(self, packed, mesh):
        _, train, _ = packed
        model, opt, state = _setup(train)
        lc = LossConfig(kind="clip")
        cc = CollateConfig(baseline_len_samp=8, clamp_lim=20.0)

        fused = make_fused_speech_step(model, opt, lc, cc, train, mesh=mesh)
        idx = np.arange(B)
        key = jax.random.PRNGKey(5)
        state_m = jax.device_put(state, replicated(mesh))
        state_m, mm = fused(state_m, idx, key)
        # the fused step donates its state argument; rebuild the oracle's
        _, _, state = _setup(train)

        # oracle: identical batches gathered on one device
        ds_p = pad_sessions(train, N_DEV)
        sess = _emulated_sessions(key, N_DEV, ds_p.recordings.shape[0], B)
        seg = jnp.asarray(ds_p.segment_table())[jnp.asarray(idx)]
        X, Y, subs = _gather_batch(
            ds_p.recordings, ds_p.y_stream, ds_p.meg_onsets,
            ds_p.speech_onsets, ds_p.session_subject,
            seg[:, 0], seg[:, 1], sess, ds_p.seq_len)
        step_s = make_train_step(model, opt, lc, cc, donate=False)
        state_s, ms = step_s(state, X, Y, subs)

        np.testing.assert_allclose(float(mm["loss"]), float(ms["loss"]),
                                   rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(state_m.params),
                        jax.tree_util.tree_leaves(state_s.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-6)

    def test_session_sharded_hbm_layout(self, packed, mesh):
        """The production layout: recordings really are partitioned over the
        data axis (each device holds S_pad/N sessions, not a replica)."""
        _, train, _ = packed
        ds = _shard_gwilliams(train, mesh)
        shard_shapes = {s.data.shape for s in ds.recordings.addressable_shards}
        S_pad = ds.recordings.shape[0]
        assert shard_shapes == {(S_pad // N_DEV,) + ds.recordings.shape[1:]}
        assert len(ds.recordings.addressable_shards) == N_DEV


class TestShardedScanEpoch:
    def test_matches_emulated_single_device_loop(self, packed, mesh):
        _, train, _ = packed
        updates, bs = 3, B
        model, opt, state = _setup(train)
        lc = LossConfig(kind="clip")
        cc = CollateConfig(baseline_len_samp=8, clamp_lim=20.0)

        scan_epoch = make_gwilliams_scan_epoch(model, opt, lc, cc, train,
                                               updates=updates, batch_size=bs,
                                               mesh=mesh)
        key = jax.random.PRNGKey(7)
        state_m = jax.device_put(state, replicated(mesh))
        state_m, mm = scan_epoch(state_m, key)
        # the scan epoch donates its state argument; rebuild the oracle's
        _, _, state = _setup(train)

        # oracle loop replicating _build_epoch's sampling exactly
        ds_p = pad_sessions(train, N_DEV)
        seg_table = jnp.asarray(ds_p.segment_table())
        ikey, key2 = jax.random.split(key)
        idx = jax.random.randint(ikey, (updates, bs), 0, len(train))
        subkeys = jax.random.split(key2, updates)
        step_s = make_train_step(model, opt, lc, cc, donate=False)
        state_s = state
        hist = []
        for u in range(updates):
            sess = _emulated_sessions(subkeys[u], N_DEV,
                                      ds_p.recordings.shape[0], bs)
            seg = seg_table[idx[u]]
            X, Y, subs = _gather_batch(
                ds_p.recordings, ds_p.y_stream, ds_p.meg_onsets,
                ds_p.speech_onsets, ds_p.session_subject,
                seg[:, 0], seg[:, 1], sess, ds_p.seq_len)
            state_s, ms = step_s(state_s, X, Y, subs)
            hist.append(ms)

        mean_loss = float(np.mean([float(h["loss"]) for h in hist]))
        np.testing.assert_allclose(float(mm["loss"]), mean_loss, rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(state_m.params),
                        jax.tree_util.tree_leaves(state_s.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-6)


class TestShardedTrainerE2E:
    def _cfg(self, cfg, save_root, **extra):
        cfg.save_root = save_root
        cfg.model = "brain_encoder"
        cfg.D1 = 8
        cfg.D2 = 12
        cfg.F = 16
        cfg.K = 4
        cfg.d_drop = 0.1
        cfg.seq2seq = True
        cfg.batch_size = 16
        cfg.updates = 3
        cfg.epochs = 1
        cfg.use_sampler = True
        cfg.test_size = 16
        cfg.lr = 1e-3
        cfg.lr_scheduler = "none"
        cfg.init_temperature = 5.1
        cfg.seed = 0
        cfg.data_parallel = True     # engage the 8-device CPU mesh
        cfg.set_dotted("loss.kind", "clip")
        for k, v in extra.items():
            cfg.set_dotted(k, v)
        return cfg

    def test_fused_path_under_mesh(self, tmp_path):
        cache = str(tmp_path / "cache")
        cfg = make_gwilliams_cache(cache)
        cfg = self._cfg(cfg, str(tmp_path / "out"), fuse_gather=True)
        from meg_decoding_tpu.cli.train_speech import run

        best = run(cfg)
        assert np.isfinite(best.get("train_loss", np.nan))
        assert best.get("test_top10", 0) > 0

    def test_promoted_recipe_under_mesh(self, tmp_path):
        """The shipped configs/throughput.yaml lever set (bf16 compute +
        cached collate stats + certified tanh GELU) trains data-parallel
        under the 8-device mesh through the public CLI — the promoted
        single-chip record configuration is multi-chip-safe."""
        cache = str(tmp_path / "cache")
        cfg = make_gwilliams_cache(cache)
        cfg = self._cfg(cfg, str(tmp_path / "out"), fuse_gather=True,
                        compute_dtype="bfloat16", cache_collate_stats=True,
                        gelu_approximate=True)
        from meg_decoding_tpu.cli.train_speech import run

        best = run(cfg)
        assert np.isfinite(best.get("train_loss", np.nan))
        assert best.get("test_top10", 0) > 0

    def test_scan_epochs_under_mesh(self, tmp_path):
        cache = str(tmp_path / "cache")
        cfg = make_gwilliams_cache(cache)
        cfg = self._cfg(cfg, str(tmp_path / "out"), use_scan_epochs=True,
                        split_mode="sentence")
        from meg_decoding_tpu.cli.train_speech import run

        best = run(cfg)
        assert np.isfinite(best.get("train_loss", np.nan))


class TestSharedSplitBuffers:
    """Sentence/deep splits must alias ONE recordings/y_stream device buffer
    (they differ only in onset tables) — at full Gwilliams scale a per-split
    copy (2 x 9.34 GB) cannot fit a 16 GB v5e (VERDICT r2 weak #1)."""

    @pytest.mark.parametrize("split_mode", ["sentence", "deep"])
    def test_builder_aliases_big_buffers(self, tmp_path, split_mode):
        cache = str(tmp_path / "cache")
        cfg = make_gwilliams_cache(cache)
        x, y, mo, so, sent = load_gwilliams_cache(cache)
        train, test = build_gwilliams_dataset(cfg, x, y, mo, so, sent,
                                              split_mode=split_mode)
        assert train.recordings is test.recordings
        assert train.y_stream is test.y_stream
        assert train.session_subject is test.session_subject
        # onset tables are per-split
        assert train.meg_onsets is not test.meg_onsets
        assert len(train) + len(test) > 0 and len(train) != len(test)

    def test_shard_splits_shares_one_sharded_copy(self, packed, mesh):
        from meg_decoding_tpu.train.scan_loop import (
            is_session_sharded,
            shard_gwilliams_splits,
        )

        _, train, test = packed
        tr_s, te_s = shard_gwilliams_splits(mesh, train, test)
        # one sharded recordings/y_stream buffer, aliased by both splits
        assert tr_s.recordings is te_s.recordings
        assert tr_s.y_stream is te_s.y_stream
        assert is_session_sharded(tr_s, mesh) and is_session_sharded(te_s, mesh)
        S_pad = tr_s.recordings.shape[0]
        shard_shapes = {s.data.shape for s in te_s.recordings.addressable_shards}
        assert shard_shapes == {(S_pad // N_DEV,) + tr_s.recordings.shape[1:]}
        # per-split onset tables are session-sharded too
        mo_shapes = {s.data.shape for s in te_s.meg_onsets.addressable_shards}
        assert mo_shapes == {(S_pad // N_DEV,) + te_s.meg_onsets.shape[1:]}
        # word counts unchanged per split
        assert len(tr_s) == len(train) and len(te_s) == len(test)

    def test_sharded_test_split_gathers_identically(self, packed, mesh):
        """Eval batches gathered from the session-sharded TEST split equal
        the unsharded (padded) gather given the same key — sharding is a
        layout change, not a semantic one."""
        from meg_decoding_tpu.data.gwilliams import gather_speech_batch
        from meg_decoding_tpu.train.scan_loop import shard_gwilliams_splits

        _, train, test = packed
        _, te_s = shard_gwilliams_splits(mesh, train, test)
        te_ref = pad_sessions(test, N_DEV)  # same S_pad -> same session draws
        idx = np.arange(min(B, len(test)))
        key = jax.random.PRNGKey(11)
        Xs, Ys, ss, _ = gather_speech_batch(te_s, idx, key)
        Xr, Yr, sr, _ = gather_speech_batch(te_ref, idx, key)
        np.testing.assert_array_equal(np.asarray(Xs), np.asarray(Xr))
        np.testing.assert_array_equal(np.asarray(Ys), np.asarray(Yr))
        np.testing.assert_array_equal(np.asarray(ss), np.asarray(sr))

    def test_fused_sentence_split_trainer_under_mesh(self, tmp_path):
        """E2E: the reference's paper path (sentence split) with the fused
        gather+step AND a sharded test split — both splits ride one sharded
        recordings buffer."""
        cache = str(tmp_path / "cache")
        cfg = make_gwilliams_cache(cache)
        cfg.save_root = str(tmp_path / "out")
        for k, v in dict(model="brain_encoder", D1=8, D2=12, F=16, K=4,
                         d_drop=0.1, seq2seq=True, batch_size=16, updates=3,
                         epochs=1, use_sampler=True, test_size=16, lr=1e-3,
                         lr_scheduler="none", init_temperature=5.1, seed=0,
                         data_parallel=True, fuse_gather=True,
                         split_mode="sentence").items():
            setattr(cfg, k, v)
        cfg.set_dotted("loss.kind", "clip")
        from meg_decoding_tpu.cli.train_speech import run

        best = run(cfg)
        assert np.isfinite(best.get("train_loss", np.nan))
        assert "test_top10" in best


class TestShardedCollateStatsCache:
    def test_sharded_cached_matches_sharded_inline(self, packed, mesh):
        """Under the mesh, the fused step with cache_collate_stats=True must
        track the inline-sort sharded fused step (same keys; SGD so ulp-level
        IQR-lerp differences stay ulp-level in the params)."""
        _, train, _ = packed
        model, opt, state_a = _setup(train)
        _, _, state_b = _setup(train)
        lc = LossConfig(kind="clip")
        cc = CollateConfig(baseline_len_samp=8, clamp_lim=20.0)

        inline = make_fused_speech_step(model, opt, lc, cc, train, mesh=mesh)
        cached = make_fused_speech_step(model, opt, lc, cc, train, mesh=mesh,
                                        cache_collate_stats=True)
        # the flat row table is session-block-sharded like the recordings;
        # each device's block is its local (chunk-padded) sweep output
        from meg_decoding_tpu.data.gwilliams import stats_lane_pad

        stats = cached.collate_stats
        assert stats is not None
        S_pad, NT, W = cached.ds.meg_onsets.shape
        Cp = stats_lane_pad(cached.ds.recordings.shape[2])
        local_rows = -(-(S_pad // N_DEV) * NT * W // 512) * 512
        assert stats.shape == (N_DEV * local_rows, 2 * Cp)
        shard_shapes = {s.data.shape for s in stats.addressable_shards}
        assert shard_shapes == {(local_rows, 2 * Cp)}

        state_a = jax.device_put(state_a, replicated(mesh))
        state_b = jax.device_put(state_b, replicated(mesh))
        for i in range(2):
            idx = np.arange(B) + i
            key = jax.random.PRNGKey(40 + i)
            state_a, ma = inline(state_a, idx, key)
            state_b, mb = cached(state_b, idx, key)
            np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                                       rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                        jax.tree_util.tree_leaves(state_b.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_scan_epoch_sharded_cached_runs(self, packed, mesh):
        """Sharded scan-epoch with the stats cache: one epoch trains with
        finite metrics and sharded stats in the data_args."""
        from meg_decoding_tpu.train.scan_loop import make_gwilliams_scan_epoch

        _, train, _ = packed
        model, opt, state = _setup(train)
        lc = LossConfig(kind="clip")
        cc = CollateConfig(baseline_len_samp=8, clamp_lim=20.0)
        epoch = make_gwilliams_scan_epoch(model, opt, lc, cc, train,
                                          updates=3, batch_size=B, mesh=mesh,
                                          cache_collate_stats=True)
        state = jax.device_put(state, replicated(mesh))
        state, m = epoch(state, jax.random.PRNGKey(7))
        assert np.isfinite(float(m["loss"]))
        assert float(m["skipped"]) == 0.0


class TestShardedEvalGather:
    """Eval/direct gathers from a session-sharded dataset must run per shard
    (_SpeechLoader._gather_sharded): the Pallas window-gather custom call has
    no GSPMD partitioning rule, so a plain jit on sharded operands would
    all-gather the full padded recordings onto every chip (a transient
    ~9.3 GB unsharded copy at full scale)."""

    def test_loader_gathers_per_shard(self, packed, mesh):
        from meg_decoding_tpu.cli.train_speech import _SpeechLoader
        from meg_decoding_tpu.train.scan_loop import shard_gwilliams_splits

        _, train, test = packed
        _, te_s = shard_gwilliams_splits(mesh, train, test)
        loader = _SpeechLoader(te_s, seed=3)
        loader.mesh = mesh
        idx = np.arange(min(B, len(te_s)))
        key = jax.random.PRNGKey(21)
        X, Y, subs = loader.gather(idx, key=key)

        # oracle: same device-major session draw, single-device gather
        te_p = pad_sessions(test, N_DEV)
        sess = _emulated_sessions(key, N_DEV, te_p.recordings.shape[0],
                                  len(idx))
        seg = jnp.asarray(te_p.segment_table())[jnp.asarray(idx)]
        Xr, Yr, sr = _gather_batch(
            te_p.recordings, te_p.y_stream, te_p.meg_onsets,
            te_p.speech_onsets, te_p.session_subject,
            seg[:, 0], seg[:, 1], sess, te_p.seq_len)
        np.testing.assert_array_equal(np.asarray(X), np.asarray(Xr))
        np.testing.assert_array_equal(np.asarray(Y), np.asarray(Yr))
        np.testing.assert_array_equal(np.asarray(subs), np.asarray(sr))
        # the output really is batch-sharded over the mesh
        assert len(X.sharding.device_set) == N_DEV

    def test_spilled_loader_matches_sharded_loader_bitwise(self, packed, mesh):
        """A host-resident (spilled) loader under the same mesh must draw the
        SAME sessions as the session-sharded device loader
        (device_major_sessions emulates the shard_map draw), so spill runs
        log exactly what HBM runs log — the drop-in contract."""
        from meg_decoding_tpu.cli.train_speech import _SpeechLoader
        from meg_decoding_tpu.data.gwilliams import to_host
        from meg_decoding_tpu.train.scan_loop import shard_gwilliams_splits

        _, train, test = packed
        _, te_s = shard_gwilliams_splits(mesh, train, test)
        dev_loader = _SpeechLoader(te_s, seed=3)
        dev_loader.mesh = mesh
        host_loader = _SpeechLoader(to_host(test), seed=3)
        host_loader.mesh = mesh
        idx = np.arange(min(B, len(test)))
        key = jax.random.PRNGKey(9)
        Xd, Yd, sd = dev_loader.gather(idx, key=key)
        Xh, Yh, sh = host_loader.gather(idx, key=key)
        assert isinstance(Xh, np.ndarray)  # really the spill path
        np.testing.assert_array_equal(np.asarray(Xd), Xh)
        np.testing.assert_array_equal(np.asarray(Yd), Yh)
        np.testing.assert_array_equal(np.asarray(sd), sh)

    def test_loader_pads_indivisible_batch_per_shard(self, packed, mesh):
        """A batch that doesn't divide the data axis (tiny test pool /
        direct calls) is padded cyclically to the next multiple and trimmed
        — it must STAY on the per-shard gather path (the old fallback was a
        plain gather on the sharded recordings, which transiently
        all-gathers the full ~9.3 GB pack onto every chip at scale)."""
        from meg_decoding_tpu.cli.train_speech import _SpeechLoader
        from meg_decoding_tpu.train.scan_loop import shard_gwilliams_splits

        _, train, test = packed
        _, te_s = shard_gwilliams_splits(mesh, train, test)
        loader = _SpeechLoader(te_s, seed=3)
        loader.mesh = mesh
        n = min(B + 1, len(te_s))
        idx = np.arange(n)
        key = jax.random.PRNGKey(2)
        X, Y, subs = loader.gather(idx, key=key)
        assert X.shape[0] == n and Y.shape[0] == n and subs.shape[0] == n

        # oracle: the padded device-major draw, single-device gather, trimmed
        n_p = -(-n // N_DEV) * N_DEV
        idx_p = np.resize(idx, n_p)
        te_p = pad_sessions(test, N_DEV)
        sess = _emulated_sessions(key, N_DEV, te_p.recordings.shape[0], n_p)
        seg = jnp.asarray(te_p.segment_table())[jnp.asarray(idx_p)]
        Xr, Yr, sr = _gather_batch(
            te_p.recordings, te_p.y_stream, te_p.meg_onsets,
            te_p.speech_onsets, te_p.session_subject,
            seg[:, 0], seg[:, 1], sess, te_p.seq_len)
        np.testing.assert_array_equal(np.asarray(X), np.asarray(Xr)[:n])
        np.testing.assert_array_equal(np.asarray(Y), np.asarray(Yr)[:n])
        np.testing.assert_array_equal(np.asarray(subs), np.asarray(sr)[:n])

    def test_spilled_loader_pads_indivisible_batch(self, packed, mesh):
        """The host-resident loader under a mesh pads indivisible batches
        the same way, so spill runs keep the drop-in contract at any pool
        size."""
        from meg_decoding_tpu.cli.train_speech import _SpeechLoader
        from meg_decoding_tpu.data.gwilliams import (
            gather_speech_batch,
            to_host,
        )

        _, train, test = packed
        loader = _SpeechLoader(to_host(test), seed=3)
        loader.mesh = mesh
        n = min(B + 1, len(test))
        idx = np.arange(n)
        key = jax.random.PRNGKey(2)
        Xh, Yh, sh = loader.gather(idx, key=key)
        assert isinstance(Xh, np.ndarray) and Xh.shape[0] == n
        n_p = -(-n // N_DEV) * N_DEV
        Xr, Yr, sr, _ = gather_speech_batch(
            loader.ds, np.resize(idx, n_p), key, device_major=N_DEV)
        np.testing.assert_array_equal(Xh, Xr[:n])
        np.testing.assert_array_equal(Yh, Yr[:n])
        np.testing.assert_array_equal(sh, sr[:n])


class TestHostResidentUnderMesh:
    def test_spilled_dataset_is_not_resharded(self, tmp_path, monkeypatch):
        """host_resident: true must keep the recordings in host RAM even when
        a data-parallel mesh is active — resharding would re-upload arrays
        that were spilled precisely because they exceed HBM."""
        import meg_decoding_tpu.train.scan_loop as scan_loop

        def _boom(*a, **k):
            raise AssertionError(
                "shard_gwilliams_splits must not run on a host-resident "
                "dataset (it would re-upload the spilled recordings)")

        monkeypatch.setattr(scan_loop, "shard_gwilliams_splits", _boom)
        cache = str(tmp_path / "cache")
        cfg = make_gwilliams_cache(cache)
        cfg.save_root = str(tmp_path / "out")
        for k, v in dict(model="brain_encoder", D1=8, D2=12, F=16, K=4,
                         d_drop=0.1, seq2seq=True, batch_size=16, updates=2,
                         epochs=1, use_sampler=True, test_size=16, lr=1e-3,
                         lr_scheduler="none", init_temperature=5.1, seed=0,
                         data_parallel=True, host_resident=True).items():
            setattr(cfg, k, v)
        cfg.set_dotted("loss.kind", "clip")
        from meg_decoding_tpu.cli.train_speech import run

        best = run(cfg)
        assert np.isfinite(best.get("train_loss", np.nan))
