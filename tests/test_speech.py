"""Speech-path tests: Gwilliams packed dataset + splits + gather, Brennan
builder chain, wav2vec embedding shapes, and e2e training on both datasets."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meg_decoding_tpu.core.config import Config
from meg_decoding_tpu.data.brennan import build_brennan_dataset, load_brennan_eeg
from meg_decoding_tpu.data.gwilliams import (
    build_gwilliams_dataset,
    deep_split,
    gather_speech_batch,
    load_gwilliams_cache,
    sentence_split,
)

from tests.fixtures import make_brennan_raw, make_gwilliams_cache


@pytest.fixture(scope="module")
def gw(tmp_path_factory):
    cache = str(tmp_path_factory.mktemp("gwcache"))
    cfg = make_gwilliams_cache(cache)
    return cfg, load_gwilliams_cache(cache)


class TestGwilliamsPacking:
    def test_sentence_split_word_partition(self, gw):
        cfg, (x, y, mo, so, sent) = gw
        tr, te = sentence_split(sent, 0.8, seed=0)
        for task in sent:
            all_words = np.concatenate([tr[task], te[task]])
            assert sorted(all_words) == list(range(len(sent[task])))
            # sentences don't straddle the split
            tr_sents = set(np.asarray(sent[task])[tr[task]])
            te_sents = set(np.asarray(sent[task])[te[task]])
            assert tr_sents.isdisjoint(te_sents)

    @pytest.mark.parametrize("wpt", [26, 3])  # not multiples of 4; < 4
    def test_synthetic_cache_sentence_table_covers_all_words(
            self, tmp_path, wpt):
        """Regression: the synthetic generator's sentence_idxs table must be
        exactly one entry per word for ANY words_per_task (a // 4 repeat once
        truncated it, silently dropping tail words from both splits)."""
        cfg = make_gwilliams_cache(str(tmp_path / "c"), words_per_task=wpt)
        _, _, mo, so, sent = load_gwilliams_cache(cfg.cache_dir)
        for task in sent:
            assert len(sent[task]) == len(so[task]) == wpt
        tr, te = sentence_split(sent, 0.8, seed=0)
        for task in sent:
            assert sorted(np.concatenate([tr[task], te[task]])) == list(range(wpt))

    def test_deep_split_head_tail(self, gw):
        cfg, (x, y, mo, so, sent) = gw
        tr, te = deep_split(so, 0.8)
        for task in so:
            assert tr[task].max() < te[task].min()

    def test_packed_shapes(self, gw):
        cfg, (x, y, mo, so, sent) = gw
        train, test = build_gwilliams_dataset(cfg, x, y, mo, so, sent,
                                              split_mode="sentence")
        # 2 subjects × 2 sessions
        assert train.recordings.shape[0] == 4
        assert train.recordings.shape[1] == 4  # tasks
        assert train.num_subjects == 2
        assert train.seq_len == 360
        assert len(train) + len(test) == 4 * 24  # all words partitioned

    def test_gather_matches_manual_slice(self, gw):
        cfg, (x, y, mo, so, sent) = gw
        ds = build_gwilliams_dataset(cfg, x, y, mo, so, sent, split_mode="shallow")
        X, Y, subs, ids = gather_speech_batch(ds, np.arange(8), jax.random.PRNGKey(0))
        assert X.shape == (8, 12, 360) and Y.shape == (8, 16, 360)
        # oracle: segment 0 is task0 word0; Y window starts at speech onset
        rate = 120
        onset = int(np.round(np.asarray(so["task0"])[0] * rate))
        shift = int(rate * 0.150)
        expect = y["task0"][:, onset : onset + 360]
        np.testing.assert_allclose(np.asarray(Y[0]), expect, rtol=1e-5, atol=1e-5)
        # X window: recording was shifted by 150 ms then sliced at the onset
        sess = None  # find which session row matches
        got_x = np.asarray(X[0])
        keys = sorted(x.keys())
        matched = False
        for key in keys:
            if not key.endswith("task0"):
                continue
            rec = x[key][:, shift:]
            cand = rec[:, onset : onset + 360]
            if cand.shape == got_x.shape and np.allclose(cand, got_x, rtol=1e-4,
                                                         atol=1e-5):
                matched = True
        assert matched, "gathered X doesn't match any session's window"

    def test_subject_index_consistent_with_session(self, gw):
        cfg, (x, y, mo, so, sent) = gw
        ds = build_gwilliams_dataset(cfg, x, y, mo, so, sent, split_mode="shallow")
        subs = np.asarray(ds.session_subject)
        assert set(subs) == {0, 1}
        assert (subs == 0).sum() == 2  # 2 sessions per subject


class TestBrennanBuilder:
    def test_loader_excludes_and_trims(self, tmp_path):
        cfg = make_brennan_raw(str(tmp_path), n_subjects=3)
        X, fs = load_brennan_eeg(f"{tmp_path}/data/Brennan2018/raw",
                                 num_channels=8, expected_fs=500.0)
        assert X.shape[0] == 3 and X.shape[1] == 8
        assert fs == 500.0

    def test_build_chain_shapes(self, tmp_path):
        cfg = make_brennan_raw(str(tmp_path), n_subjects=3)
        Y = np.load(f"{tmp_path}/data/Brennan2018/Y_embeds/embd_wav2vec.npy")
        X, fs = load_brennan_eeg(f"{tmp_path}/data/Brennan2018/raw",
                                 num_channels=8, expected_fs=500.0)
        ds = build_brennan_dataset(cfg, Y, X_raw=X, fs=fs)
        # 60 s at 120 Hz minus 150 ms shift → 19 chunks of 360
        assert ds.X.shape[1:] == (3, 8, 360)
        assert ds.Y.shape[1:] == (16, 360)
        assert ds.X.shape[0] == ds.Y.shape[0] == 19
        # scaled data is clamped
        assert float(jnp.max(jnp.abs(ds.X))) <= 20.0
        # baseline: first 0.5 s of each chunk has ~zero mean per channel
        base = np.asarray(ds.X[..., :60].mean(-1))
        np.testing.assert_allclose(base, 0.0, atol=1e-4)

    def test_gather_random_subject(self, tmp_path):
        cfg = make_brennan_raw(str(tmp_path), n_subjects=3, seed=1)
        Y = np.load(f"{tmp_path}/data/Brennan2018/Y_embeds/embd_wav2vec.npy")
        X, fs = load_brennan_eeg(f"{tmp_path}/data/Brennan2018/raw",
                                 num_channels=8, expected_fs=500.0)
        ds = build_brennan_dataset(cfg, Y, X_raw=X, fs=fs)
        Xb, Yb, subs, ids = ds.gather(np.array([0, 5, 7]),
                                      subject_idxs=np.array([0, 2, 1]))
        np.testing.assert_allclose(np.asarray(Xb[1]), np.asarray(ds.X[5, 2]))
        np.testing.assert_array_equal(np.asarray(ids), [0, 5, 7])


class TestWav2Vec:
    def test_random_backend_shapes_and_rate(self):
        from meg_decoding_tpu.features.wav2vec import (
            embed_last4_avg,
            load_wav2vec,
        )

        model, params = load_wav2vec(backend="random", num_hidden_layers=5)
        wav = np.random.RandomState(0).randn(16000 * 2).astype(np.float32) * 0.1
        emb = embed_last4_avg(model, params, wav, chunk_sec=1.0, overlap_sec=0.2)
        assert emb.shape[0] == 1024
        rate = emb.shape[1] / 2.0
        assert 48 < rate < 51  # ~49.97 Hz

    def test_num_frames_formula_matches_model(self):
        """The conv-stack frame-count formula (used to trim the padded+masked
        final chunk) must match the model's actual output length."""
        from meg_decoding_tpu.features.wav2vec import _num_frames, load_wav2vec

        model, params = load_wav2vec(backend="random", num_hidden_layers=2)
        for L in [16000, 12345, 8000]:
            out = model(np.zeros((1, L), np.float32), params=params,
                        train=False)
            assert out.last_hidden_state.shape[1] == _num_frames(model.config, L), L

    def test_chunking_no_boundary_artifact(self):
        from meg_decoding_tpu.features.wav2vec import (
            embed_last4_avg,
            load_wav2vec,
        )

        model, params = load_wav2vec(backend="random", num_hidden_layers=5)
        wav = np.random.RandomState(1).randn(16000 * 3).astype(np.float32) * 0.1
        whole = embed_last4_avg(model, params, wav, chunk_sec=10.0)
        chunked = embed_last4_avg(model, params, wav, chunk_sec=2.0,
                                  overlap_sec=0.5)
        assert whole.shape == chunked.shape
        # interiors agree closely (transformer context effects are bounded
        # by the overlap margin)
        T = whole.shape[1]
        corr = np.corrcoef(whole[:, T // 4 : -T // 4].ravel(),
                           chunked[:, T // 4 : -T // 4].ravel())[0, 1]
        assert corr > 0.98


class TestSpeechE2E:
    def _speech_cfg(self, cfg, save_root):
        cfg.save_root = save_root
        cfg.model = "brain_encoder"
        cfg.D1 = 16
        cfg.D2 = 24
        cfg.F = 16
        cfg.K = 4
        cfg.d_drop = 0.1
        cfg.seq2seq = False
        cfg.batch_size = 16
        cfg.updates = 6
        cfg.epochs = 2
        cfg.use_sampler = True
        cfg.test_size = 16
        cfg.lr = 1e-3
        cfg.lr_scheduler = "none"
        cfg.reduction = "mean"
        cfg.init_temperature = 5.1
        cfg.seed = 0
        cfg.set_dotted("loss.kind", "clip")
        return cfg

    def test_gwilliams_e2e(self, gw, tmp_path):
        cfg, _ = gw
        cfg = self._speech_cfg(cfg, str(tmp_path / "out"))
        cfg.seq2seq = True  # Gwilliams pairs (F, 360) segments with (F, 360) Z
        from meg_decoding_tpu.cli.train_speech import run

        best = run(cfg)
        assert np.isfinite(best.get("train_loss", np.nan))
        assert best.get("test_top10", 0) > 0

    def test_brennan_e2e(self, tmp_path):
        cfg = make_brennan_raw(str(tmp_path), n_subjects=3)
        cfg = self._speech_cfg(cfg, str(tmp_path / "out"))
        cfg.seq2seq = True
        cfg.use_sampler = False  # reference Brennan uses shuffle batching
        from meg_decoding_tpu.cli.train_speech import run

        best = run(cfg)
        assert np.isfinite(best.get("train_loss", np.nan))


class TestDropOverlapping:
    def test_no_window_crosses_split(self, gw):
        from meg_decoding_tpu.data.gwilliams import drop_overlapping_words

        cfg, (x, y, mo, so, sent) = gw
        tr, te = sentence_split(sent, 0.8, seed=0)
        tr2 = drop_overlapping_words(tr, te, so, seq_len_sec=3.0)
        for task in so:
            onsets = np.asarray(so[task])
            te_onsets = np.sort(onsets[te[task]])
            for w in tr2[task]:
                # no test onset inside this train window
                inside = (te_onsets > onsets[w]) & (te_onsets < onsets[w] + 3.0)
                assert not inside.any()
            # kept set is a subset of the original
            assert set(tr2[task]).issubset(set(tr[task]))


class TestSpeechEvaluate:
    def test_checkpoint_evaluation(self, gw, tmp_path):
        cfg, _ = gw
        cfg = TestSpeechE2E()._speech_cfg(cfg, str(tmp_path / "out"))
        cfg.seq2seq = True
        cfg.data_parallel = False
        from meg_decoding_tpu.cli.train_speech import run as train_run

        train_run(cfg)
        from meg_decoding_tpu.cli.evaluate_speech import run as eval_run

        results = eval_run(cfg)
        for k in ("test_top1", "test_top10", "pairwise_correlation"):
            assert np.isfinite(results[k])
        assert results["n_test_segments"] > 0
        assert os.path.exists(str(tmp_path / "out" / "eval_results.json"))


class TestFusedGatherPath:
    def test_single_chip_fused_step_trains(self, gw, tmp_path):
        """data_parallel=False engages the single-dispatch fused gather+step
        (_FusedLoader); must train and log like the classic path."""
        cfg, _ = gw
        cfg = TestSpeechE2E()._speech_cfg(cfg, str(tmp_path / "out"))
        cfg.seq2seq = True
        cfg.data_parallel = False
        cfg.fuse_gather = True
        from meg_decoding_tpu.cli.train_speech import run

        best = run(cfg)
        assert np.isfinite(best.get("train_loss", np.nan))
        assert best.get("test_top10", 0) > 0

    def test_fused_step_equals_manual_gather_plus_step(self, gw):
        """The fused single-program step must produce bit-identical results
        to gathering with the same key and stepping separately."""
        import optax

        from meg_decoding_tpu.data.gwilliams import (
            _gather_batch,
            build_gwilliams_dataset,
            load_gwilliams_cache,
        )
        from meg_decoding_tpu.data.layout import (
            normalize_locations,
            synthetic_cap_locations,
        )
        from meg_decoding_tpu.models.brain_encoder import BrainEncoder
        from meg_decoding_tpu.train.scan_loop import make_fused_speech_step
        from meg_decoding_tpu.train.state import create_train_state
        from meg_decoding_tpu.train.steps import (
            CollateConfig,
            LossConfig,
            make_train_step,
        )

        cfg, raw = gw
        cfg.seq2seq = True
        ds = build_gwilliams_dataset(cfg, *raw, split_mode="shallow")
        loc = normalize_locations(synthetic_cap_locations(12))
        model = BrainEncoder(loc=loc, num_subjects=ds.num_subjects, D1=8,
                             D2=12, F=16, K=3, seq2seq=True)
        opt = optax.adam(1e-3)
        lc = LossConfig(kind="clip")
        cc = CollateConfig(baseline_len_samp=60, clamp_lim=20.0)
        seg = jnp.asarray(ds.segment_table())
        idx = jnp.arange(8)
        key = jax.random.PRNGKey(5)

        # manual: replicate the fused step's internal sampling exactly
        sess = jax.random.randint(key, (8,), 0, ds.recordings.shape[0])
        X, Y, subs = _gather_batch(ds.recordings, ds.y_stream, ds.meg_onsets,
                                   ds.speech_onsets, ds.session_subject,
                                   seg[idx][:, 0], seg[idx][:, 1], sess,
                                   ds.seq_len)
        state0 = create_train_state(model, opt, (X, Y, subs),
                                    jax.random.PRNGKey(0))
        step = make_train_step(model, opt, lc, cc, donate=False)
        manual_state, manual_m = step(state0, X, Y, subs)

        state0b = create_train_state(model, opt, (X, Y, subs),
                                     jax.random.PRNGKey(0))
        fused = make_fused_speech_step(model, opt, lc, cc, ds)
        fused_state, fused_m = fused(state0b, idx, key)

        assert float(fused_m["loss"]) == pytest.approx(float(manual_m["loss"]),
                                                       rel=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(fused_state.params),
                        jax.tree_util.tree_leaves(manual_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)

    def test_bf16_y_gather_engages_and_matches(self, gw):
        """In bf16+CLIP mode the fused step gathers Y directly in bf16
        (VMEM cast — halves Y's HBM traffic).  The kernel-cast Y must equal
        gather-then-astype bitwise, and the bf16 fused step must train."""
        import optax

        from meg_decoding_tpu.data.gwilliams import (
            _gather_batch,
            build_gwilliams_dataset,
        )
        from meg_decoding_tpu.data.layout import (
            normalize_locations,
            synthetic_cap_locations,
        )
        from meg_decoding_tpu.models.brain_encoder import BrainEncoder
        from meg_decoding_tpu.train.scan_loop import (
            _loss_y_dtype,
            make_fused_speech_step,
        )
        from meg_decoding_tpu.train.state import create_train_state
        from meg_decoding_tpu.train.steps import CollateConfig, LossConfig

        cfg, raw = gw
        cfg.seq2seq = True
        ds = build_gwilliams_dataset(cfg, *raw, split_mode="shallow")
        seg = jnp.asarray(ds.segment_table())
        idx = jnp.arange(8)
        sess = jax.random.randint(jax.random.PRNGKey(5), (8,), 0,
                                  ds.recordings.shape[0])
        args = (ds.recordings, ds.y_stream, ds.meg_onsets, ds.speech_onsets,
                ds.session_subject, seg[idx][:, 0], seg[idx][:, 1], sess,
                ds.seq_len)
        _, Y32, _ = _gather_batch(*args)
        X16, Y16, _ = _gather_batch(*args, y_dtype=jnp.bfloat16)
        assert Y16.dtype == jnp.bfloat16 and X16.dtype == jnp.float32
        np.testing.assert_array_equal(
            np.asarray(Y16, dtype=np.float32),
            np.asarray(Y32.astype(jnp.bfloat16), dtype=np.float32))

        loc = normalize_locations(synthetic_cap_locations(12))
        model = BrainEncoder(loc=loc, num_subjects=ds.num_subjects, D1=8,
                             D2=12, F=16, K=3, seq2seq=True,
                             dtype=jnp.bfloat16)
        lc = LossConfig(kind="clip")
        assert _loss_y_dtype(model, lc) == jnp.bfloat16
        assert _loss_y_dtype(model, LossConfig(kind="mse")) is None
        opt = optax.adam(1e-3)
        example = (jnp.zeros((8,) + X16.shape[1:]),
                   jnp.zeros((8,) + Y32.shape[1:]), jnp.zeros((8,), jnp.int32))
        state = create_train_state(model, opt, example, jax.random.PRNGKey(0))
        fused = make_fused_speech_step(
            model, opt, lc, CollateConfig(baseline_len_samp=60,
                                          clamp_lim=20.0), ds)
        losses = []
        for i in range(3):
            state, m = fused(state, idx, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        assert np.all(np.isfinite(losses))


class TestCachedCollateStats:
    """Epoch-invariant RobustScaler-fit cache (compute_collate_stats +
    collate_preprocess_cached): the cached path computes the same sklearn
    fit as the inline per-step sort — identical up to XLA's per-program FMA
    contraction of the percentile lerp (≤2 ulp on the IQR)."""

    def _setup(self, gw):
        import optax

        from meg_decoding_tpu.data.gwilliams import build_gwilliams_dataset
        from meg_decoding_tpu.data.layout import (
            normalize_locations,
            synthetic_cap_locations,
        )
        from meg_decoding_tpu.models.brain_encoder import BrainEncoder
        from meg_decoding_tpu.train.steps import CollateConfig, LossConfig

        cfg, raw = gw
        cfg.seq2seq = True
        ds = build_gwilliams_dataset(cfg, *raw, split_mode="shallow")
        loc = normalize_locations(synthetic_cap_locations(12))
        model = BrainEncoder(loc=loc, num_subjects=ds.num_subjects, D1=8,
                             D2=12, F=16, K=3, seq2seq=True)
        # SGD, not Adam: updates are LINEAR in the gradients, so the <=2 ulp
        # IQR difference between the sweep and inline programs stays at ulp
        # scale in the params (Adam's g/sqrt(v) normalization would amplify
        # a near-zero gradient's ulp flip into a full +-lr step)
        return (ds, model, optax.sgd(1e-2), LossConfig(kind="clip"),
                CollateConfig(baseline_len_samp=60, clamp_lim=20.0))

    def test_stats_table_matches_manual_fit(self, gw):
        """Every (session, task, word) row of the swept table equals
        robust_stats of the manually-sliced baseline-corrected window."""
        from meg_decoding_tpu.data.gwilliams import (
            build_gwilliams_dataset,
            compute_collate_stats,
        )
        from meg_decoding_tpu.ops.scaling import baseline_correct, robust_stats

        cfg, raw = gw
        ds = build_gwilliams_dataset(cfg, *raw, split_mode="shallow")
        stats = np.asarray(compute_collate_stats(ds, baseline_len_samp=60,
                                                 chunk=64))
        S, NT, W = ds.meg_onsets.shape
        # flat row table: chunk-padded tail rows, lane-padded stat halves
        from meg_decoding_tpu.data.gwilliams import stats_lane_pad

        Cp = stats_lane_pad(ds.recordings.shape[2])
        assert stats.shape[1] == 2 * Cp
        assert stats.shape[0] == -(-S * NT * W // 64) * 64
        L = int(ds.seq_len)
        rec = np.asarray(ds.recordings)
        T = rec.shape[-1]
        ons = np.asarray(ds.meg_onsets)
        rng = np.random.RandomState(0)
        for _ in range(12):  # random spot checks across the grid
            s, t, w = rng.randint(S), rng.randint(NT), rng.randint(W)
            o = min(max(int(ons[s, t, w]), 0), T - L)
            win = jnp.asarray(rec[s, t, :, o:o + L][None])
            med, iqr = robust_stats(baseline_correct(win, 60), axis=-1,
                                    impl="sort")
            # median is an exact order statistic -> bitwise; the IQR lerp
            # may differ by FMA contraction across programs (<=2 ulp);
            # flat table rows are (2·Cp,): median at [:C], IQR at [Cp:Cp+C]
            C = rec.shape[2]
            row = stats[(s * NT + t) * W + w]
            np.testing.assert_array_equal(row[:C], np.asarray(med[0]))
            np.testing.assert_allclose(row[Cp:Cp + C], np.asarray(iqr[0]),
                                       rtol=5e-7, atol=1e-8)

    def test_fused_cached_equals_inline_bitwise(self, gw):
        """Fused step with cache_collate_stats=True: same training
        trajectory as the inline-sort fused step with the same keys (equal
        to ulp-level numerics)."""
        from meg_decoding_tpu.train.scan_loop import make_fused_speech_step
        from meg_decoding_tpu.train.state import create_train_state

        ds, model, opt, lc, cc = self._setup(gw)
        example = gather_speech_batch(ds, np.arange(8), jax.random.PRNGKey(9))
        state_a = create_train_state(model, opt, example[:3],
                                     jax.random.PRNGKey(0))
        state_b = create_train_state(model, opt, example[:3],
                                     jax.random.PRNGKey(0))
        inline = make_fused_speech_step(model, opt, lc, cc, ds)
        cached = make_fused_speech_step(model, opt, lc, cc, ds,
                                        cache_collate_stats=True)
        assert cached.collate_stats is not None
        assert inline.collate_stats is None
        for i in range(3):
            idx = jnp.arange(8) + i
            key = jax.random.PRNGKey(100 + i)
            state_a, ma = inline(state_a, idx, key)
            state_b, mb = cached(state_b, idx, key)
            assert float(ma["loss"]) == pytest.approx(float(mb["loss"]),
                                                      rel=1e-6), i
        for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                        jax.tree_util.tree_leaves(state_b.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_scan_epoch_cached_equals_inline(self, gw):
        """Whole-epoch scan with the stats cache: same metrics and params as
        the inline-sort scan epoch (same keys)."""
        from meg_decoding_tpu.train.scan_loop import make_gwilliams_scan_epoch
        from meg_decoding_tpu.train.state import create_train_state

        ds, model, opt, lc, cc = self._setup(gw)
        example = gather_speech_batch(ds, np.arange(8), jax.random.PRNGKey(9))
        state_a = create_train_state(model, opt, example[:3],
                                     jax.random.PRNGKey(0))
        state_b = create_train_state(model, opt, example[:3],
                                     jax.random.PRNGKey(0))
        inline = make_gwilliams_scan_epoch(model, opt, lc, cc, ds,
                                           updates=4, batch_size=8)
        cached = make_gwilliams_scan_epoch(model, opt, lc, cc, ds,
                                           updates=4, batch_size=8,
                                           cache_collate_stats=True)
        key = jax.random.PRNGKey(3)
        state_a, ma = inline(state_a, key)
        state_b, mb = cached(state_b, key)
        assert float(ma["loss"]) == pytest.approx(float(mb["loss"]),
                                                  rel=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                        jax.tree_util.tree_leaves(state_b.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_trainer_cli_engages_cache(self, gw, tmp_path):
        """cache_collate_stats=true through the public trainer config."""
        cfg, _ = gw
        cfg = TestSpeechE2E()._speech_cfg(cfg, str(tmp_path / "out"))
        cfg.seq2seq = True
        cfg.data_parallel = False
        cfg.fuse_gather = True
        cfg.cache_collate_stats = True
        from meg_decoding_tpu.cli.train_speech import run

        best = run(cfg)
        assert np.isfinite(best.get("train_loss", np.nan))
        assert best.get("test_top10", 0) > 0
