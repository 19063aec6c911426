"""Reliability tests: per-step non-finite guard and deterministic resume.

VERDICT round-1 items 5 and 9: a NaN batch must not poison training (skip the
update, count it), and a resumed run must replay the exact batches — random
subject/session pairing included — that a continuous run would have.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from meg_decoding_tpu.data.layout import normalize_locations, synthetic_cap_locations
from meg_decoding_tpu.models.brain_encoder import BrainEncoder
from meg_decoding_tpu.train.state import create_train_state
from meg_decoding_tpu.train.steps import (
    CollateConfig,
    LossConfig,
    make_train_step,
)

from tests.fixtures import make_gwilliams_cache


def _tiny_setup(B=8, C=8, T=24, F=16):
    loc = normalize_locations(synthetic_cap_locations(C))
    model = BrainEncoder(loc=loc, num_subjects=2, D1=8, D2=12, F=F, K=4)
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.randn(B, C, T), jnp.float32)
    Y = jnp.asarray(rng.randn(B, F), jnp.float32)
    subs = jnp.asarray(rng.randint(0, 2, B))
    opt = optax.adam(1e-3)
    state = create_train_state(model, opt, (X, Y, subs), jax.random.PRNGKey(0))
    step = make_train_step(model, opt, LossConfig(kind="clip"),
                           CollateConfig(baseline_len_samp=4, clamp_lim=20.0),
                           donate=False)
    return state, step, (X, Y, subs)


class TestNonFiniteGuard:
    def test_nan_batch_skips_update_and_counts(self):
        state, step, (X, Y, subs) = _tiny_setup()
        # one good step first: params must move, skipped == 0
        state1, m1 = step(state, X, Y, subs)
        assert float(m1["skipped"]) == 0.0
        assert np.isfinite(float(m1["loss"])) and float(m1["loss"]) != 0.0

        # NaN batch: params/opt state unchanged, skipped == 1, loss masked to 0
        X_bad = X.at[0, 0, 0].set(jnp.nan)
        state2, m2 = step(state1, X_bad, Y, subs)
        assert float(m2["skipped"]) == 1.0
        assert float(m2["loss"]) == 0.0
        flat1 = jax.tree_util.tree_leaves(state1.params)
        flat2 = jax.tree_util.tree_leaves(state2.params)
        for a, b in zip(flat1, flat2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state1.opt_state),
                        jax.tree_util.tree_leaves(state2.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state1.batch_stats),
                        jax.tree_util.tree_leaves(state2.batch_stats)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # step counter still advances (the batch was consumed)
        assert int(state2.step) == int(state1.step) + 1

        # training continues cleanly after the bad batch
        state3, m3 = step(state2, X, Y, subs)
        assert float(m3["skipped"]) == 0.0
        assert np.isfinite(float(m3["loss"]))
        moved = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(state2.params),
                            jax.tree_util.tree_leaves(state3.params))
        )
        assert moved

    def test_all_skipped_epoch_aborts(self, tmp_path):
        """The epoch driver aborts (state not checkpointed) when every step
        of an epoch was skipped."""
        from meg_decoding_tpu.train.loop import fit
        from meg_decoding_tpu.utils.logging import RunLogger

        state, step, (X, Y, subs) = _tiny_setup()
        X_bad = jnp.full_like(X, jnp.nan)

        class _BadLoader:
            num_subjects = 2

            def __len__(self):
                return X.shape[0]

            def gather(self, idx):
                return X_bad[np.asarray(idx) % X.shape[0]], \
                    Y[np.asarray(idx) % X.shape[0]], subs[np.asarray(idx) % X.shape[0]]

        from meg_decoding_tpu.core.config import Config

        cfg = Config({"epochs": 1, "batch_size": 4, "updates": 2,
                      "use_sampler": True, "test_size": 4})
        logger = RunLogger(str(tmp_path), run_name="bad")
        from meg_decoding_tpu.train.steps import make_eval_step

        eval_step = make_eval_step(
            _tiny_model_for_eval(), LossConfig(kind="clip"),
            CollateConfig(baseline_len_samp=4, clamp_lim=20.0))
        with pytest.raises(FloatingPointError):
            fit(cfg, _BadLoader(), _BadLoader(), state, step, eval_step, logger)


def _tiny_model_for_eval():
    loc = normalize_locations(synthetic_cap_locations(8))
    return BrainEncoder(loc=loc, num_subjects=2, D1=8, D2=12, F=16, K=4)


class TestCheckpointCorruptionResilience:
    """Double-buffered checkpoint generations (SURVEY §5.3): a corrupt or
    half-written model_last must not lose the run — restore falls back to the
    previous complete generation."""

    def _state_with_step(self, step):
        state, train, _ = _tiny_setup()
        return state.replace(step=jnp.asarray(step)), train

    def test_save_keeps_previous_generation(self, tmp_path):
        from meg_decoding_tpu.train.checkpoint import CheckpointManager

        ckpt = CheckpointManager(str(tmp_path / "ckpt"))
        state, _ = self._state_with_step(1)
        ckpt.save("model_last", state)
        state2, _ = self._state_with_step(2)
        ckpt.save("model_last", state2)
        assert os.path.isdir(str(tmp_path / "ckpt" / "model_last"))
        assert os.path.isdir(str(tmp_path / "ckpt" / "model_last.old"))
        restored = ckpt.restore("model_last", state)
        assert int(restored.step) == 2

    def test_corrupt_latest_falls_back_to_old(self, tmp_path):
        import shutil

        from meg_decoding_tpu.train.checkpoint import CheckpointManager

        ckpt = CheckpointManager(str(tmp_path / "ckpt"))
        state1, _ = self._state_with_step(1)
        ckpt.save("model_last", state1)
        state2, _ = self._state_with_step(2)
        ckpt.save("model_last", state2)

        # corrupt the newest generation the way a crash would: drop payload
        latest = str(tmp_path / "ckpt" / "model_last")
        for entry in os.listdir(latest):
            p = os.path.join(latest, entry)
            shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)

        with pytest.warns(UserWarning, match="restored generation"):
            restored = ckpt.restore("model_last", state1)
        assert int(restored.step) == 1  # previous generation's state
        assert ckpt.exists("model_last")

    def test_missing_everything_raises(self, tmp_path):
        from meg_decoding_tpu.train.checkpoint import CheckpointManager

        ckpt = CheckpointManager(str(tmp_path / "ckpt"))
        state, _ = self._state_with_step(0)
        assert not ckpt.exists("model_last")
        with pytest.raises(FileNotFoundError):
            ckpt.restore("model_last", state)

    def test_crash_mid_rotation_prefers_newer_generation(self, tmp_path):
        """Crash between the two rotation renames leaves name absent,
        .old = gen N, .new = COMPLETE gen N+1 — restore must return N+1,
        not silently fall back to N."""
        import shutil

        from meg_decoding_tpu.train.checkpoint import CheckpointManager

        ckpt = CheckpointManager(str(tmp_path / "ckpt"))
        state1, _ = self._state_with_step(1)
        ckpt.save("model_last", state1)
        state2, _ = self._state_with_step(2)
        ckpt.save("model_last", state2)
        # simulate the crash window: cur (gen 2) was written but the final
        # rename never happened
        shutil.move(str(tmp_path / "ckpt" / "model_last"),
                    str(tmp_path / "ckpt" / "model_last.new"))
        with pytest.warns(UserWarning, match="restored generation"):
            restored = ckpt.restore("model_last", state1)
        assert int(restored.step) == 2  # the newer complete generation

    def test_resume_with_only_partial_checkpoint_starts_fresh(self, tmp_path):
        """A first-ever save that crashed mid-write leaves only a partial
        .new; resume must warn and start from scratch, not die."""
        import os

        from meg_decoding_tpu.core.config import Config
        from meg_decoding_tpu.train.checkpoint import CheckpointManager
        from meg_decoding_tpu.train.loop import resume_if_requested

        ckpt = CheckpointManager(str(tmp_path / "ckpt"))
        partial = str(tmp_path / "ckpt" / "model_last.new")
        os.makedirs(partial)
        open(os.path.join(partial, "garbage"), "w").write("not a checkpoint")
        assert ckpt.exists("model_last")  # the trap the fix defuses
        state, _ = self._state_with_step(0)
        cfg = Config({"resume": True})
        with pytest.warns(UserWarning, match="starting from scratch"):
            out_state, start_epoch = resume_if_requested(
                cfg, ckpt, state, str(tmp_path))
        assert start_epoch == 0 and out_state is state


class TestSkippedStepMetricMeans:
    def test_epoch_means_exclude_skipped_steps(self):
        """Masked-to-0 metrics from skipped steps must not dilute the epoch
        means (a 50%-skipped epoch would otherwise halve the logged loss)."""
        from meg_decoding_tpu.train.loop import _mean_metrics

        hist = [
            {"loss": 2.0, "top10": 0.5, "skipped": 0.0},
            {"loss": 0.0, "top10": 0.0, "skipped": 1.0},  # masked step
            {"loss": 4.0, "top10": 0.7, "skipped": 0.0},
        ]
        m = _mean_metrics(hist)
        assert m["loss"] == pytest.approx(3.0)      # mean of VALID steps
        assert m["top10"] == pytest.approx(0.6)
        assert m["skipped"] == pytest.approx(1 / 3)  # fraction of ALL steps

    def test_all_skipped_reports_zero_not_nan(self):
        from meg_decoding_tpu.train.loop import _mean_metrics

        m = _mean_metrics([{"loss": 0.0, "skipped": 1.0}] * 3)
        assert m["loss"] == 0.0 and m["skipped"] == 1.0

    def test_scan_epoch_means_exclude_skipped(self):
        """The whole-epoch scan applies the same valid-step averaging on
        device: plant one NaN batch among good ones and check the epoch
        loss equals the mean over the good steps only."""
        import optax

        from meg_decoding_tpu.data.packed import PackedDataset
        from meg_decoding_tpu.models.eegnet import LinearEncoder
        from meg_decoding_tpu.train.scan_loop import make_scan_epoch
        from meg_decoding_tpu.train.state import create_train_state
        from meg_decoding_tpu.train.steps import (
            CollateConfig,
            LossConfig,
            make_train_step,
        )

        rng = np.random.RandomState(0)
        n, C, F = 32, 6, 8
        X = rng.randn(n, C, 12).astype(np.float32)
        X[7] = np.nan  # one poisoned sample: any batch drawing it skips
        Y = rng.randn(n, F).astype(np.float32)
        ds = PackedDataset(X=jnp.array(X), Y=jnp.array(Y),
                           subject_idxs=jnp.array(rng.randint(0, 2, n)),
                           num_subjects=2)
        model = LinearEncoder(scp=True, out_dim=F)
        opt = optax.adam(1e-3)
        state = create_train_state(model, opt, ds.gather(np.arange(8)),
                                   jax.random.PRNGKey(0))
        epoch = make_scan_epoch(model, opt, LossConfig(kind="clip"),
                                CollateConfig(enabled=False), ds,
                                updates=6, batch_size=8)
        state2, m = epoch(state, jax.random.PRNGKey(5))
        skipped = float(m["skipped"])
        if 0.0 < skipped < 1.0:  # some batches drew the NaN sample
            # loss averaged over valid steps only → finite and nonzero
            assert np.isfinite(float(m["loss"])) and float(m["loss"]) > 0.0


class TestTestPoolSweep:
    def test_pools_cover_split_exactly(self):
        from meg_decoding_tpu.train.loop import _test_pool_starts

        starts = _test_pool_starts(100, 32, sweep=True)
        assert starts == [0, 32, 64, 68]  # tail-covering final pool
        covered = set()
        for s in starts:
            covered.update(range(s, s + 32))
        assert covered == set(range(100))
        # reference behavior: one pool (train.py:223-245)
        assert _test_pool_starts(100, 32, sweep=False) == [0]
        assert _test_pool_starts(20, 32, sweep=True) == [0]
        assert _test_pool_starts(64, 32, sweep=True) == [0, 32]


class TestResumeDeterminism:
    @pytest.mark.parametrize("fuse_gather", [True, False])
    def test_straight_vs_resumed_runs_match(self, tmp_path, fuse_gather):
        """4 epochs straight == 2 epochs + resume + 2 epochs: identical
        logged metrics row-for-row (same sampled segments, same random
        subject/session pairings, same final state)."""
        cache = str(tmp_path / "cache")
        cfg_base = make_gwilliams_cache(cache)

        def _cfg(save_root, epochs, resume=False):
            from meg_decoding_tpu.core.config import Config, to_dict

            cfg = Config(to_dict(cfg_base))
            cfg.save_root = save_root
            cfg.model = "brain_encoder"
            cfg.D1 = 8
            cfg.D2 = 12
            cfg.F = 16
            cfg.K = 4
            cfg.d_drop = 0.1
            cfg.seq2seq = True
            cfg.batch_size = 8
            cfg.updates = 3
            cfg.epochs = epochs
            cfg.use_sampler = True
            cfg.test_size = 8
            cfg.lr = 1e-3
            cfg.lr_scheduler = "none"
            cfg.init_temperature = 5.1
            cfg.seed = 0
            cfg.data_parallel = False
            cfg.fuse_gather = fuse_gather
            cfg.resume = resume
            cfg.set_dotted("loss.kind", "clip")
            return cfg

        from meg_decoding_tpu.cli.train_speech import run

        run(_cfg(str(tmp_path / "straight"), epochs=4))
        run(_cfg(str(tmp_path / "resumed"), epochs=2))
        import time

        time.sleep(1.1)  # distinct run-dir timestamps
        run(_cfg(str(tmp_path / "resumed"), epochs=4, resume=True))

        def _rows(save_root):
            rows = {}
            for r in os.listdir(os.path.join(save_root, "runs")):
                p = os.path.join(save_root, "runs", r, "metrics.jsonl")
                for line in open(p):
                    row = json.loads(line)
                    rows[row["epoch"]] = row
            return rows

        a, b = _rows(str(tmp_path / "straight")), _rows(str(tmp_path / "resumed"))
        assert sorted(a) == sorted(b) == [0, 1, 2, 3]
        for e in (0, 1, 2, 3):
            for k in a[e]:
                if k.endswith("_ms"):  # wall-clock timings differ
                    continue
                assert a[e][k] == b[e][k], (e, k, a[e][k], b[e][k])
