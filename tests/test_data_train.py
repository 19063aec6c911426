"""Data-layer and training-loop tests: GOD builder on synthetic .mat files,
pure-function samplers, e2e fit() with checkpoint save/restore, and a
data-parallel sharded training step on the 8-device CPU mesh."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meg_decoding_tpu.core.config import Config
from meg_decoding_tpu.core.mesh import make_mesh, shard_batch
from meg_decoding_tpu.data.god import build_god_dataset, time_window
from meg_decoding_tpu.data.sampling import (
    god_cv_split,
    random_split,
    sample_with_replacement,
    shuffle_batches,
)
from meg_decoding_tpu.models.eegnet import LinearEncoder
from meg_decoding_tpu.train.checkpoint import CheckpointManager
from meg_decoding_tpu.train.loop import fit
from meg_decoding_tpu.train.schedules import make_schedule
from meg_decoding_tpu.train.state import create_train_state
from meg_decoding_tpu.train.steps import (
    CollateConfig,
    LossConfig,
    make_eval_step,
    make_train_step,
)
from meg_decoding_tpu.utils.logging import RunLogger

from tests.fixtures import make_god_fixture


@pytest.fixture(scope="module")
def god_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("god_data")
    return make_god_fixture(str(root), subjects=("sbj01", "sbj02"))


class TestSamplers:
    def test_with_replacement_shape_and_range(self):
        idx = np.asarray(sample_with_replacement(jax.random.PRNGKey(0), 100, 12, 8))
        assert idx.shape == (12, 8)
        assert idx.min() >= 0 and idx.max() < 100

    def test_shuffle_batches_partition(self):
        b = shuffle_batches(jax.random.PRNGKey(1), 50, 8, drop_last=True)
        assert b.shape == (6, 8)
        assert len(np.unique(b)) == 48  # no repeats

    def test_god_cv_split_reference_indices(self):
        tr, te = god_cv_split()
        # exact reference ranges (train_wowandb_cv.py:145-148)
        assert list(tr[:3]) == [0, 1, 2] and len(tr) == 6000
        assert 3000 in te and 6600 in te and len(te) == 1200
        assert set(tr).isdisjoint(set(te))

    def test_random_split(self):
        tr, te = random_split(jax.random.PRNGKey(2), 100, 0.8)
        assert len(tr) == 80 and len(te) == 20
        assert set(tr).isdisjoint(te)


class TestGODBuilder:
    def test_shapes_and_subjects(self, god_cfg):
        ds = build_god_dataset(god_cfg, "train")
        # 2 subjects × 20 epochs, 8 ROI channels, 0.2 s @ 100 Hz = 20 samples
        assert ds.X.shape == (40, 8, 20)
        assert ds.Y.shape == (40, 16)
        assert ds.num_subjects == 2
        assert set(np.asarray(ds.subject_idxs)) == {0, 1}
        assert ds.labels is not None and len(ds.labels) == 40

    def test_epoch_alignment(self, god_cfg):
        """Epoch windows must land exactly at trigger*rate + window.start."""
        ds = build_god_dataset(god_cfg, "train")
        assert np.all(np.isfinite(np.asarray(ds.X)))
        w = time_window(god_cfg, np.array([1.0, 2.0]), 100)
        np.testing.assert_array_equal(w, [[100, 120], [200, 220]])

    def test_normalization_stats_reused(self, god_cfg):
        cfg = Config(
            {**{k: v for k, v in god_cfg.items()}, "normalize_meg": True,
             "normalize_image_features": True}
        )
        tr = build_god_dataset(cfg, "train")
        assert tr.mean_X is not None
        va = build_god_dataset(cfg, "val", mean_X=tr.mean_X, std_X=tr.std_X,
                               mean_Y=tr.mean_Y, std_Y=tr.std_Y)
        # train self-normalized: near zero mean / unit std
        np.testing.assert_allclose(np.asarray(tr.X).mean(0), 0.0, atol=1e-4)
        assert va.X.shape[1:] == tr.X.shape[1:]

    def test_z_scoring_uses_rest_baseline(self, god_cfg):
        """``z_scoring: true`` (the shipped config_GOD.yaml default) must
        z-score each session's MEG by the rest-period per-channel mean/std
        (get_baseline on the Brainstorm Events struct array — reference
        load_meg.py:12-31); the scaled data differs from the raw build and
        stays finite (rest std > 0 in the fixture)."""
        raw = build_god_dataset(god_cfg, "train")
        cfg = Config({**{k: v for k, v in god_cfg.items()}, "z_scoring": True})
        zs = build_god_dataset(cfg, "train")
        assert zs.X.shape == raw.X.shape
        assert np.all(np.isfinite(np.asarray(zs.X)))
        assert not np.allclose(np.asarray(zs.X), np.asarray(raw.X))

    def test_val_averages_same_image_subject(self, god_cfg):
        va = build_god_dataset(god_cfg, "val")
        # fixture: 10 unique labels per subject, one epoch each → no reduction,
        # but output must be grouped by (label, subject) and sorted by label
        labels = np.asarray(va.labels)
        assert np.all(np.diff(labels) >= 0)


def _toy_sets(n=48, C=6, T=12, F=16, seed=0):
    from meg_decoding_tpu.data.packed import PackedDataset

    rng = np.random.RandomState(seed)
    X = rng.randn(n, C, T).astype(np.float32)
    W = rng.randn(C, F).astype(np.float32)
    Y = (X.mean(-1) @ W).astype(np.float32)
    subs = rng.randint(0, 2, n)
    ds = PackedDataset(X=jnp.array(X), Y=jnp.array(Y),
                       subject_idxs=jnp.array(subs), num_subjects=2)
    return ds


class TestTrainLoop:
    def test_temp_trainable_false_freezes_temperature(self):
        """``temp_trainable: false`` must leave the CLIP temperature at
        init_temperature (reference loss.py:140-143 keeps it a
        requires_grad=False tensor); true (the default) trains it."""
        import optax

        train_set = _toy_sets()
        for trainable in (False, True):
            model = LinearEncoder(scp=True, out_dim=16)
            optimizer = optax.adam(1e-2)
            example = train_set.gather(np.arange(16))
            state = create_train_state(model, optimizer, example,
                                       jax.random.PRNGKey(0),
                                       init_temperature=5.1)
            step = make_train_step(
                model, optimizer, LossConfig(kind="clip",
                                             temp_trainable=trainable),
                CollateConfig(enabled=False), donate=False)
            for i in range(3):
                X, Y, subs = train_set.gather(np.arange(i * 16, i * 16 + 16))
                state, _ = step(state, X, Y, subs)
            temp = float(state.params["loss"]["temp"])
            init = float(np.float32(5.1))
            if trainable:
                assert temp != init
            else:
                assert temp == init  # bit-exact: Adam saw a zero gradient

    def test_fit_learns_and_checkpoints(self, tmp_path):
        import optax

        train_set = _toy_sets()
        test_set = _toy_sets(n=16, seed=1)
        cfg = Config({"epochs": 3, "batch_size": 16, "updates": 8,
                      "use_sampler": True, "lr": 1e-2, "lr_scheduler": "none",
                      "test_size": 16})
        model = LinearEncoder(scp=True, out_dim=16)
        optimizer = optax.adam(1e-2)
        example = train_set.gather(np.arange(16))
        state = create_train_state(model, optimizer, example, jax.random.PRNGKey(0))
        loss_cfg = LossConfig(kind="clip")
        collate_cfg = CollateConfig(enabled=False)
        train_step = make_train_step(model, optimizer, loss_cfg, collate_cfg,
                                     donate=False)
        eval_step = make_eval_step(model, loss_cfg, collate_cfg)
        logger = RunLogger(str(tmp_path), run_name="t")
        ckpt = CheckpointManager(str(tmp_path / "ckpt"))
        state, best = fit(cfg, train_set, test_set, state, train_step, eval_step,
                          logger, ckpt)
        assert os.path.isdir(str(tmp_path / "ckpt" / "model_last"))
        # training reduced the loss vs the first epoch
        import json

        rows = [json.loads(l) for l in open(logger.path)]
        assert rows[-1]["train_loss"] < rows[0]["train_loss"]
        assert best.get("test_top10", 0) > 0

        # restore round-trip: params identical
        restored = ckpt.restore("model_last", state)
        for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                        jax.tree_util.tree_leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_schedules(self):
        cfg = Config({"lr": 1.0, "epochs": 10, "lr_scheduler": "cosine"})
        sched = make_schedule(cfg, updates_per_epoch=5)
        assert float(sched(0)) == pytest.approx(1.0)
        assert float(sched(5 * 10)) == pytest.approx(0.1)
        cfg2 = Config({"lr": 1.0, "epochs": 10, "lr_scheduler": "multistep",
                       "lr_multistep_mlstns": [0.5], "lr_step_gamma": 0.1})
        sched2 = make_schedule(cfg2, updates_per_epoch=1)
        assert float(sched2(4)) == pytest.approx(1.0)
        assert float(sched2(5)) == pytest.approx(0.1)

    def test_sharded_train_step_matches_single(self):
        """The same train step on a 4-device data mesh must produce the same
        params as on one device (DP correctness)."""
        import optax

        train_set = _toy_sets(n=32)
        model = LinearEncoder(scp=True, out_dim=16)
        optimizer = optax.adam(1e-2)
        example = train_set.gather(np.arange(8))
        loss_cfg = LossConfig(kind="clip")
        collate_cfg = CollateConfig(enabled=False)

        def run(shard):
            state = create_train_state(model, optimizer, example,
                                       jax.random.PRNGKey(0))
            step = make_train_step(model, optimizer, loss_cfg, collate_cfg,
                                   donate=False)
            batch = train_set.gather(np.arange(16))
            if shard:
                mesh = make_mesh(4, devices=jax.devices("cpu")[:4])
                batch = shard_batch(mesh, batch)
            state, metrics = step(state, *batch)
            return state, metrics

        s1, m1 = run(False)
        s2, m2 = run(True)
        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


class TestClassificationLabelOffset:
    def test_one_indexed_labels_align_with_gallery(self):
        """GOD vec_index is 1-indexed; label_offset=1 must make the
        classification loss reward predictions matching gallery[label-1]."""
        rng = np.random.RandomState(0)
        G, F_ = 10, 8
        gallery = rng.randn(G, F_).astype(np.float32)
        labels = np.array([1, 4, 9])  # 1-indexed ids (within bounds either way)
        # predictions exactly equal to the labelled gallery rows
        Z_src = gallery[labels - 1]

        from meg_decoding_tpu.train.steps import LossConfig, _compute_loss

        good = float(_compute_loss(
            LossConfig(kind="classification", label_offset=1),
            jnp.array(Z_src), None, jnp.array(labels), jnp.array(2.0),
            {"model": {}}, gallery=jnp.array(gallery), train=False)[0])
        bad = float(_compute_loss(
            LossConfig(kind="classification", label_offset=0),
            jnp.array(Z_src), None, jnp.array(labels), jnp.array(2.0),
            {"model": {}}, gallery=jnp.array(gallery), train=False)[0])
        assert good < bad  # aligned labels give (much) lower CE
        assert good < 0.5
