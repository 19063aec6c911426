"""Scan-epoch tests: the single-program epoch must train equivalently to the
per-step loop and work for both packed-dataset styles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from meg_decoding_tpu.data.gwilliams import build_gwilliams_dataset, load_gwilliams_cache
from meg_decoding_tpu.data.packed import PackedDataset
from meg_decoding_tpu.models.eegnet import LinearEncoder
from meg_decoding_tpu.train.scan_loop import make_gwilliams_scan_epoch, make_scan_epoch
from meg_decoding_tpu.train.state import create_train_state
from meg_decoding_tpu.train.steps import CollateConfig, LossConfig, make_train_step

from tests.fixtures import make_gwilliams_cache


def _toy(n=64, C=6, T=12, F=16, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, C, T).astype(np.float32)
    W = rng.randn(C, F).astype(np.float32)
    Y = (X.mean(-1) @ W).astype(np.float32)
    return PackedDataset(X=jnp.array(X), Y=jnp.array(Y),
                         subject_idxs=jnp.array(rng.randint(0, 2, n)),
                         num_subjects=2)


class TestScanEpoch:
    def test_learns(self):
        ds = _toy()
        model = LinearEncoder(scp=True, out_dim=16)
        opt = optax.adam(1e-2)
        state = create_train_state(model, opt, ds.gather(np.arange(16)),
                                   jax.random.PRNGKey(0))
        epoch = make_scan_epoch(model, opt, LossConfig(kind="clip"),
                                CollateConfig(enabled=False), ds,
                                updates=20, batch_size=16)
        key = jax.random.PRNGKey(1)
        state, m0 = epoch(state, key)
        for i in range(4):
            state, m = epoch(state, jax.random.fold_in(key, i))
        assert float(m["loss"]) < float(m0["loss"]) * 0.5
        assert float(m["top10"]) > float(m0["top10"])

    def test_matches_per_step_loop_statistically(self):
        """Same updates/batch distribution → comparable final loss."""
        ds = _toy(seed=1)
        model = LinearEncoder(scp=True, out_dim=16)
        opt = optax.adam(1e-2)

        def run_scan():
            state = create_train_state(model, opt, ds.gather(np.arange(16)),
                                       jax.random.PRNGKey(0))
            epoch = make_scan_epoch(model, opt, LossConfig(kind="clip"),
                                    CollateConfig(enabled=False), ds, 30, 16)
            state, m = epoch(state, jax.random.PRNGKey(2))
            return float(m["loss"])

        def run_loop():
            state = create_train_state(model, opt, ds.gather(np.arange(16)),
                                       jax.random.PRNGKey(0))
            step = make_train_step(model, opt, LossConfig(kind="clip"),
                                   CollateConfig(enabled=False), donate=False)
            rng = np.random.RandomState(0)
            losses = []
            for _ in range(30):
                idx = rng.randint(0, len(ds), 16)
                state, m = step(state, *ds.gather(idx))
                losses.append(float(m["loss"]))
            return float(np.mean(losses))

        a, b = run_scan(), run_loop()
        # different random index streams, same distribution → same ballpark
        assert a == pytest.approx(b, rel=0.5)

    def test_sharded_matches_single_device(self):
        """GOD-style scan-epoch under a 4-device mesh == the same epoch on
        one device: data is replicated so the sampled batches are identical;
        equality holds to float-reduction tolerance (sharded-CLIP psum)."""
        from meg_decoding_tpu.core.mesh import make_mesh, replicated

        ds = _toy(seed=3)
        mesh = make_mesh(n_data=4, devices=jax.devices("cpu")[:4])
        model = LinearEncoder(scp=True, out_dim=16)
        opt = optax.sgd(1e-2)
        lc, cc = LossConfig(kind="clip"), CollateConfig(enabled=False)
        updates, bs = 4, 16
        key = jax.random.PRNGKey(11)

        def init():
            return create_train_state(model, opt, ds.gather(np.arange(16)),
                                      jax.random.PRNGKey(0))

        epoch_m = make_scan_epoch(model, opt, lc, cc, ds, updates, bs,
                                  mesh=mesh)
        state_m = jax.device_put(init(), replicated(mesh))
        state_m, mm = epoch_m(state_m, key)

        epoch_s = make_scan_epoch(model, opt, lc, cc, ds, updates, bs)
        state_s, ms = epoch_s(init(), key)

        np.testing.assert_allclose(float(mm["loss"]), float(ms["loss"]),
                                   rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(state_m.params),
                        jax.tree_util.tree_leaves(state_s.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-6)

    def test_gwilliams_scan_epoch(self, tmp_path):
        cfg = make_gwilliams_cache(str(tmp_path / "cache"))
        cfg.seq2seq = True
        packed = build_gwilliams_dataset(cfg, *load_gwilliams_cache(str(tmp_path / "cache")),
                                         split_mode="shallow")
        from meg_decoding_tpu.models.brain_encoder import BrainEncoder
        from meg_decoding_tpu.data.layout import normalize_locations, synthetic_cap_locations

        loc = normalize_locations(synthetic_cap_locations(12))
        model = BrainEncoder(loc=loc, num_subjects=packed.num_subjects,
                             D1=8, D2=12, F=16, K=3, seq2seq=True)
        opt = optax.adam(1e-3)
        from meg_decoding_tpu.data.gwilliams import gather_speech_batch

        example = gather_speech_batch(packed, np.arange(8), jax.random.PRNGKey(0))[:3]
        state = create_train_state(model, opt, example, jax.random.PRNGKey(0))
        epoch = make_gwilliams_scan_epoch(
            model, opt, LossConfig(kind="clip"),
            CollateConfig(baseline_len_samp=60, clamp_lim=20.0), packed,
            updates=5, batch_size=8)
        state, metrics = epoch(state, jax.random.PRNGKey(3))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 5
