"""Pallas kernel tests (interpret mode on the CPU test mesh).

Oracle: the plain-JAX implementations in objectives/clip.py, following the
reference's oracle-testing pattern (SURVEY §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meg_decoding_tpu.objectives.clip import clip_loss
from meg_decoding_tpu.ops.pallas.clip_loss import fused_clip_loss


def _xy(B=16, D=100, seed=0):
    rng = np.random.RandomState(seed)
    return (jnp.array(rng.randn(B, D).astype(np.float32)),
            jnp.array(rng.randn(B, D).astype(np.float32)))


class TestFusedClipLoss:
    @pytest.mark.parametrize("B,D", [(16, 100), (8, 1024), (32, 2000), (13, 50)])
    def test_forward_matches_reference(self, B, D):
        x, y = _xy(B, D, seed=B + D)
        temp = jnp.asarray(2.0)
        got = float(fused_clip_loss(x, y, temp, interpret=True))
        expect = float(clip_loss(x, y, temp))
        assert got == pytest.approx(expect, rel=1e-4)

    def test_forward_seq2seq_shape(self):
        rng = np.random.RandomState(3)
        x = jnp.array(rng.randn(8, 16, 36).astype(np.float32))
        y = jnp.array(rng.randn(8, 16, 36).astype(np.float32))
        got = float(fused_clip_loss(x, y, jnp.asarray(1.0), interpret=True))
        expect = float(clip_loss(x, y, jnp.asarray(1.0)))
        assert got == pytest.approx(expect, rel=1e-4)

    def test_gradients_match_reference(self):
        x, y = _xy(16, 200, seed=7)
        temp = jnp.asarray(1.5)

        gx, gy, gt = jax.grad(
            lambda a, b, t: fused_clip_loss(a, b, t, interpret=True),
            argnums=(0, 1, 2))(x, y, temp)
        ex, ey, et = jax.grad(
            lambda a, b, t: clip_loss(a, b, t), argnums=(0, 1, 2))(x, y, temp)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(ex), rtol=1e-3,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(gy), np.asarray(ey), rtol=1e-3,
                                   atol=1e-6)
        assert float(gt) == pytest.approx(float(et), rel=1e-3)

    def test_sum_reduction(self):
        x, y = _xy(8, 64, seed=9)
        got = float(fused_clip_loss(x, y, jnp.asarray(0.5), reduction="sum",
                                    interpret=True))
        expect = float(clip_loss(x, y, jnp.asarray(0.5), reduction="sum"))
        assert got == pytest.approx(expect, rel=1e-4)

    def test_jit_and_value_and_grad(self):
        x, y = _xy(16, 128, seed=11)

        @jax.jit
        def step(x, y, t):
            return jax.value_and_grad(
                lambda a: fused_clip_loss(a, y, t, interpret=True))(x)

        loss, g = step(x, y, jnp.asarray(5.1))
        assert np.isfinite(float(loss))
        assert np.all(np.isfinite(np.asarray(g)))


class TestWindowGather:
    """Pallas scalar-prefetch DMA window gather (interpret mode oracle)."""

    def test_matches_host_slices(self):
        from meg_decoding_tpu.ops.pallas.window_gather import (
            pad_time_for_gather,
            window_gather,
        )

        rng = np.random.RandomState(0)
        T = pad_time_for_gather(900, 96)
        src = rng.randn(5, 24, T).astype(np.float32)
        rec_ids = np.array([4, 0, 2, 2, 1, 3])
        onsets = np.array([0, 1, 127, 128, 555, 804])  # crosses lane bounds
        out = np.asarray(window_gather(jnp.array(src), jnp.array(rec_ids),
                                       jnp.array(onsets), 96, interpret=True))
        expect = np.stack([src[r, :, o:o+96] for r, o in zip(rec_ids, onsets)])
        np.testing.assert_allclose(out, expect, atol=1e-5)

    def test_out_of_range_onset_clamped(self):
        from meg_decoding_tpu.ops.pallas.window_gather import (
            pad_time_for_gather,
            window_gather,
        )

        rng = np.random.RandomState(1)
        T = pad_time_for_gather(500, 64)
        src = rng.randn(2, 8, T).astype(np.float32)
        out = np.asarray(window_gather(jnp.array(src), jnp.array([0]),
                                       jnp.array([10**6]), 64, interpret=True))
        assert np.all(np.isfinite(out))
