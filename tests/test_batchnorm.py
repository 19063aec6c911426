"""FusedBatchNorm (models/layers.py + ops/pallas/batchnorm.py) vs flax
``nn.BatchNorm``: forward values, running-statistics updates, and gradients
must agree — the kernel replaces flax's materialized convert→reduce stats
with one-read Pallas accumulation but keeps the exact fast-variance
semantics."""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from meg_decoding_tpu.models.layers import FusedBatchNorm

B, T, C = 8, 24, 12


def _x(seed=0, dtype=np.float32, scale=3.0, offset=1.5):
    rng = np.random.RandomState(seed)
    return jnp.asarray((rng.randn(B, T, C) * scale + offset).astype(dtype))


def _init_and_apply(mod, x):
    variables = mod.init(jax.random.PRNGKey(0), x)
    y, upd = mod.apply(variables, x, mutable=["batch_stats"])
    return variables, y, upd["batch_stats"]


class TestFusedBatchNormSemantics:
    @pytest.mark.parametrize("impl", ["xla", "pallas"])
    def test_forward_and_running_stats_match_flax(self, impl):
        x = _x()
        ours = FusedBatchNorm(use_running_average=False, momentum=0.9,
                              impl=impl)
        ref = nn.BatchNorm(use_running_average=False, momentum=0.9)
        _, y0, bs0 = _init_and_apply(ours, x)
        _, y1, bs1 = _init_and_apply(ref, x)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(bs0["mean"]),
                                   np.asarray(bs1["mean"]), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(bs0["var"]),
                                   np.asarray(bs1["var"]), rtol=1e-5)

    @pytest.mark.parametrize("impl", ["xla", "pallas"])
    def test_gradients_match_flax(self, impl):
        """dx, dscale, dbias of a scalar loss through training-mode BN (the
        custom VJP's correction terms vs flax autodiff)."""
        x = _x(seed=1)
        ours = FusedBatchNorm(use_running_average=False, impl=impl)
        ref = nn.BatchNorm(use_running_average=False)
        v0 = ours.init(jax.random.PRNGKey(0), x)
        v1 = ref.init(jax.random.PRNGKey(0), x)

        def loss(params, mod, variables, xx):
            y, _ = mod.apply({**variables, "params": params}, xx,
                             mutable=["batch_stats"])
            # non-trivial downstream fn so dx isn't just dy
            return jnp.sum(jnp.sin(y) * jnp.arange(C))

        g0p, g0x = jax.grad(loss, argnums=(0, 3))(v0["params"], ours, v0, x)
        g1p, g1x = jax.grad(loss, argnums=(0, 3))(v1["params"], ref, v1, x)
        np.testing.assert_allclose(np.asarray(g0x), np.asarray(g1x),
                                   rtol=2e-4, atol=1e-6)
        for k in ("scale", "bias"):
            np.testing.assert_allclose(np.asarray(g0p[k]), np.asarray(g1p[k]),
                                       rtol=2e-4, atol=1e-6)

    def test_eval_mode_uses_running_stats(self):
        x = _x(seed=2)
        # warm the running stats with one training pass, then compare eval
        ours_t = FusedBatchNorm(use_running_average=False)
        ref_t = nn.BatchNorm(use_running_average=False)
        v0, _, bs0 = _init_and_apply(ours_t, x)
        v1, _, bs1 = _init_and_apply(ref_t, x)
        ours_e = FusedBatchNorm(use_running_average=True)
        ref_e = nn.BatchNorm(use_running_average=True)
        y0 = ours_e.apply({"params": v0["params"], "batch_stats": bs0}, x)
        y1 = ref_e.apply({"params": v1["params"], "batch_stats": bs1}, x)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   rtol=1e-5, atol=1e-6)

    def test_bf16_activation(self):
        """bf16 input: stats in f32, output rounded once to bf16 — values
        within bf16 resolution of the f32 reference."""
        xf = _x(seed=3)
        xb = xf.astype(jnp.bfloat16)
        ours = FusedBatchNorm(use_running_average=False, dtype=jnp.bfloat16,
                              impl="pallas", momentum=0.9)
        ref = nn.BatchNorm(use_running_average=False, momentum=0.9)
        _, y0, bs0 = _init_and_apply(ours, xb)
        _, y1, bs1 = _init_and_apply(ref, xf)
        assert y0.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(y0, np.float32),
                                   np.asarray(y1), rtol=2e-2, atol=2e-2)
        # stats computed from the bf16 activation, accumulated in f32
        np.testing.assert_allclose(np.asarray(bs0["mean"]),
                                   np.asarray(bs1["mean"]), rtol=1e-2,
                                   atol=1e-2)

    def test_param_and_collection_names_match_flax(self):
        """Transplant compatibility: same pytree structure as nn.BatchNorm
        (checkpoints and the torch-parity transplants keep working)."""
        x = _x()
        v0 = FusedBatchNorm(use_running_average=False).init(
            jax.random.PRNGKey(0), x)
        v1 = nn.BatchNorm(use_running_average=False).init(
            jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)

    def test_stats_kernels_match_reductions(self):
        """The raw Pallas kernels (interpret mode) vs plain f32 sums,
        including the partial-last-block row masking."""
        from meg_decoding_tpu.ops.pallas.batchnorm import bn_bwd_stats, bn_stats

        rng = np.random.RandomState(4)
        for M in (1000, 1024, 7):  # non-multiple, exact, tiny
            x = jnp.asarray(rng.randn(M, C).astype(np.float32))
            g = jnp.asarray(rng.randn(M, C).astype(np.float32))
            s, ss = bn_stats(x, block_rows=256, interpret=True)
            np.testing.assert_allclose(np.asarray(s), np.asarray(x.sum(0)),
                                       rtol=1e-5, atol=1e-4)
            np.testing.assert_allclose(np.asarray(ss),
                                       np.asarray((x * x).sum(0)),
                                       rtol=1e-5, atol=1e-4)
            mean = x.mean(0)
            invstd = jax.lax.rsqrt(x.var(0) + 1e-5)
            sg, sgx = bn_bwd_stats(g, x, mean, invstd, block_rows=256,
                                   interpret=True)
            xhat = (x - mean) * invstd
            np.testing.assert_allclose(np.asarray(sg), np.asarray(g.sum(0)),
                                       rtol=1e-5, atol=1e-4)
            np.testing.assert_allclose(np.asarray(sgx),
                                       np.asarray((g * xhat).sum(0)),
                                       rtol=1e-5, atol=1e-4)
