"""Pallas kernel tests (interpret mode on the CPU test mesh).

Oracle: plain-JAX/numpy implementations, following the reference's
oracle-testing pattern (SURVEY §4).

Note: a fused Pallas CLIP-loss kernel existed in round 1 but was retired —
on-chip benchmarking showed XLA's automatic fusion of the (B, B) logits GEMM
+ log-softmax already matches it (the op is one trivially-fused matmul), so
the kernel was dead weight.  The lesson is recorded in RESULTS.md; the
window gather below is the Pallas kernel that actually beats XLA (19×).
"""

import numpy as np

import jax.numpy as jnp


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

    def test_out_dtype_casts_in_kernel(self):
        """out_dtype=bf16 must equal gather-then-astype bitwise (the cast
        moves into VMEM, it must not change values)."""
        from meg_decoding_tpu.ops.pallas.window_gather import (
            pad_time_for_gather,
            window_gather,
        )

        rng = np.random.RandomState(2)
        T = pad_time_for_gather(700, 96)
        src = rng.randn(3, 16, T).astype(np.float32)
        rec_ids = jnp.array([2, 0, 1, 2])
        onsets = jnp.array([3, 130, 0, 411])
        f32 = window_gather(jnp.array(src), rec_ids, onsets, 96,
                            interpret=True)
        b16 = window_gather(jnp.array(src), rec_ids, onsets, 96,
                            interpret=True, out_dtype=jnp.bfloat16)
        assert b16.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(b16, dtype=np.float32),
            np.asarray(f32.astype(jnp.bfloat16), dtype=np.float32))


class TestRobustQuantiles:
    """Bisection order-statistic kernel (ops/pallas/quantile.py) vs the
    sorted-path percentiles and sklearn (interpret mode on CPU)."""

    def test_matches_sorted_path(self):
        import jax.numpy as jnp

        from meg_decoding_tpu.ops.pallas.quantile import robust_quantiles
        from meg_decoding_tpu.ops.scaling import _percentile_sorted

        rng = np.random.RandomState(0)
        for T in (360, 7, 1, 2, 128, 359, 100):
            x = (rng.randn(300, T) * rng.lognormal(size=(300, 1))).astype(np.float32)
            x[0] = x[0][0]  # constant row
            if T > 4:       # heavy duplicates
                x[1, : T // 2] = 3.0
                x[1, T // 2:] = -2.0
            got = np.asarray(robust_quantiles(jnp.asarray(x), interpret=True))
            xs = jnp.sort(jnp.asarray(x), axis=-1)
            want = np.stack(
                [np.asarray(_percentile_sorted(xs, q)) for q in (25., 50., 75.)], 1)
            # order statistics are exact; the final f32 blend may differ by
            # 1 ulp depending on FMA contraction
            np.testing.assert_allclose(got, want, rtol=3e-7, atol=1e-7)

    def test_integral_rank_is_bit_exact(self):
        import jax.numpy as jnp

        from meg_decoding_tpu.ops.pallas.quantile import robust_quantiles

        rng = np.random.RandomState(1)
        T = 201  # (T-1) divisible by 4 -> all three ranks integral
        x = (rng.randn(128, T) * 100).astype(np.float32)
        got = np.asarray(robust_quantiles(jnp.asarray(x), interpret=True))
        want = np.sort(x, axis=1)[:, [50, 100, 150]]
        np.testing.assert_array_equal(got, want)

    def test_robust_scale_pallas_impl_matches_sklearn(self):
        import jax.numpy as jnp

        from sklearn.preprocessing import RobustScaler

        from meg_decoding_tpu.ops.scaling import robust_scale

        rng = np.random.RandomState(2)
        X = rng.randn(4, 12, 360).astype(np.float32) * 5
        got = np.asarray(robust_scale(jnp.asarray(X), axis=-1, impl="pallas"))
        for b in range(X.shape[0]):
            expect = RobustScaler().fit_transform(X[b].T).T
            np.testing.assert_allclose(got[b], expect, rtol=2e-4, atol=1e-5)

    def test_extremes_and_negatives(self):
        import jax.numpy as jnp

        from meg_decoding_tpu.ops.pallas.quantile import robust_quantiles

        # sign-flip key mapping: negatives, zeros of both signs, infinities
        x = np.array([[-np.inf, -5.0, -0.0, 0.0, 2.5, np.inf, 1e-38, -1e38]],
                     np.float32)
        got = np.asarray(robust_quantiles(jnp.asarray(x), interpret=True))
        want = np.percentile(x.astype(np.float64), [25, 50, 75], axis=1).T
        np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-6)
