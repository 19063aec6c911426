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
