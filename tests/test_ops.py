"""Oracle tests for the DSP ops against scipy / sklearn / numpy.

The reference relies on MNE + sklearn on the host for this chain; our XLA
implementations must match those semantics (SURVEY §7 "hard parts" #2, #3).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meg_decoding_tpu.ops.fir import apply_fir, bandpass_filter, design_bandpass_fir
from meg_decoding_tpu.ops.resample import resample_fft, resample_len
from meg_decoding_tpu.ops.scaling import (
    baseline_correct,
    collate_preprocess,
    epoch_slice,
    robust_scale,
    scale_and_clamp,
)


class TestFIR:
    def test_design_is_linear_phase_odd(self):
        h = design_bandpass_fir(1000.0, 1.0, 60.0)
        assert len(h) % 2 == 1
        np.testing.assert_allclose(h, h[::-1], atol=1e-12)  # symmetric

    def test_passband_and_stopband(self):
        fs = 500.0
        h = design_bandpass_fir(fs, 1.0, 60.0)
        from scipy.signal import freqz

        w, H = freqz(h, worN=8192, fs=fs)
        Hmag = np.abs(H)
        passband = (w > 5) & (w < 50)
        stop_hi = w > 90
        assert np.all(np.abs(Hmag[passband] - 1) < 0.01)
        assert np.all(Hmag[stop_hi] < 0.01)

    def test_per_edge_transition_widths(self):
        """MNE composes band filters from per-edge lowpass prototypes, so
        each edge rolls off over its OWN transition band: 1–60 Hz at 1 kHz
        has l_trans=1 Hz but h_trans=15 Hz (60→75 Hz).  A single firwin
        would give the high edge the 1 Hz rolloff (gain ≈ 1 at 65 Hz,
        ≈ 0 at 69 Hz) — a silent divergence from the reference
        preprocessing."""
        from scipy.signal import freqz

        fs = 1000.0
        h = design_bandpass_fir(fs, 1.0, 60.0)
        w, H = freqz(h, worN=16384, fs=fs)
        Hmag = np.abs(H)

        def gain(f):
            return float(Hmag[np.argmin(np.abs(w - f))])

        assert gain(67.5) == pytest.approx(0.5, abs=0.1)  # transition mid
        assert 0.55 < gain(64.0) < 0.95   # inside the 15 Hz rolloff…
        assert 0.05 < gain(71.0) < 0.45   # …on both sides
        assert gain(78.0) < 0.02          # past the transition
        # low edge keeps its narrow 1 Hz transition (stop 0 Hz → pass
        # 1 Hz, cutoff midpoint 0.5 Hz); the passband edge itself stays ≈ 1
        assert gain(0.5) == pytest.approx(0.5, abs=0.15)  # transition mid
        assert gain(1.0) > 0.95 and gain(2.5) > 0.99

    def test_apply_matches_scipy_zero_phase(self):
        """Oracle: direct zero-padded convolution with delay compensation."""
        rng = np.random.RandomState(0)
        T = 2000
        x = rng.randn(3, T).astype(np.float32)
        h = design_bandpass_fir(200.0, 2.0, 40.0, filter_length=101)
        got = np.asarray(apply_fir(jnp.array(x), jnp.array(h), pad="zero"))
        from scipy.signal import fftconvolve

        expect = fftconvolve(x, h[None, :], mode="same", axes=-1)
        np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-4)

    def test_reflect_limited_interior_matches_zero_pad(self):
        # away from the edges the padding mode must not matter
        rng = np.random.RandomState(1)
        x = rng.randn(2, 3000).astype(np.float32)
        h = design_bandpass_fir(200.0, 2.0, 40.0, filter_length=101)
        a = np.asarray(apply_fir(jnp.array(x), jnp.array(h), pad="zero"))
        b = np.asarray(apply_fir(jnp.array(x), jnp.array(h)))
        np.testing.assert_allclose(a[:, 200:-200], b[:, 200:-200], rtol=1e-3, atol=1e-4)

    def test_bandpass_removes_out_of_band(self):
        fs = 1000.0
        t = np.arange(int(10 * fs)) / fs
        x = (np.sin(2 * np.pi * 10 * t) + np.sin(2 * np.pi * 200 * t)).astype(np.float32)
        y = np.asarray(bandpass_filter(jnp.array(x[None]), fs, 1.0, 60.0))[0]
        mid = slice(int(2 * fs), int(8 * fs))
        # 10 Hz survives, 200 Hz dies
        ref10 = np.sin(2 * np.pi * 10 * t)[mid]
        corr = np.corrcoef(y[mid], ref10)[0, 1]
        assert corr > 0.99
        assert np.std(y[mid] - ref10 * np.dot(y[mid], ref10) / np.dot(ref10, ref10)) < 0.05


class TestResample:
    def test_matches_scipy_resample(self):
        from scipy.signal import resample as sp_resample

        rng = np.random.RandomState(2)
        x = rng.randn(4, 1200).astype(np.float64)
        new_len = resample_len(1200, down=1000 / 120)  # 1000→120 Hz
        got = np.asarray(resample_fft(jnp.array(x), down=1000 / 120))
        expect = sp_resample(x, new_len, axis=-1)
        assert got.shape == (4, new_len)
        # f32 Bluestein path: slightly looser than a direct f64 FFT
        np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-4)

    def test_upsample(self):
        from scipy.signal import resample as sp_resample

        rng = np.random.RandomState(3)
        x = rng.randn(2, 100).astype(np.float64)
        got = np.asarray(resample_fft(jnp.array(x), up=2.4))
        expect = sp_resample(x, 240, axis=-1)
        np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-4)

    def test_tone_preserved(self):
        fs, new_fs = 1000, 120
        t = np.arange(5000) / fs
        x = np.sin(2 * np.pi * 7 * t)
        y = np.asarray(resample_fft(jnp.array(x[None]), down=fs / new_fs))[0]
        t2 = np.arange(len(y)) / new_fs
        expect = np.sin(2 * np.pi * 7 * t2)
        assert np.corrcoef(y[10:-10], expect[10:-10])[0, 1] > 0.999


class TestRobustScale:
    def test_matches_sklearn(self):
        from sklearn.preprocessing import RobustScaler

        rng = np.random.RandomState(4)
        X = rng.randn(5, 8, 100).astype(np.float64) * 7 + 3  # (B, C, T)
        got = np.asarray(robust_scale(jnp.array(X), axis=-1))
        for b in range(5):
            expect = RobustScaler().fit_transform(X[b].T).T  # sklearn: samples×features
            np.testing.assert_allclose(got[b], expect, rtol=1e-5, atol=1e-7)

    def test_constant_channel_no_nan(self):
        X = jnp.ones((2, 3, 50))
        out = np.asarray(robust_scale(X))
        assert np.all(np.isfinite(out))
        np.testing.assert_allclose(out, 0.0)

    def test_clamp(self):
        rng = np.random.RandomState(5)
        X = jnp.array(rng.randn(2, 4, 60) * 100)
        out = np.asarray(scale_and_clamp(X, clamp_lim=5.0, clamp=True))
        assert out.max() <= 5.0 and out.min() >= -5.0


class TestBaselineEpoch:
    def test_baseline_correct_oracle(self):
        rng = np.random.RandomState(6)
        X = rng.randn(3, 4, 50).astype(np.float32)
        got = np.asarray(baseline_correct(jnp.array(X), 10))
        expect = X - X[..., :10].mean(-1, keepdims=True)
        np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)

    def test_epoch_slice_matches_loop(self):
        rng = np.random.RandomState(7)
        x = rng.randn(6, 500).astype(np.float32)
        onsets = np.array([0, 37, 123, 444])
        got = np.asarray(epoch_slice(jnp.array(x), jnp.array(onsets), 50))
        expect = np.stack([x[:, o : o + 50] for o in onsets])
        np.testing.assert_allclose(got, expect)

    def test_collate_matches_reference_chain(self):
        """Oracle: the exact collator chain — baseline_correction_single then
        per-sample RobustScaler + clamp (gwilliams2022.py:654-662)."""
        from sklearn.preprocessing import RobustScaler

        rng = np.random.RandomState(8)
        X = rng.randn(4, 5, 80).astype(np.float64) * 3
        got = np.asarray(collate_preprocess(jnp.array(X), baseline_len_samp=10,
                                            clamp_lim=20.0))
        Xb = X - X[..., :10].mean(-1, keepdims=True)
        for b in range(4):
            expect = RobustScaler().fit_transform(Xb[b].T).T
            expect = np.clip(expect, -20, 20)
            np.testing.assert_allclose(got[b], expect, rtol=1e-4, atol=1e-6)


class TestArbitraryLengthFFT:
    """Bluestein FFTs must match numpy exactly (TPU-safe non-pow2 path)."""

    @pytest.mark.parametrize("n", [360, 1000, 47520, 12345])
    def test_rfft_matches_numpy(self, n):
        from meg_decoding_tpu.ops.fft import rfft_any

        rng = np.random.RandomState(n % 100)
        x = rng.randn(3, n).astype(np.float32)
        got = np.asarray(rfft_any(jnp.array(x), n))
        expect = np.fft.rfft(x, axis=-1)
        np.testing.assert_allclose(got, expect, rtol=2e-4,
                                   atol=2e-3 * np.sqrt(n))

    @pytest.mark.parametrize("n", [360, 999, 4096])
    def test_irfft_roundtrip(self, n):
        from meg_decoding_tpu.ops.fft import irfft_any, rfft_any

        rng = np.random.RandomState(n % 97)
        x = rng.randn(2, n).astype(np.float32)
        back = np.asarray(irfft_any(rfft_any(jnp.array(x), n), n))
        np.testing.assert_allclose(back, x, rtol=1e-3, atol=1e-4)

    def test_long_resample_matches_scipy(self):
        """Gwilliams-scale downsample (396k → 120 Hz) via Bluestein."""
        from scipy.signal import resample as sp_resample

        rng = np.random.RandomState(0)
        T = 39600  # 1/10 scale for CPU test time; still non-pow2 Bluestein
        x = rng.randn(20, T).astype(np.float64)  # >_ROW_CHUNK → chunked path
        new_len = resample_len(T, down=1000 / 120)
        got = np.asarray(resample_fft(jnp.array(x), down=1000 / 120))
        expect = sp_resample(x, new_len, axis=-1)
        np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-4)


class TestRandomizedParamSweeps:
    """Property-style sweeps: the DSP chain must match its scipy/sklearn
    oracles across randomized lengths, rates, and shapes — not only at the
    hand-picked sizes above (guards the Bluestein/overlap-save paths against
    size-specific bugs)."""

    def test_resample_random_rates_and_lengths(self):
        from scipy.signal import resample as sp_resample

        rng = np.random.RandomState(11)
        for trial in range(6):
            T = int(rng.randint(200, 4000))
            down = float(rng.uniform(1.3, 12.0))
            x = rng.randn(2, T).astype(np.float64)
            new_len = resample_len(T, down=down)
            got = np.asarray(resample_fft(jnp.array(x), down=down))
            expect = sp_resample(x, new_len, axis=-1)
            assert got.shape == (2, new_len), (T, down)
            np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-4,
                                       err_msg=f"T={T} down={down}")

    def test_fir_random_lengths_match_scipy(self):
        from scipy.signal import fftconvolve

        rng = np.random.RandomState(12)
        for trial in range(4):
            T = int(rng.randint(500, 5000))
            taps = int(rng.choice([51, 101, 255]))
            fs = float(rng.uniform(120, 1200))
            lo = float(rng.uniform(0.5, 5.0))
            hi = float(rng.uniform(30.0, fs / 2 - 10))
            x = rng.randn(2, T).astype(np.float32)
            h = design_bandpass_fir(fs, lo, hi, filter_length=taps)
            got = np.asarray(apply_fir(jnp.array(x), jnp.array(h), pad="zero"))
            expect = fftconvolve(x, h[None, :], mode="same", axes=-1)
            np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-4,
                                       err_msg=f"T={T} taps={taps} fs={fs}")

    def test_robust_scale_random_shapes_match_sklearn(self):
        from sklearn.preprocessing import RobustScaler

        rng = np.random.RandomState(13)
        for trial in range(4):
            B = int(rng.randint(1, 5))
            C = int(rng.randint(1, 12))
            T = int(rng.randint(5, 400))
            X = rng.randn(B, C, T).astype(np.float64) * rng.uniform(0.1, 50)
            got = np.asarray(robust_scale(jnp.array(X), axis=-1))
            for b in range(B):
                expect = RobustScaler().fit_transform(X[b].T).T
                np.testing.assert_allclose(got[b], expect, rtol=1e-5,
                                           atol=1e-7,
                                           err_msg=f"B={B} C={C} T={T}")

    def test_epoch_slice_random_onsets_and_lengths(self):
        rng = np.random.RandomState(14)
        for trial in range(4):
            T = int(rng.randint(300, 2000))
            L = int(rng.randint(8, min(300, T // 2)))
            C = int(rng.randint(1, 8))
            N = int(rng.randint(1, 40))
            x = rng.randn(C, T).astype(np.float32)
            onsets = rng.randint(0, T - L, N)
            got = np.asarray(epoch_slice(jnp.array(x), jnp.array(onsets), L))
            expect = np.stack([x[:, o:o + L] for o in onsets])
            np.testing.assert_allclose(got, expect, err_msg=f"T={T} L={L}")


class TestGeluErfPoly:
    """ops/gelu.py — the f32-exact polynomial erf GELU (VERDICT r4 #3:
    reclaim the XLA-erf VPU cost on the DEFAULT path without the tanh
    accuracy deviation)."""

    def test_erf_poly_few_ulp_of_true_erf(self):
        from scipy.special import erf as erf64

        from meg_decoding_tpu.ops.gelu import erf_poly

        u = np.linspace(-6.0, 6.0, 400_001).astype(np.float32)
        got = np.asarray(erf_poly(jnp.asarray(u))).astype(np.float64)
        true = erf64(u.astype(np.float64))
        err = np.abs(got - true)
        ulp = np.maximum(np.spacing(np.abs(true).astype(np.float32)),
                         np.spacing(np.float32(0.0))).astype(np.float64)
        assert (err / ulp).max() <= 3.0, (err / ulp).max()
        # relative accuracy holds through zero (odd-poly branch)
        small = np.abs(u) < 1e-3
        rel = err[small] / np.maximum(np.abs(true[small]), 1e-30)
        assert rel.max() < 1e-6

    def test_gelu_erf_poly_matches_torch_f32(self):
        torch = pytest.importorskip("torch")

        from meg_decoding_tpu.ops.gelu import gelu_erf_poly

        rng = np.random.RandomState(0)
        x = np.concatenate([
            rng.randn(200_000).astype(np.float32) * 3.0,
            np.linspace(-10, 10, 100_001).astype(np.float32),
        ])
        got = np.asarray(gelu_erf_poly(jnp.asarray(x)))
        want = torch.nn.functional.gelu(torch.tensor(x)).numpy()
        # torch's erf is itself ~1 ulp; combined budget stays "few ulp"
        # (ulp(2.0) = 2.4e-7 — the observed max combined error ~1e-6 is
        # ~4 ulp at typical activation magnitudes)
        np.testing.assert_allclose(got, want, atol=1.5e-6, rtol=2e-6)

    def test_gelu_erf_poly_grad_matches_torch(self):
        torch = pytest.importorskip("torch")

        from meg_decoding_tpu.ops.gelu import gelu_erf_poly

        x = np.linspace(-6.0, 6.0, 20_001).astype(np.float32)
        g = np.asarray(jax.vmap(jax.grad(lambda v: gelu_erf_poly(v)))(
            jnp.asarray(x)))
        xt = torch.tensor(x, requires_grad=True)
        torch.nn.functional.gelu(xt).sum().backward()
        np.testing.assert_allclose(g, xt.grad.numpy(), atol=2e-5, rtol=1e-4)

    def test_bf16_rounds_like_torch_f32_gelu(self):
        """For bf16 activations gelu_erf_poly computes in f32 (2.5-ulp-of-
        f32 error, ~5000x below one bf16 ulp) and rounds ONCE — landing on
        the SAME bf16 value as the torch reference path (F.gelu in f32,
        then rounded) for every tested input, including the saturated
        negative tail where both paths' f32 erf rounds to exactly -1.
        (XLA's own ``jax.nn.gelu`` on bf16 evaluates erf in bf16 arithmetic
        and lands ~1 bf16 ulp off for ~40% of inputs — the polynomial path
        is strictly MORE faithful to the reference.)"""
        torch = pytest.importorskip("torch")

        from meg_decoding_tpu.ops.gelu import gelu_erf_poly

        rng = np.random.RandomState(1)
        x = (rng.randn(100_000) * 3).astype(jnp.bfloat16)
        x32 = np.asarray(x.astype(jnp.float32))
        want = torch.nn.functional.gelu(torch.tensor(x32)).numpy()
        want_bf16 = np.asarray(
            jnp.asarray(want).astype(jnp.bfloat16).astype(jnp.float32))
        got = np.asarray(gelu_erf_poly(jnp.asarray(x)).astype(jnp.float32))
        neq = got != want_bf16
        # bit-identical outside the deep-negative cancellation region,
        # where computing 0.5·x·(1+erf) in f32 loses relative precision on
        # tiny (|gelu| ≤ 3e-3) values — in TORCH'S OWN path too (its f32
        # erf error is amplified ~e^{u²} by the 1+erf cancellation there);
        # neither path is "right" beyond the absolute level, which stays
        # ≤ 5e-5 (200× below the tanh deviation's 3e-4)
        assert np.mean(neq) < 0.05, np.mean(neq)
        assert np.all(np.abs(want_bf16[neq]) <= 3e-3)
        assert np.abs(got - want_bf16).max() < 5e-5

    def test_gelu_erf_poly_cjvp_value_and_grad(self):
        """The custom-JVP wrapper is bit-identical to gelu_erf_poly in the
        forward and its hand-written tangent (Φ(x) + x·φ(x) — the same
        closed form torch autograd applies to F.gelu's backward) matches
        the torch gradient to the same tolerance as the autodiff path."""
        torch = pytest.importorskip("torch")

        from meg_decoding_tpu.ops.gelu import (gelu_erf_poly,
                                               gelu_erf_poly_cjvp)

        x = np.linspace(-6.0, 6.0, 20_001).astype(np.float32)
        xj = jnp.asarray(x)
        np.testing.assert_array_equal(np.asarray(gelu_erf_poly_cjvp(xj)),
                                      np.asarray(gelu_erf_poly(xj)))
        g = np.asarray(jax.vmap(jax.grad(gelu_erf_poly_cjvp))(xj))
        xt = torch.tensor(x, requires_grad=True)
        torch.nn.functional.gelu(xt).sum().backward()
        np.testing.assert_allclose(g, xt.grad.numpy(), atol=2e-5, rtol=1e-4)

    def test_dispatcher_and_model_flag(self):
        from meg_decoding_tpu.ops.gelu import gelu, resolve_impl

        x = jnp.asarray(np.linspace(-2, 2, 101, dtype=np.float32))
        np.testing.assert_allclose(np.asarray(gelu(x, "erf")),
                                   np.asarray(gelu(x, "erf_poly")),
                                   atol=6e-7, rtol=1e-6)
        assert resolve_impl(None, False) == "erf"
        assert resolve_impl(None, True) == "tanh"
        assert resolve_impl("erf_poly", True) == "erf_poly"
        with pytest.raises(ValueError):
            gelu(x, "nope")

    def test_brain_encoder_erf_poly_matches_erf_forward(self):
        """The full encoder under gelu_impl='erf_poly' equals the exact-erf
        forward to float tolerance — the lever changes NO parameter shapes
        and (unlike tanh) no meaningful numerics."""
        from meg_decoding_tpu.models.brain_encoder import BrainEncoder

        rng = np.random.RandomState(2)
        loc = rng.rand(8, 2).astype(np.float32) * 0.8 + 0.1
        X = rng.randn(4, 8, 24).astype(np.float32)
        subs = np.array([0, 1, 0, 1])
        outs = {}
        for impl in ("erf", "erf_poly"):
            model = BrainEncoder(loc=loc, num_subjects=2, D1=6, D2=8, F=12,
                                 K=3, d_drop=0.0, gelu_impl=impl)
            v = model.init({"params": jax.random.PRNGKey(0),
                            "spatial": jax.random.PRNGKey(1)},
                           jnp.asarray(X), jnp.asarray(subs))
            outs[impl] = np.asarray(model.apply(v, jnp.asarray(X),
                                                jnp.asarray(subs)))
        np.testing.assert_allclose(outs["erf"], outs["erf_poly"],
                                   atol=1e-5, rtol=1e-5)
