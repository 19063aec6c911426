"""Robust scaling, clamping, baseline correction, epoching — the batch-time
preprocessing chain, as jit-able XLA ops.

Reference semantics:
* ``scaleAndClamp`` / ``scaleAndClamp_single`` (``preproc_utils.py:69-105``):
  sklearn ``RobustScaler`` fit per sample — center by the per-channel
  **median** over time, scale by the per-channel **IQR** (25–75th
  percentiles), then clamp to ±clamp_lim.  The reference refits sklearn on
  every batch on the host (``gwilliams2022.py:654-662``) — a major hot spot;
  here it is one fused device op (sort-based percentiles over time).
* ``baseline_correction_single`` (``preproc_utils.py:128-142``): subtract the
  per-channel mean of the first ``baseline_len_samp`` samples of each chunk.
  (Note: ``GODCollator`` has a dead variant using the *last* samples,
  ``god.py:207-221``; the live path calls the imported 'first' version.)
* epoching (``god.py:99-108``; ``gwilliams2022.py:139``): slice fixed-length
  windows at onset indices — here a single gather, vmap-able and shardable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "robust_scale",
    "robust_stats",
    "apply_robust_stats",
    "scale_and_clamp",
    "baseline_correct",
    "epoch_slice",
    "collate_preprocess",
    "collate_preprocess_cached",
]


def _percentile_sorted(xs: jnp.ndarray, q: float) -> jnp.ndarray:
    """Linear-interpolated percentile along the last axis of pre-sorted data
    (numpy 'linear' method — what sklearn RobustScaler uses)."""
    n = xs.shape[-1]
    pos = q / 100.0 * (n - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo
    return xs[..., lo] * (1 - frac) + xs[..., hi] * frac


def robust_stats(x: jnp.ndarray, axis: int = -1,
                 impl: str = "auto") -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-slice RobustScaler fit along ``axis``: returns ``(median, iqr)``
    with the near-zero-IQR fallback already applied (sklearn
    ``_handle_zeros_in_scale``: ``scale < 10·eps`` → 1.0 — an exact ``== 0``
    test would divide a quantization-noise channel by a ~1e-7 IQR and blow
    it up to the clamp limit instead of leaving it centered).

    ``impl``: 'sort' = lane-axis sort + interpolated percentiles;
    'pallas' = the bisection order-statistic kernel
    (``ops/pallas/quantile.py`` — same values to ≤1 ulp).  'auto' = 'sort':
    measured on v5e inside the fused bf16 step the kernel is +0.1 ms vs the
    keys-only unstable sort (tools/ablate_kernels.py; the lane-axis
    reductions of 96 bisection passes cost about what the sorting network
    does), so the kernel stays an opt-in experiment.  'sort' is also
    required under auto-spmd with a batch-sharded ``x`` (no partitioning
    rule for the Pallas call; the train step forces it when a mesh is
    active).
    """
    x_moved = jnp.moveaxis(x, axis, -1)
    use_pallas = impl == "pallas" and x_moved.dtype == jnp.float32 \
        and x_moved.ndim >= 2
    if use_pallas:
        from meg_decoding_tpu.ops.pallas.quantile import robust_quantiles

        lead = x_moved.shape[:-1]
        flat = x_moved.reshape((-1, x_moved.shape[-1]))
        qs = robust_quantiles(flat, interpret=jax.default_backend() != "tpu")
        q25 = qs[:, 0].reshape(lead)
        med = qs[:, 1].reshape(lead)
        q75 = qs[:, 2].reshape(lead)
    else:
        # keys-only unstable sort: jnp.sort's default stable sort makes XLA
        # carry an s32 iota companion through the whole (B, C, T) sort —
        # measured 2× the cost on v5e (tools/profile_step.py); percentiles
        # don't need stability (equal keys are interchangeable)
        (xs,) = jax.lax.sort((x_moved,), dimension=x_moved.ndim - 1,
                             is_stable=False)
        med = _percentile_sorted(xs, 50.0)
        q25 = _percentile_sorted(xs, 25.0)
        q75 = _percentile_sorted(xs, 75.0)
    iqr = q75 - q25
    iqr = jnp.where(iqr < 10 * jnp.finfo(x.dtype).eps, 1.0, iqr)
    return med, iqr


def apply_robust_stats(x: jnp.ndarray, med: jnp.ndarray, iqr: jnp.ndarray,
                       axis: int = -1) -> jnp.ndarray:
    """``(x − med) / iqr`` broadcast along ``axis`` — the elementwise half of
    ``robust_scale``, usable with PRE-COMPUTED stats (``robust_stats``).  The
    arithmetic (subtract, then true divide) is kept identical to
    ``robust_scale`` so cached-stats scaling is bit-exact with the inline
    path."""
    x_moved = jnp.moveaxis(x, axis, -1)
    scaled = (x_moved - med[..., None]) / iqr[..., None]
    return jnp.moveaxis(scaled, -1, axis)


def robust_scale(x: jnp.ndarray, axis: int = -1,
                 impl: str = "auto") -> jnp.ndarray:
    """(x − median) / IQR along ``axis`` (RobustScaler semantics) — fit
    (``robust_stats``) + transform (``apply_robust_stats``) fused in one
    call; see ``robust_stats`` for the ``impl`` choices."""
    med, iqr = robust_stats(x, axis=axis, impl=impl)
    x_moved = jnp.moveaxis(x, axis, -1)
    scaled = (x_moved - med[..., None]) / iqr[..., None]
    return jnp.moveaxis(scaled, -1, axis)


@partial(jax.jit, static_argnames=("clamp", "impl"))
def scale_and_clamp(X: jnp.ndarray, clamp_lim: float, clamp: bool = True,
                    impl: str = "auto") -> jnp.ndarray:
    """Per-sample, per-channel robust scale over time + clamp.

    X: (..., C, T).  Mirrors ``scaleAndClamp`` (fit per leading index over
    the time axis) fused into one op.
    """
    out = robust_scale(X, axis=-1, impl=impl)
    if clamp:
        out = jnp.clip(out, -clamp_lim, clamp_lim)
    return out


@partial(jax.jit, static_argnames=("baseline_len_samp",))
def baseline_correct(X: jnp.ndarray, baseline_len_samp: int) -> jnp.ndarray:
    """Subtract the mean of the first ``baseline_len_samp`` samples, per
    channel per chunk.  X: (..., C, T)."""
    baseline = jnp.mean(X[..., :baseline_len_samp], axis=-1, keepdims=True)
    return X - baseline


def epoch_slice(x: jnp.ndarray, onsets: jnp.ndarray, length: int) -> jnp.ndarray:
    """Gather fixed-length windows: x (C, T), onsets (N,) → (N, C, length).

    Replaces the reference's Python epoching loop (``god.py:102-107``).  On
    TPU this routes through the Pallas DMA window-gather kernel (XLA lowers
    data-dependent window gathers to pathologically slow general gathers —
    see ``ops/pallas/window_gather.py``); elsewhere it is one advanced
    gather.  Onsets are clamped to [0, T-length] (a window overhanging the
    recording end shifts left into range) — identical on both backends.
    """
    T = x.shape[-1]
    onsets = jnp.clip(onsets.astype(jnp.int32), 0, max(T - length, 0))

    if jax.default_backend() == "tpu":
        from meg_decoding_tpu.ops.pallas.window_gather import (
            pad_time_for_gather,
            window_gather,
        )

        Tp = pad_time_for_gather(T, length)
        xp = jnp.pad(x, ((0, 0), (0, Tp - T)))[None]  # (1, C, Tp)
        rec_ids = jnp.zeros(onsets.shape[0], jnp.int32)
        return window_gather(xp, rec_ids, onsets, length, interpret=False)

    idx = onsets[:, None] + jnp.arange(length)[None, :]  # (N, length)
    return jnp.take(x, idx, axis=-1).transpose(1, 0, 2)  # (C,N,L) → (N,C,L)


def collate_preprocess(
    X: jnp.ndarray, baseline_len_samp: int, clamp_lim: float,
    clamp: bool = True, quantile_impl: str = "auto"
) -> jnp.ndarray:
    """The jitted collate kernel: baseline correction → robust scale → clamp.

    Replaces ``Gwilliams2022Collator``/``GODCollator`` (``gwilliams2022.py:
    641-662``, ``god.py:178-205``) which refit sklearn scalers on the host
    per batch.  X: (B, C, T).
    """
    if baseline_len_samp > 0:
        X = baseline_correct(X, baseline_len_samp)
    return scale_and_clamp(X, clamp_lim, clamp, impl=quantile_impl)


def collate_preprocess_cached(
    X: jnp.ndarray, med: jnp.ndarray, iqr: jnp.ndarray,
    baseline_len_samp: int, clamp_lim: float, clamp: bool = True
) -> jnp.ndarray:
    """``collate_preprocess`` with PRE-COMPUTED robust-scale stats.

    The Gwilliams batch windows are epoch-invariant — a window is fully
    determined by (session, task, word index), so its RobustScaler fit
    (median/IQR of the baseline-corrected window, per channel) never
    changes across epochs.  Caching the fit (``compute_collate_stats`` in
    ``data/gwilliams.py``) removes the per-step (B, C, T) sort — the single
    most expensive non-matmul op in the traced bf16 step (~5.3 ms at B=256,
    tools/trace_step.py) — leaving only the elementwise transform.

    Exactness: ``med``/``iqr`` are produced by ``robust_stats`` on the
    identical baseline-corrected window bits, and the per-step baseline
    subtraction + ``(X − med) / iqr`` arithmetic matches ``robust_scale``
    op for op.  The only deviation from the inline path is compiler fusion:
    XLA may contract the percentile interpolation's multiply-adds into FMAs
    differently in the sweep program than in the step program, shifting the
    IQR by ≤2 ulp (~1e-7 relative on the scaled output) — semantically the
    same sklearn fit.

    X: (B, C, T); med/iqr: (B, C).
    """
    if baseline_len_samp > 0:
        X = baseline_correct(X, baseline_len_samp)
    out = apply_robust_stats(X, med, iqr, axis=-1)
    if clamp:
        out = jnp.clip(out, -clamp_lim, clamp_lim)
    return out
