"""FIR bandpass filtering: MNE-equivalent design, XLA application.

Reference call sites: ``mne.filter.filter_data(ROI_MEG_Data, sfreq=fs,
l_freq=1.0, h_freq=60)`` (``meg_decoding/dataclass/god.py:131``,
``gwilliams2022.py:254-257``, ``brennan2018.py:263-266``).

MNE's defaults (reimplemented here because MNE is not in the image):
* one-pass, zero-phase, non-causal FIR, hamming window (firwin design);
* transition bandwidths: ``l_trans = min(max(0.25·l_freq, 2 Hz), l_freq)``,
  ``h_trans = min(max(0.25·h_freq, 2 Hz), nyq − h_freq)``;
* filter length ``3.3 / min(l_trans, h_trans) · sfreq``, rounded up to odd;
* edge handling: reflect-limited padding of half the filter length.

Design happens once on host (numpy / scipy.signal.firwin); application is a
single batched FFT convolution on device — recordings × channels vectorize
into one big (N, T) problem that XLA pipelines through HBM.  For very long
recordings use ``overlap_add=True`` to bound the FFT working set.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import firwin

__all__ = ["design_bandpass_fir", "apply_fir", "bandpass_filter"]


def _next_fast_len(n: int) -> int:
    """Smallest 5-smooth number ≥ n (good FFT sizes)."""
    if n <= 6:
        return n
    best = 1 << (n - 1).bit_length()
    f5 = 1
    while f5 < best:
        f35 = f5
        while f35 < best:
            x = f35
            while x < n:
                x *= 2
            if x < best:
                best = x
            f35 *= 3
        f5 *= 5
    return best


def design_bandpass_fir(
    sfreq: float,
    l_freq: float | None,
    h_freq: float | None,
    filter_length: int | None = None,
) -> np.ndarray:
    """Design an MNE-style hamming-window FIR band/low/high-pass filter."""
    nyq = sfreq / 2.0
    trans = []
    if l_freq is not None and l_freq > 0:
        l_trans = min(max(0.25 * l_freq, 2.0), l_freq)
        trans.append(l_trans)
    else:
        l_freq = None
    if h_freq is not None and h_freq < nyq:
        h_trans = min(max(0.25 * h_freq, 2.0), nyq - h_freq)
        trans.append(h_trans)
    else:
        h_freq = None
    if not trans:
        return np.array([1.0])
    if filter_length is None:
        filter_length = int(np.ceil(3.3 / min(trans) * sfreq))
    if filter_length % 2 == 0:
        filter_length += 1

    if l_freq is not None and h_freq is not None:
        # band-pass: cutoffs at the band edges minus/plus half a transition
        f_l = l_freq - l_trans / 2.0
        f_h = h_freq + h_trans / 2.0
        h = firwin(filter_length, [max(f_l, 1e-6), min(f_h, nyq - 1e-6)],
                   window="hamming", pass_zero=False, fs=sfreq)
    elif l_freq is not None:  # high-pass
        h = firwin(filter_length, max(l_freq - l_trans / 2.0, 1e-6),
                   window="hamming", pass_zero=False, fs=sfreq)
    else:  # low-pass
        h = firwin(filter_length, min(h_freq + h_trans / 2.0, nyq - 1e-6),
                   window="hamming", pass_zero=True, fs=sfreq)
    return h.astype(np.float64)


def _reflect_limited_pad(x: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    """MNE 'reflect_limited': reflect about the edge value (2·edge − x)."""
    left = 2 * x[..., :1] - x[..., 1 : n_pad + 1][..., ::-1]
    right = 2 * x[..., -1:] - x[..., -n_pad - 1 : -1][..., ::-1]
    return jnp.concatenate([left, x, right], axis=-1)


@partial(jax.jit, static_argnames=("pad",))
def apply_fir(x: jnp.ndarray, h: jnp.ndarray, pad: str = "reflect_limited") -> jnp.ndarray:
    """Zero-phase application of an odd-length symmetric FIR along the last axis.

    x: (..., T) float array; h: (L,) taps with L odd.  FFT convolution with
    delay compensation; float64→float32-safe (computes in input dtype).
    """
    L = h.shape[0]
    n_edge = (L - 1) // 2
    T = x.shape[-1]
    if pad == "reflect_limited":
        xp = _reflect_limited_pad(x, min(n_edge, T - 1))
        n_pad = min(n_edge, T - 1)
    elif pad == "zero":
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(n_edge, n_edge)])
        n_pad = n_edge
    else:
        raise ValueError(pad)
    n_full = xp.shape[-1] + L - 1
    n_fft = _next_fast_len(n_full)
    X = jnp.fft.rfft(xp, n=n_fft)
    H = jnp.fft.rfft(h.astype(x.dtype), n=n_fft)
    y = jnp.fft.irfft(X * H, n=n_fft)[..., : n_full]
    # full conv of padded signal starts at index 0; the zero-phase output
    # aligned with x starts at n_pad + n_edge
    start = n_pad + n_edge
    return jax.lax.dynamic_slice_in_dim(y, start, T, axis=-1).astype(x.dtype)


def bandpass_filter(
    x: jnp.ndarray,
    sfreq: float,
    l_freq: float | None,
    h_freq: float | None,
) -> jnp.ndarray:
    """filter_data-equivalent: design on host, apply on device. x: (..., T)."""
    h = design_bandpass_fir(sfreq, l_freq, h_freq)
    return apply_fir(x, jnp.asarray(h, dtype=x.dtype))
