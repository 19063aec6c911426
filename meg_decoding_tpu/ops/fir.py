"""FIR bandpass filtering: MNE-equivalent design, TPU-safe XLA application.

Reference call sites: ``mne.filter.filter_data(ROI_MEG_Data, sfreq=fs,
l_freq=1.0, h_freq=60)`` (``meg_decoding/dataclass/god.py:131``,
``gwilliams2022.py:254-257``, ``brennan2018.py:263-266``).

MNE's defaults (reimplemented here because MNE is not in the image):
* one-pass, zero-phase, non-causal FIR, hamming window (firwin design);
* transition bandwidths: ``l_trans = min(max(0.25·l_freq, 2 Hz), l_freq)``,
  ``h_trans = min(max(0.25·h_freq, 2 Hz), nyq − h_freq)``;
* filter length ``3.3 / min(l_trans, h_trans) · sfreq``, rounded up to odd;
* edge handling: reflect-limited padding of half the filter length.

Design happens once on host (scipy.signal.firwin); application is
**overlap-save convolution with power-of-two FFT blocks** — XLA's TPU FFT is
only fast at pow2 sizes (other lengths lower to a dense DFT matmul: a single
Gwilliams-length rfft tried to allocate 656 GB), and overlap-save also bounds
the working set for arbitrarily long recordings (SURVEY §5.7).  Batched over
recordings × channels; shard the leading axis over the mesh to scale.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import firwin

__all__ = ["design_bandpass_fir", "apply_fir", "bandpass_filter"]


_HAMMING_LENGTH_FACTOR = 3.3  # MNE _length_factors['hamming']


def _edge_lowpass(cutoff_hz: float, trans_hz: float, sfreq: float,
                  total_len: int) -> np.ndarray:
    """One edge's lowpass prototype, centered in a ``total_len`` buffer.

    The prototype's length — and therefore THIS edge's transition width —
    comes from this edge's own transition bandwidth
    (``round(3.3·sfreq/trans)``, odd, capped at the total length), matching
    MNE's ``_firwin_design`` which composes multi-edge filters from
    per-edge prototypes instead of giving every edge the narrowest
    transition."""
    nyq = sfreq / 2.0
    n = int(round(_HAMMING_LENGTH_FACTOR * sfreq / trans_hz))
    n += 1 - (n % 2)  # odd → symmetric, integer group delay
    n = min(n, total_len if total_len % 2 else total_len - 1)
    lp = firwin(n, np.clip(cutoff_hz, 1e-6, nyq - 1e-6), window="hamming",
                pass_zero=True, fs=sfreq)
    out = np.zeros(total_len)
    off = (total_len - n) // 2
    out[off:off + n] = lp
    return out


def design_bandpass_fir(
    sfreq: float,
    l_freq: float | None,
    h_freq: float | None,
    filter_length: int | None = None,
) -> np.ndarray:
    """Design an MNE-style hamming-window FIR band/low/high-pass filter.

    Matches ``mne.filter`` semantics: per-edge transition bandwidths
    (``0.25·f`` clamped to [2 Hz, available band]), total length from the
    NARROWEST transition, and — like MNE's ``_firwin_design`` — the filter
    is composed from per-edge lowpass prototypes (band-pass = LP(high edge)
    − LP(low edge), high-pass = δ − LP(edge)), so each edge rolls off over
    its OWN transition band.  A single full-length ``firwin`` would instead
    give the wide edge the narrow edge's rolloff — e.g. a 1–60 Hz bandpass
    at 1 kHz would cut 60→61 Hz instead of MNE's 60→75 Hz (h_trans=15), a
    silent numerical divergence from the reference preprocessing.
    """
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
        filter_length = int(np.ceil(_HAMMING_LENGTH_FACTOR / min(trans) * sfreq))
    if filter_length % 2 == 0:
        filter_length += 1

    if l_freq is not None and h_freq is not None:
        h = (_edge_lowpass(h_freq + h_trans / 2.0, h_trans, sfreq, filter_length)
             - _edge_lowpass(l_freq - l_trans / 2.0, l_trans, sfreq,
                             filter_length))
    elif l_freq is not None:  # high-pass: spectral inversion of the edge LP
        h = -_edge_lowpass(l_freq - l_trans / 2.0, l_trans, sfreq,
                           filter_length)
        h[filter_length // 2] += 1.0
    else:  # low-pass
        h = _edge_lowpass(h_freq + h_trans / 2.0, h_trans, sfreq,
                          filter_length)
    return h.astype(np.float64)


def _reflect_limited_pad(x: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    """MNE 'reflect_limited': reflect about the edge value (2·edge − x)."""
    left = 2 * x[..., :1] - x[..., 1 : n_pad + 1][..., ::-1]
    right = 2 * x[..., -1:] - x[..., -n_pad - 1 : -1][..., ::-1]
    return jnp.concatenate([left, x, right], axis=-1)


from meg_decoding_tpu.ops.fft import _next_pow2  # single shared definition


@partial(jax.jit, static_argnames=("pad",))
def apply_fir(x: jnp.ndarray, h: jnp.ndarray, pad: str = "reflect_limited") -> jnp.ndarray:
    """Zero-phase application of an odd-length symmetric FIR along the last
    axis via pow2 overlap-save.  x: (..., T); h: (L,) taps, L odd."""
    L = h.shape[0]
    n_edge = (L - 1) // 2
    T = x.shape[-1]
    if pad == "reflect_limited":
        n_pad = min(n_edge, T - 1)
        xp = _reflect_limited_pad(x, n_pad)
    elif pad == "zero":
        n_pad = n_edge
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(n_edge, n_edge)])
    else:
        raise ValueError(pad)

    # overlap-save: linear conv of xp with h, evaluated blockwise with
    # power-of-two FFTs (TPU-fast), then the zero-phase-aligned slice
    n_fft = min(max(_next_pow2(4 * L), 4096), _next_pow2(xp.shape[-1] + L - 1))
    valid = n_fft - L + 1
    start = n_pad + n_edge  # offset of the aligned output within y_lin
    n_out = start + T
    n_blocks = -(-n_out // valid)

    xz = jnp.pad(xp, [(0, 0)] * (x.ndim - 1)
                 + [(L - 1, n_blocks * valid + n_fft - (xp.shape[-1] + L - 1))])
    idx = (jnp.arange(n_blocks)[:, None] * valid + jnp.arange(n_fft)[None, :])
    frames = xz[..., idx]  # (..., n_blocks, n_fft)
    H = jnp.fft.rfft(h.astype(x.dtype), n=n_fft)
    Y = jnp.fft.irfft(jnp.fft.rfft(frames) * H, n=n_fft)
    y_lin = Y[..., L - 1 : L - 1 + valid].reshape(*x.shape[:-1], n_blocks * valid)
    return jax.lax.dynamic_slice_in_dim(y_lin, start, T, axis=-1).astype(x.dtype)


def bandpass_filter(
    x: jnp.ndarray,
    sfreq: float,
    l_freq: float | None,
    h_freq: float | None,
) -> jnp.ndarray:
    """filter_data-equivalent: design on host, apply on device. x: (..., T)."""
    h = design_bandpass_fir(sfreq, l_freq, h_freq)
    return apply_fir(x, jnp.asarray(h, dtype=x.dtype))
