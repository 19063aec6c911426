"""FFT-domain resampling (MNE ``mne.filter.resample`` equivalent), TPU-safe.

Reference call sites: ``mne.filter.resample(ROI_MEG_Data, down=fs/120)``
(``god.py:134``), ``resample(x, down=1000/120)`` (``gwilliams2022.py:258-261``),
``resample(embeddings, up=rate)`` for wav2vec outputs
(``gwilliams2022.py:370-374``, ``brennan2018.py:197-201``).

scipy.signal.resample semantics: transform, truncate/zero-pad the one-sided
spectrum (with unpaired-Nyquist compensation), inverse transform, rescale.
Arbitrary lengths use Bluestein FFTs (``ops/fft.py``) — XLA's TPU FFT is only
fast at power-of-two sizes — with complex intermediates chunked over rows to
bound memory at recording scale.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from meg_decoding_tpu.ops.fft import irfft_any, rfft_any

__all__ = ["resample_fft", "resample_len"]

_ROW_CHUNK = 16  # Bluestein intermediate is (rows, next_pow2(2n)) c64


def resample_len(n: int, up: float = 1.0, down: float = 1.0) -> int:
    """Output length for resampling ``n`` samples by ``up/down``.

    ``round`` (MNE's semantics), not ``ceil``: with a ratio constructed as
    ``target/n`` a 1-ulp float error upward would make ceil return
    ``target+1`` — resampling onto the wrong grid and silently misaligning
    e.g. EEG vs audio embeddings (brennan.py computes the ratio that way).
    """
    return int(round(n * up / down))


def _resample_rows(x2: jnp.ndarray, new_len: int) -> jnp.ndarray:
    """(rows, T) → (rows, new_len), scipy real-input semantics."""
    T = x2.shape[-1]
    X = rfft_any(x2, T)
    m = min(new_len, T)
    m2 = m // 2 + 1
    Xr = X[..., :m2]
    if m % 2 == 0 and new_len != T:
        factor = 2.0 if new_len < T else 0.5
        Xr = Xr.at[..., m // 2].multiply(factor)
    y = irfft_any(Xr, new_len)
    return (y * (new_len / T)).astype(x2.dtype)


@partial(jax.jit, static_argnames=("new_len",))
def _resample_to(x: jnp.ndarray, new_len: int) -> jnp.ndarray:
    lead = x.shape[:-1]
    T = x.shape[-1]
    x2 = x.reshape(-1, T)
    R = x2.shape[0]
    if R <= _ROW_CHUNK or (T & (T - 1) == 0 and new_len & (new_len - 1) == 0):
        out = _resample_rows(x2, new_len)
    else:
        n_chunks = -(-R // _ROW_CHUNK)
        xpad = jnp.pad(x2, ((0, n_chunks * _ROW_CHUNK - R), (0, 0)))
        blocks = xpad.reshape(n_chunks, _ROW_CHUNK, T)
        out = jax.lax.map(lambda b: _resample_rows(b, new_len), blocks)
        out = out.reshape(n_chunks * _ROW_CHUNK, new_len)[:R]
    return out.reshape(*lead, new_len)


def resample_fft(x: jnp.ndarray, up: float = 1.0, down: float = 1.0) -> jnp.ndarray:
    """Resample along the last axis by rational/real factor up/down."""
    new_len = resample_len(x.shape[-1], up, down)
    return _resample_to(x, new_len)
