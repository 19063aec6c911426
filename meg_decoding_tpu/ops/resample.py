"""FFT-domain resampling (MNE ``mne.filter.resample`` equivalent).

Reference call sites: ``mne.filter.resample(ROI_MEG_Data, down=fs/120)``
(``god.py:134``), ``resample(x, down=1000/120)`` (``gwilliams2022.py:258-261``),
``resample(embeddings, up=rate)`` for wav2vec outputs
(``gwilliams2022.py:370-374``, ``brennan2018.py:197-201``).

MNE resamples by FFT: transform, truncate or zero-pad the spectrum to the new
length, inverse transform, rescale.  Same here, on device, batched over all
leading axes.  Output length follows MNE: ``ceil(T * up / down)``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resample_fft", "resample_len"]


def resample_len(n: int, up: float = 1.0, down: float = 1.0) -> int:
    return int(np.ceil(n * up / down))


@partial(jax.jit, static_argnames=("new_len",))
def _resample_to(x: jnp.ndarray, new_len: int) -> jnp.ndarray:
    """scipy.signal.resample real-input semantics: truncate/zero-pad the
    one-sided spectrum with unpaired-Nyquist-bin compensation."""
    T = x.shape[-1]
    X = jnp.fft.rfft(x)
    m = min(new_len, T)  # number of relevant frequency bins
    m2 = m // 2 + 1
    Xr = X[..., :m2]
    if m % 2 == 0 and new_len != T:
        # unpaired bin at m//2: doubled when downsampling, halved when up
        factor = 2.0 if new_len < T else 0.5
        Xr = Xr.at[..., m // 2].multiply(factor)
    y = jnp.fft.irfft(Xr, n=new_len)
    return (y * (new_len / T)).astype(x.dtype)


def resample_fft(x: jnp.ndarray, up: float = 1.0, down: float = 1.0) -> jnp.ndarray:
    """Resample along the last axis by rational/real factor up/down."""
    new_len = resample_len(x.shape[-1], up, down)
    return _resample_to(x, new_len)
