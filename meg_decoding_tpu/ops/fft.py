"""Arbitrary-length FFTs that stay fast on TPU.

XLA's TPU FFT is only efficient at power-of-two sizes; other lengths lower to
a dense DFT **matmul** (observed: a 405000² f32 allocation = 656 GB for one
Gwilliams-length rfft).  These helpers keep scipy-exact arbitrary-length
semantics by computing non-pow2 transforms with **Bluestein's chirp-z
algorithm**: three power-of-two FFTs of size m = next_pow2(2n−1).

Chirp phases use k² mod 2n in int64 on the host so float32 stays accurate at
n ≈ 10⁶.  Complex intermediates are (rows, m) c64; callers with huge batches
should chunk rows (``resample.py`` does).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["rfft_any", "irfft_any", "fft_any", "ifft_any"]


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def _is_pow2(n: int) -> bool:
    return n & (n - 1) == 0


@lru_cache(maxsize=64)
def _bluestein_consts(n: int):
    """(chirp (n,), b_fft (m//2? no — (m,) c64)) for length-n Bluestein."""
    m = _next_pow2(2 * n - 1)
    k = np.arange(n, dtype=np.int64)
    # exp(-iπ k²/n); reduce k² mod 2n first for float accuracy at large n
    phase = np.pi * ((k * k) % (2 * n)) / n
    chirp = np.exp(-1j * phase).astype(np.complex64)  # a_k multiplier
    b = np.zeros(m, dtype=np.complex64)
    b[:n] = np.conj(chirp)
    b[m - n + 1 :] = np.conj(chirp[1:][::-1])
    b_fft = np.fft.fft(b).astype(np.complex64)
    # numpy only — jnp arrays must not be cached across jit traces
    return chirp, b_fft, m


@partial(jax.jit, static_argnames=("n",))
def fft_any(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Complex FFT of length n along the last axis (pow2-fast on TPU)."""
    x = x[..., :n].astype(jnp.complex64)
    if x.shape[-1] < n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])])
    if _is_pow2(n):
        return jnp.fft.fft(x)
    chirp_np, b_fft_np, m = _bluestein_consts(n)
    chirp = jnp.asarray(chirp_np)
    b_fft = jnp.asarray(b_fft_np)
    a = x * chirp
    A = jnp.fft.fft(a, n=m)
    y = jnp.fft.ifft(A * b_fft)[..., :n]
    return y * chirp


@partial(jax.jit, static_argnames=("n",))
def ifft_any(X: jnp.ndarray, n: int) -> jnp.ndarray:
    return jnp.conj(fft_any(jnp.conj(X), n)) / n


@partial(jax.jit, static_argnames=("n",))
def rfft_any(x: jnp.ndarray, n: int | None = None) -> jnp.ndarray:
    """Real FFT along the last axis; arbitrary length, TPU-safe."""
    if n is None:
        n = x.shape[-1]
    if _is_pow2(n):
        if x.shape[-1] != n:
            pad = n - x.shape[-1]
            x = x[..., :n] if pad < 0 else jnp.pad(
                x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        return jnp.fft.rfft(x)
    return fft_any(x, n)[..., : n // 2 + 1]


@partial(jax.jit, static_argnames=("n",))
def irfft_any(X: jnp.ndarray, n: int) -> jnp.ndarray:
    """Inverse real FFT to length n; arbitrary length, TPU-safe."""
    if _is_pow2(n):
        return jnp.fft.irfft(X, n=n)
    # rebuild the full hermitian spectrum then complex inverse; zero-pad the
    # half-spectrum when it is shorter than n//2+1 (upsampling)
    half = X[..., : n // 2 + 1]
    if half.shape[-1] < n // 2 + 1:
        half = jnp.pad(half, [(0, 0)] * (X.ndim - 1)
                       + [(0, n // 2 + 1 - half.shape[-1])])
    if n % 2 == 0:
        tail = jnp.conj(half[..., 1:-1][..., ::-1])
    else:
        tail = jnp.conj(half[..., 1:][..., ::-1])
    full = jnp.concatenate([half, tail], axis=-1)
    return jnp.real(ifft_any(full, n))
