"""Pallas exact-percentile kernel: per-row median/quartiles without a sort.

The collate chain's RobustScaler (``ops/scaling.py``, reference
``preproc_utils.py:69-105``) needs three interpolated percentiles (25/50/75)
per (sample, channel) row over the ~360-sample time axis.  XLA lowers
``jnp.percentile`` through a full lane-axis sort — a sorting network costing
~1.4 ms per (64, 208, 360) batch on v5e (tools/profile_step.py), dominated by
compute, not HBM.

A percentile only needs a handful of ORDER STATISTICS, and an exact order
statistic can be found by **bisection on the value space**: map each float to
a sign-flipped int32 key (the total order XLA's own float sort uses — NaNs
beyond ±inf), then binary-search the 32-bit key space; each of the 32
iterations costs one vectorized compare + lane-sum over the row.  With the
rows VMEM-resident, 3 ranks × 32 iterations touch HBM exactly once (one read
of the batch) instead of running an O(T log² T) sorting network.

Semantics match ``numpy.percentile(..., method='linear')`` — and therefore
sklearn's RobustScaler:

* the bisection returns the exact ⌊q(n−1)/100⌋-th smallest element,
  BIT-EXACTLY (it is a selection, not an approximation);
* the interpolation partner (the next order statistic) is the same value
  when it is duplicated, else the smallest strictly-greater element — also
  exact;
* the two are blended ``v_lo·(1−frac) + v_hi·frac`` in float32 — the same
  formula as the sorted-path ``_percentile_sorted``, agreeing to ≤1 ulp
  (whether XLA contracts the blend into an FMA differs between lowerings).

No VJP: the collate chain transforms DATA (not parameters) before the loss,
so nothing differentiates through it (``train/steps.py`` applies it outside
``loss_fn``).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["robust_quantiles"]

_I32_MAX = np.int32(np.iinfo(np.int32).max)
_I32_MIN = np.int32(np.iinfo(np.int32).min)


def _flip(b: jnp.ndarray) -> jnp.ndarray:
    """float32 bits (as int32) → monotonically ordered int32 keys."""
    return jnp.where(b < 0, b ^ _I32_MAX, b)


def _unflip_f32(k: jnp.ndarray) -> jnp.ndarray:
    b = jnp.where(k < 0, k ^ _I32_MAX, k)
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def _kernel(x_ref, out_ref, keys_ref, *, ranks_fracs):
    keys_ref[:] = _flip(jax.lax.bitcast_convert_type(x_ref[:], jnp.int32))
    keys = keys_ref[:]
    rows = keys.shape[0]

    def order_stat_key(rank: int):
        """Exact ``rank``-th smallest key per row (0-based): the smallest key
        k with count(keys ≤ k) ≥ rank+1, by 32-step bisection."""
        lo0 = jnp.full((rows, 1), _I32_MIN, jnp.int32)
        hi0 = jnp.full((rows, 1), _I32_MAX, jnp.int32)

        def body(_, lh):
            lo, hi = lh
            # overflow-safe floor((lo+hi)/2)
            mid = (lo >> 1) + (hi >> 1) + (lo & hi & 1)
            c = jnp.sum((keys <= mid).astype(jnp.int32), axis=1, keepdims=True)
            ge = c >= (rank + 1)
            return jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi)

        lo, _ = jax.lax.fori_loop(0, 32, body, (lo0, hi0))
        return lo

    for j, (rank, frac) in enumerate(ranks_fracs):
        ans = order_stat_key(rank)
        v_lo = _unflip_f32(ans)
        if frac == 0.0:
            out_ref[:, j : j + 1] = v_lo
            continue
        # interpolation partner: the (rank+1)-th order statistic — `ans`
        # again if duplicated, else the smallest strictly-greater key
        c_ans = jnp.sum((keys <= ans).astype(jnp.int32), axis=1, keepdims=True)
        nxt = jnp.min(jnp.where(keys > ans, keys, _I32_MAX), axis=1,
                      keepdims=True)
        v_hi = _unflip_f32(jnp.where(c_ans >= rank + 2, ans, nxt))
        # explicit f32 weights: the blend must round exactly like the sorted
        # path's f32 `xs[lo]·(1−frac) + xs[hi]·frac`
        w_lo = jnp.float32(1.0 - frac)
        w_hi = jnp.float32(frac)
        out_ref[:, j : j + 1] = v_lo * w_lo + v_hi * w_hi


@partial(jax.jit, static_argnames=("qs", "block_rows", "interpret"))
def robust_quantiles(x2d: jnp.ndarray, qs: tuple = (25.0, 50.0, 75.0),
                     block_rows: int = 256, interpret: bool = False):
    """Exact linear-interpolated percentiles along the last axis.

    x2d: (N, T) float32 → (N, len(qs)) float32, matching
    ``np.percentile(x2d, qs, axis=1, method='linear')`` bit-for-bit
    (including the NaNs-beyond-infinity total order of XLA's float sort).
    """
    N, T = x2d.shape
    assert x2d.dtype == jnp.float32, x2d.dtype
    ranks_fracs = []
    for q in qs:
        pos = float(q) / 100.0 * (T - 1)
        ranks_fracs.append((int(np.floor(pos)), pos - np.floor(pos)))

    grid = pl.cdiv(N, block_rows)
    return pl.pallas_call(
        partial(_kernel, ranks_fracs=tuple(ranks_fracs)),
        grid=(grid,),
        in_specs=[pl.BlockSpec((block_rows, T), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows, len(qs)), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, len(qs)), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_rows, T), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 32 * len(qs) * N * T,
            bytes_accessed=N * T * 4 + N * len(qs) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2d)
