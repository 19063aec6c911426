"""Custom-VJP batch norm with selectable statistics backends.

Motivation: the round-2 bf16 step trace showed 3.6 ms/step of
``convert_reduce`` fusions around flax ``nn.BatchNorm``'s f32 statistics
(RESULTS.md "Step profile"), suggesting XLA materializes f32 copies of the
(B, T, C) activation.  Three statistics backends were built and RACED
on-chip (tools/ablate_kernels.py, interleaved windows — RESULTS.md round 3):

* ``'xla'``    — plain f32 reductions, flax-equivalent.  **Fastest; the
  default.**  XLA's joint optimization (conv-epilogue fusion, forward/
  backward subexpression sharing) beats hand-fused stats — the trace's
  convert_reduce time is mostly unavoidable activation traffic.
* ``'pallas'`` — one-read kernels accumulating channel sums in f32 VMEM
  (``bn_stats`` / ``bn_bwd_stats`` below): +1.4 ms/step (≈20 small
  pallas_call launches per step outweigh the convert savings).
* ``'mxu'``    — statistics as MXU matmuls (Σx = ones@x, Σx² = diag(xᵀx),
  bf16 reads, f32 accumulation): +1.7 ms/step (breaks the same fusions).

All three compute exactly flax's fast-variance semantics
(``var = E[x²] − E[x]²``, biased) inside one ``jax.custom_vjp``; the
non-default backends are kept as oracle-tested, documented experiments —
the same policy as the retired fused CLIP kernel (RESULTS.md "Notes").

Numerics vs ``nn.BatchNorm``: identical formula, f32 accumulation; the only
deviation is that the affine output is computed in f32 and rounded ONCE to
the compute dtype, where flax rounds the intermediates to bf16 (ours is
strictly more accurate; PARITY.md "Known deviations").

Sharding: 'xla' and 'mxu' partition under auto-spmd (synced-BN via psum);
the Pallas kernels have no partitioning rule — keep the default under a
mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bn_stats", "bn_bwd_stats", "batch_norm_train"]


def _row_mask(i, block_rows: int, M: int):
    rows = jax.lax.broadcasted_iota(jnp.int32, (block_rows, 1), 0)
    return rows + i * block_rows < M


def _stats_kernel(x_ref, out_ref, *, M):
    i = pl.program_id(0)
    xs = x_ref[:].astype(jnp.float32)
    xs = jnp.where(_row_mask(i, xs.shape[0], M), xs, 0.0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[0:1, :] += jnp.sum(xs, axis=0, keepdims=True)
    out_ref[1:2, :] += jnp.sum(xs * xs, axis=0, keepdims=True)


def bn_stats(x2d: jnp.ndarray, block_rows: int = 1024, interpret: bool = False):
    """x2d (M, C) any float dtype → (Σx, Σx²) each (C,) float32, reading x
    once (converts stay in registers)."""
    M, C = x2d.shape
    block_rows = min(block_rows, M)
    out = pl.pallas_call(
        partial(_stats_kernel, M=M),
        grid=(pl.cdiv(M, block_rows),),
        in_specs=[pl.BlockSpec((block_rows, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * M * C, bytes_accessed=M * C * x2d.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x2d)
    return out[0], out[1]


def _bwd_kernel(g_ref, x_ref, mi_ref, out_ref, *, M):
    i = pl.program_id(0)
    gs = g_ref[:].astype(jnp.float32)
    xs = x_ref[:].astype(jnp.float32)
    mask = _row_mask(i, gs.shape[0], M)
    gs = jnp.where(mask, gs, 0.0)
    # mask x as well: garbage padding rows can hold inf/NaN, and 0·inf from
    # the masked g would still poison the sums
    xs = jnp.where(mask, xs, 0.0)
    xhat = (xs - mi_ref[0:1, :]) * mi_ref[1:2, :]

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[0:1, :] += jnp.sum(gs, axis=0, keepdims=True)
    out_ref[1:2, :] += jnp.sum(gs * xhat, axis=0, keepdims=True)


def bn_bwd_stats(g2d: jnp.ndarray, x2d: jnp.ndarray, mean: jnp.ndarray,
                 invstd: jnp.ndarray, block_rows: int = 1024,
                 interpret: bool = False):
    """(Σg, Σg·x̂) per channel in one read of (g, x).  mean/invstd: (C,)."""
    M, C = x2d.shape
    block_rows = min(block_rows, M)
    mi = jnp.stack([mean, invstd], axis=0)  # (2, C) f32
    out = pl.pallas_call(
        partial(_bwd_kernel, M=M),
        grid=(pl.cdiv(M, block_rows),),
        in_specs=[
            pl.BlockSpec((block_rows, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=6 * M * C,
            bytes_accessed=2 * M * C * x2d.dtype.itemsize, transcendentals=0),
        interpret=interpret,
    )(g2d, x2d, mi)
    return out[0], out[1]


def _resolve_impl(impl: str, dtype) -> str:
    """'auto' → plain 'xla' reductions — the MEASURED best on v5e.

    tools/ablate_kernels.py (interleaved windows, bf16 fused step, RESULTS.md
    round 3): vs flax-style XLA reductions, the Pallas stats kernels are
    +1.4 ms/step and the MXU dot_general formulation (Σx = ones@x,
    Σx² = diag(xᵀx), one bf16 read each) is +1.7 ms/step.  Both break the
    joint optimization XLA applies around an ordinary reduce (epilogue
    fusion with the preceding conv, shared subexpressions with the
    backward), which is worth more than the converts they save — the
    round-2 trace's ``convert_reduce`` time is mostly unavoidable
    activation traffic, not waste.  'pallas' and 'mxu' stay available as
    documented experiments (same semantics, oracle-tested)."""
    if impl != "auto":
        return impl
    return "xla"


def _mxu_colsums(a, b):
    """column dot products Σ_m a[m,c]·b[m,c] as the DIAGONAL of aᵀb — one
    (C, C) MXU matmul with f32 accumulation that reads the bf16 operands
    directly (C=320: ~4.7 GFLOP ≈ 25 µs on v5e, vs a materialized f32
    convert of the whole (M, C) activation on the VPU path)."""
    g = jax.lax.dot_general(a, b, dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return jnp.diagonal(g)


def _mxu_stats(x2):
    M = x2.shape[0]
    ones = jnp.ones((1, M), x2.dtype)
    s = jnp.dot(ones, x2, preferred_element_type=jnp.float32)[0]
    ss = _mxu_colsums(x2, x2)
    return s, ss


def _fwd_stats(x, impl: str):
    C = x.shape[-1]
    M = x.size // C
    x2 = x.reshape(M, C)
    impl = _resolve_impl(impl, x.dtype)
    if impl == "pallas":
        s, ss = bn_stats(x2, interpret=jax.default_backend() != "tpu")
    elif impl == "mxu":
        s, ss = _mxu_stats(x2)
    else:
        xf = x2.astype(jnp.float32)
        s, ss = jnp.sum(xf, axis=0), jnp.sum(xf * xf, axis=0)
    return s, ss, M


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def batch_norm_train(x, scale, bias, eps: float, impl: str = "auto"):
    """Training-mode batch norm over all leading axes of ``x`` (features
    last), flax fast-variance semantics.  Returns ``(y, mean, var)`` — mean
    and biased var are for the caller's running-statistics update (their
    cotangents are handled exactly, so differentiating through them is also
    correct)."""
    y, mean, var, _ = _bn_fwd_impl(x, scale, bias, eps, impl)
    return y, mean, var


def _bn_fwd_impl(x, scale, bias, eps, impl):
    s, ss, M = _fwd_stats(x, impl)
    mean = s / M
    var = ss / M - mean * mean  # flax use_fast_variance (biased)
    invstd = jax.lax.rsqrt(var + eps)
    a = scale * invstd  # (C,) f32
    b = bias - mean * a
    y = (x * a + b).astype(x.dtype)  # elementwise; converts fuse in registers
    return y, mean, var, invstd


def _bn_fwd(x, scale, bias, eps, impl):
    y, mean, var, invstd = _bn_fwd_impl(x, scale, bias, eps, impl)
    return (y, mean, var), (x, scale, mean, invstd)


def _bn_bwd(eps, impl, res, cots):
    x, scale, mean, invstd = res
    gy, gmean, gvar = cots
    C = x.shape[-1]
    M = x.size // C
    rimpl = _resolve_impl(impl, x.dtype)
    if rimpl == "pallas":
        sg, sgx = bn_bwd_stats(gy.reshape(M, C), x.reshape(M, C), mean,
                               invstd, interpret=jax.default_backend() != "tpu")
    elif rimpl == "mxu":
        g2, x2 = gy.reshape(M, C), x.reshape(M, C)
        ones = jnp.ones((1, M), g2.dtype)
        sg = jnp.dot(ones, g2, preferred_element_type=jnp.float32)[0]
        # Σ g·x̂ = (Σ g·x − mean·Σ g)·invstd — the cross term is one more
        # MXU diagonal, so the backward reads g and x in bf16 once each
        sgx = (_mxu_colsums(g2, x2) - mean * sg) * invstd
    else:
        gf = gy.reshape(M, C).astype(jnp.float32)
        xhat2 = (x.reshape(M, C).astype(jnp.float32) - mean) * invstd
        sg = jnp.sum(gf, axis=0)
        sgx = jnp.sum(gf * xhat2, axis=0)
    xhat = (x - mean) * invstd  # broadcast f32; fuses into the dx chain
    dx = (scale * invstd) * (gy - sg / M - xhat * (sgx / M))
    # exact contributions of the mean/var outputs (zero when the caller only
    # feeds them to the running-stats update)
    dx = dx + gmean / M + gvar * 2.0 * (x - mean) / M
    return dx.astype(x.dtype), sgx, sg


batch_norm_train.defvjp(_bn_fwd, _bn_bwd)
