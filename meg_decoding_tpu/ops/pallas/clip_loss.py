"""Fused CLIP-loss Pallas kernel.

One kernel fuses the whole loss pipeline of reference ``loss.py:86-107``:
L2 normalization of x and y, the (B, B) similarity matmul, temperature
scaling, and the symmetric cross-entropy — without materializing normalized
embeddings or intermediate logits to HBM.  For seq2seq embeddings
(D = F·T ≈ 370k floats/row) that saves two full (B, D) round-trips versus
the unfused path.

Grid runs over D blocks (TPU grids are sequential, so VMEM scratch
accumulates the Gram blocks); the last program finalizes normalization +
softmax-CE on-chip.  Backward is a custom VJP in plain JAX (one extra pass
over x/y; XLA fuses it) — forward fusion is where the bandwidth win is.

B must fit VMEM comfortably (logits (B, B) f32): B ≤ 1024.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_clip_loss"]

EPS = 1e-12
_D_BLOCK = 1024


def _kernel(x_ref, y_ref, temp_ref, nvalid_ref, loss_ref, logits_ref,
            acc_ref, xsq_ref, ysq_ref):
    i = pl.program_id(0)
    n_prog = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        xsq_ref[:] = jnp.zeros_like(xsq_ref)
        ysq_ref[:] = jnp.zeros_like(ysq_ref)

    xb = x_ref[:]  # (B, D_BLOCK)
    yb = y_ref[:]
    acc_ref[:] += jax.lax.dot_general(
        xb, yb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xsq_ref[:] += jnp.sum(xb * xb, axis=1, keepdims=True)
    ysq_ref[:] += jnp.sum(yb * yb, axis=1, keepdims=True)

    @pl.when(i == n_prog - 1)
    def _finalize():
        nvalid = nvalid_ref[0]
        B = acc_ref.shape[0]
        xn = jnp.sqrt(xsq_ref[:])  # (B, 1)
        yn = jnp.sqrt(ysq_ref[:])
        denom = jnp.maximum(xn * yn.T, EPS)
        scale = jnp.exp(temp_ref[0])
        logits = acc_ref[:] / denom * scale  # (B, B)

        row_ids = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
        valid = (row_ids < nvalid) & (col_ids < nvalid)
        diag = row_ids == col_ids
        neg_inf = jnp.float32(-1e30)
        masked = jnp.where(valid, logits, neg_inf)

        # row-wise CE with diagonal targets
        row_max = jnp.max(masked, axis=1, keepdims=True)
        row_lse = jnp.log(jnp.sum(jnp.where(valid, jnp.exp(masked - row_max), 0.0),
                                  axis=1, keepdims=True)) + row_max
        # column-wise CE (the transposed term)
        col_max = jnp.max(masked, axis=0, keepdims=True)
        col_lse = jnp.log(jnp.sum(jnp.where(valid, jnp.exp(masked - col_max), 0.0),
                                  axis=0, keepdims=True)) + col_max

        diag_vals = jnp.where(diag & valid, logits, 0.0)
        diag_sum = jnp.sum(diag_vals)
        row_lse_sum = jnp.sum(jnp.where(
            (row_ids < nvalid) & (col_ids == 0), row_lse, 0.0))
        col_lse_sum = jnp.sum(jnp.where(
            (col_ids < nvalid) & (row_ids == 0), col_lse, 0.0))
        # (CE_row + CE_col)/2, summed over valid diagonal
        loss_sum = ((row_lse_sum - diag_sum) + (col_lse_sum - diag_sum)) / 2.0
        loss_ref[0, 0] = loss_sum
        logits_ref[:] = jnp.where(valid, logits, 0.0)


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _forward(x2, y2, temp, interpret: bool):
    B, D = x2.shape
    Bp = _round_up(B, 8)
    Dp = _round_up(D, 128)
    d_block = min(_D_BLOCK, Dp)
    Dp = _round_up(Dp, d_block)
    if (Bp, Dp) != (B, D):
        x2 = jnp.pad(x2, ((0, Bp - B), (0, Dp - D)))
        y2 = jnp.pad(y2, ((0, Bp - B), (0, Dp - D)))

    grid = (Dp // d_block,)
    loss_sum, logits = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bp, d_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, d_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((Bp, Bp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Bp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bp, Bp), jnp.float32),
            pltpu.VMEM((Bp, 1), jnp.float32),
            pltpu.VMEM((Bp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x2, y2, jnp.reshape(temp, (1,)).astype(jnp.float32),
      jnp.array([B], dtype=jnp.int32))
    return loss_sum[0, 0], logits[:B, :B]


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_clip_loss_sum(x2, y2, temp, interpret):
    loss_sum, _ = _forward(x2, y2, temp, interpret)
    return loss_sum


def _fwd(x2, y2, temp, interpret):
    loss_sum, logits = _forward(x2, y2, temp, interpret)
    return loss_sum, (x2, y2, temp, logits)


def _bwd(interpret, res, g):
    x2, y2, temp, logits = res
    B = x2.shape[0]
    p_row = jax.nn.softmax(logits, axis=1)
    p_col = jax.nn.softmax(logits, axis=0)
    eye = jnp.eye(B, dtype=logits.dtype)
    G = ((p_row - eye) + (p_col - eye)) / 2.0  # d loss_sum / d logits
    scale = jnp.exp(temp)
    xn_norm = jnp.maximum(jnp.linalg.norm(x2, axis=1, keepdims=True), EPS)
    yn_norm = jnp.maximum(jnp.linalg.norm(y2, axis=1, keepdims=True), EPS)
    xn = x2 / xn_norm
    yn = y2 / yn_norm
    Gs = G * scale
    dxn = Gs @ yn
    dyn = Gs.T @ xn
    dx = (dxn - xn * jnp.sum(dxn * xn, axis=1, keepdims=True)) / xn_norm
    dy = (dyn - yn * jnp.sum(dyn * yn, axis=1, keepdims=True)) / yn_norm
    dtemp = jnp.sum(G * logits)
    return g * dx, g * dy, g * dtemp


_fused_clip_loss_sum.defvjp(_fwd, _bwd)


def fused_clip_loss(x, y, temp, reduction: str = "mean",
                    interpret: bool | None = None):
    """Drop-in fused replacement for ``objectives.clip.clip_loss``.

    x, y: (B, ...) embeddings (flattened internally); temp: scalar parameter.
    ``interpret`` defaults to True off-TPU (tests on CPU), False on TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = x.shape[0]
    x2 = x.reshape(B, -1).astype(jnp.float32)
    y2 = y.reshape(B, -1).astype(jnp.float32)
    loss_sum = _fused_clip_loss_sum(x2, y2, jnp.asarray(temp, jnp.float32),
                                    interpret)
    if reduction == "mean":
        return loss_sum / B
    return loss_sum
