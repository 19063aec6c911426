"""Pallas windowed-gather kernel: batched (recording, onset) → window slices.

The Gwilliams training batch needs ``X[b] = recordings[rec_id_b, :,
onset_b : onset_b+L]`` — a data-dependent window per sample out of
HBM-resident continuous recordings.  XLA lowers both the vmapped
``dynamic_slice`` and advanced-indexing formulations to general gathers that
measure 170–480 ms per 64-batch on v5e.  This kernel does what the hardware
wants instead:

* grid over the batch, (rec_id, onset) tables scalar-prefetched
  (``PrefetchScalarGridSpec``);
* per sample, one contiguous async DMA of a **lane-aligned** 128·k window
  from the HBM recording into VMEM (Mosaic requires 128-aligned HBM slices);
* the ≤127-sample residual realignment as a one-hot shift matmul on the MXU
  (compiles everywhere, costs ~0.1 ms for a whole 64-batch).

Callers must pad the source's time axis so ``aligned_onset + padded_len``
stays in bounds (``pad_time_for_gather``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["window_gather", "pad_time_for_gather", "padded_window"]

_LANE = 128


def padded_window(length: int) -> int:
    """Aligned fetch size covering a length-``length`` window at any lane
    offset in [0, 128): the smallest multiple of 128 ≥ length + 127 (one
    more block would waste a 128-lane DMA column per sample)."""
    return ((length + 2 * _LANE - 2) // _LANE) * _LANE


def pad_time_for_gather(T: int, length: int) -> int:
    """Time-axis size the source must be padded to (see module docstring)."""
    W = padded_window(length)
    return ((T + W + _LANE - 1) // _LANE) * _LANE


def _kernel(rec_ids_ref, onsets_ref, src_ref, out_ref, scratch, sem, *,
            realign: str):
    b = pl.program_id(0)
    length = out_ref.shape[2]
    W = scratch.shape[1]
    onset = onsets_ref[b]
    aligned = (onset // _LANE) * _LANE
    off = onset - aligned

    copy = pltpu.make_async_copy(
        src_ref.at[rec_ids_ref[b], :, pl.ds(aligned, W)],
        scratch,
        sem,
    )
    copy.start()
    copy.wait()

    # realign by `off` ∈ [0, 128).  Two exact strategies:
    # * 'roll' (default): dynamic lane rotation + static slice — a pure VPU
    #   shuffle, ~2× faster than the matmul at C=1024 (tools/profile_step.py)
    # * 'matmul': one-hot shift matmul on the MXU.  HIGHEST precision: the
    #   default rounds inputs to bf16, turning this exact selection into a
    #   lossy copy (~1e-2 abs error observed).
    if realign == "roll":
        out_ref[0] = pltpu.roll(scratch[:], -off, 1)[:, :length].astype(
            out_ref.dtype)
    else:
        rows = jax.lax.broadcasted_iota(jnp.int32, (W, length), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (W, length), 1)
        shift = (rows == cols + off).astype(scratch.dtype)
        out_ref[0] = jax.lax.dot(scratch[:], shift,
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32
                                 ).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("length", "interpret", "realign",
                                   "out_dtype"))
def window_gather(src: jnp.ndarray, rec_ids: jnp.ndarray, onsets: jnp.ndarray,
                  length: int, interpret: bool | None = None,
                  realign: str = "roll", out_dtype=None) -> jnp.ndarray:
    """src (R, C, T), rec_ids (B,), onsets (B,) → (B, C, length).

    T must satisfy ``T ≥ pad_time_for_gather(max_onset + length, length)``
    (builders pad with zeros); onsets are clamped defensively.

    ``out_dtype`` (optional): cast the gathered window in VMEM before the
    HBM write-back.  A consumer that immediately casts (e.g. the CLIP loss
    normalizing the speech embeddings to the bf16 compute dtype) otherwise
    pays a full f32 round-trip of the batch through HBM — at B=256 seq2seq
    scale that is ~380 MB/step of avoidable traffic (tools/trace_step.py).
    The cast is a VPU convert of VMEM-resident data; values are identical to
    ``gather(...).astype(out_dtype)``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = rec_ids.shape[0]
    C, T = src.shape[1], src.shape[2]
    W = padded_window(length)
    if T < W:
        raise ValueError(
            f"src time axis {T} is too short for the aligned overfetch "
            f"({W}); pad it with pad_time_for_gather(T, length) first")
    max_onset = T - W  # aligned fetch must stay in bounds
    onsets = jnp.clip(onsets.astype(jnp.int32), 0, max_onset)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # stays in HBM
        out_specs=pl.BlockSpec((1, C, length), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((C, W), src.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        partial(_kernel, realign=realign),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C, length), out_dtype or src.dtype),
        interpret=interpret,
    )(rec_ids.astype(jnp.int32), onsets, src)
