"""Brain encoders: the Défossez-style deep MEG/EEG encoder family.

Reference: ``meg_decoding/models.py`` — ``SubjectBlock`` (244-273),
``BrainEncoder`` (341-383), ``BrainEncoderSeq2Static`` (465-512).

Public call signature matches the reference: ``model(X, subject_idxs)`` with
``X: (B, C, T)``.  Internally everything runs time-major (B, T, C) — see
``models/layers.py`` for the rationale.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from meg_decoding_tpu.models.layers import (
    ConvBlock,
    SpatialAttention,
    SubjectLayers,
    torch_bias_init,
    torch_kernel_init,
)

__all__ = ["SubjectBlock", "BrainEncoder", "BrainEncoderSeq2Static"]


class SubjectBlock(nn.Module):
    """SpatialAttention → 1×1 conv (D1→D1) → per-subject 1×1 mix.

    Reference ``models.py:244-273``.  The middle 1×1 conv has a bias
    (torch Conv1d default); the per-subject layer does not.
    """

    loc: np.ndarray
    num_subjects: int
    D1: int = 270
    K: int = 32
    d_drop: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, X, subject_idxs, *, train: bool = False):
        X = SpatialAttention(
            loc=self.loc, D1=self.D1, K=self.K, d_drop=self.d_drop, name="spatial_attention"
        )(X, deterministic=not train)
        X = nn.Dense(features=self.D1, name="conv", dtype=self.dtype,
                     kernel_init=torch_kernel_init,
                     bias_init=torch_bias_init(self.D1))(X)
        X = SubjectLayers(num_subjects=self.num_subjects, dim=self.D1, name="subject_layer")(
            X, subject_idxs
        )
        return X


class BrainEncoder(nn.Module):
    """SubjectBlock → 5×ConvBlock → 1×1 convs → GELU; mean-pool unless seq2seq.

    Reference ``models.py:341-383``.  ``F`` becomes 1024 when the dataset was
    built with wav2vec last-4-layer features (``models.py:348``) — the caller
    resolves that and passes the final ``F`` here.
    """

    loc: np.ndarray
    num_subjects: int
    D1: int = 270
    D2: int = 320
    F: int = 512
    K: int = 32
    d_drop: float = 0.1
    seq2seq: bool = False
    num_blocks: int = 5
    dtype: jnp.dtype | None = None  # compute dtype (e.g. bf16); params f32
    bn_impl: str = "auto"  # ConvBlock FusedBatchNorm stats ('xla' under mesh)
    # tanh-approximate GELU everywhere (ConvBlocks + final projections):
    # opt-in perf deviation, see models/layers.py ConvBlock
    gelu_approximate: bool = False
    # explicit GELU impl: 'erf' | 'tanh' | 'erf_poly' (ops/gelu.py —
    # erf_poly is f32-exact to <=2.5 ulp, measured faster than XLA's erf
    # lowering); None defers to gelu_approximate
    gelu_impl: str | None = None
    # emit_f32=False keeps Z in the compute dtype (bf16) into the loss —
    # symmetric with the bf16 Y-gather cast (PARITY deviation 15); the
    # factored CLIP loss still accumulates the logits and norms in f32
    # (objectives/clip.py).  Default True: loss/metrics see f32 exactly as
    # the reference's f32 model emits.
    emit_f32: bool = True

    @nn.compact
    def __call__(self, X, subject_idxs, *, train: bool = False):
        from meg_decoding_tpu.ops.gelu import gelu as gelu_fn, resolve_impl

        gimpl = resolve_impl(self.gelu_impl, self.gelu_approximate)
        X = jnp.swapaxes(X, 1, 2)  # (B, C, T) → (B, T, C)
        X = SubjectBlock(
            loc=self.loc,
            num_subjects=self.num_subjects,
            D1=self.D1,
            K=self.K,
            d_drop=self.d_drop,
            dtype=self.dtype,
            name="subject_block",
        )(X, subject_idxs, train=train)
        for k in range(self.num_blocks):
            X = ConvBlock(k=k, D2=self.D2, dtype=self.dtype,
                          bn_impl=self.bn_impl,
                          gelu_approximate=self.gelu_approximate,
                          gelu_impl=self.gelu_impl,
                          name=f"conv{k}")(
                X, train=train)
        X = gelu_fn(nn.Dense(2 * self.D2, name="conv_final1",
                             dtype=self.dtype,
                             kernel_init=torch_kernel_init,
                             bias_init=torch_bias_init(self.D2))(X), gimpl)
        X = gelu_fn(nn.Dense(self.F, name="conv_final2",
                             dtype=self.dtype,
                             kernel_init=torch_kernel_init,
                             bias_init=torch_bias_init(2 * self.D2))(X), gimpl)
        if self.emit_f32:
            X = X.astype(jnp.float32)  # loss/metrics always run f32
        if self.seq2seq:
            return jnp.swapaxes(X, 1, 2)  # (B, F, T) like the reference
        # mean-pool reduces in f32 even when emitting bf16 (the ~360-term
        # time average would lose precision accumulated in bf16)
        if X.dtype == jnp.bfloat16:
            return jnp.mean(X.astype(jnp.float32), axis=1).astype(X.dtype)
        return jnp.mean(X, axis=1)  # (B, F)


class BrainEncoderSeq2Static(nn.Module):
    """BrainEncoder variant with per-block kernel sizes and interleaved
    average pooling that collapses the sequence to a static vector.

    Reference ``models.py:465-512``: AvgPool1d(3, stride=2) after blocks 0-3,
    AdaptiveAvgPool1d(1) after block 4.
    """

    loc: np.ndarray
    num_subjects: int
    ks_list: Sequence[int]
    D1: int = 270
    D2: int = 320
    F: int = 512
    K: int = 32
    d_drop: float = 0.1
    bn_impl: str = "auto"
    # same throughput levers as BrainEncoder (factory threads the config
    # flags into both branches so a dumped run config never claims a lever
    # the model silently ignored)
    dtype: jnp.dtype | None = None
    gelu_approximate: bool = False
    gelu_impl: str | None = None
    emit_f32: bool = True

    @nn.compact
    def __call__(self, X, subject_idxs, *, train: bool = False):
        from meg_decoding_tpu.ops.gelu import gelu as gelu_fn, resolve_impl

        gimpl = resolve_impl(self.gelu_impl, self.gelu_approximate)
        X = jnp.swapaxes(X, 1, 2)
        X = SubjectBlock(
            loc=self.loc,
            num_subjects=self.num_subjects,
            D1=self.D1,
            K=self.K,
            d_drop=self.d_drop,
            dtype=self.dtype,
            name="subject_block",
        )(X, subject_idxs, train=train)
        for k in range(5):
            X = ConvBlock(k=k, D2=self.D2, ks=int(self.ks_list[k]),
                          bn_impl=self.bn_impl, dtype=self.dtype,
                          gelu_approximate=self.gelu_approximate,
                          gelu_impl=self.gelu_impl,
                          name=f"conv{k}")(
                X, train=train
            )
            if k < 4:
                # torch AvgPool1d(3, stride=2): valid padding
                X = nn.avg_pool(X, window_shape=(3,), strides=(2,), padding="VALID")
            elif X.dtype == jnp.bfloat16:
                # global average pool reduces in f32 (same rationale as
                # BrainEncoder's mean-pool)
                X = jnp.mean(X.astype(jnp.float32), axis=1,
                             keepdims=True).astype(X.dtype)
            else:
                X = jnp.mean(X, axis=1, keepdims=True)  # global average pool
        X = gelu_fn(nn.Dense(2 * self.D2, name="conv_final1",
                             dtype=self.dtype,
                             kernel_init=torch_kernel_init,
                             bias_init=torch_bias_init(self.D2))(X), gimpl)
        X = gelu_fn(nn.Dense(self.F, name="conv_final2",
                             dtype=self.dtype,
                             kernel_init=torch_kernel_init,
                             bias_init=torch_bias_init(2 * self.D2))(X), gimpl)
        if self.emit_f32:
            X = X.astype(jnp.float32)
        return X[:, 0, :]  # (B, F): time dim already collapsed to 1
