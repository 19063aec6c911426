"""EEGNet and LinearEncoder.

Reference: ``meg_decoding/models.py`` — ``EEGNet`` (32-94),
``LinearEncoder`` (325-337).  The reference's ``EEGNetSub`` is broken and
unreachable (``models.py:96-98``, factory maps ``eegnet_sub`` → ``EEGNet`` at
``models.py:27-28``); here ``EEGNet`` optionally supports per-subject first
convs properly via a gathered weight (the intended semantics), off by default.

Layout: torch runs NCHW with input ``(B, 1, C, T)``; here NHWC ``(B, C, T, F)``
— the TPU-native conv layout.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from meg_decoding_tpu.models.layers import torch_bias_init, torch_kernel_init

__all__ = ["EEGNet", "EEGNetSub", "LinearEncoder"]


class EEGNet(nn.Module):
    """Temporal conv → depthwise spatial conv → separable conv → linear head.

    Shapes follow reference ``models.py:40-84``: conv1 (1, k1) SAME → F1
    maps; conv2 depthwise over the full channel axis (C, 1), groups=F1, ×D;
    ELU → AvgPool(1, p1) → dropout; conv3 separable (1, k2) SAME + 1×1 → F2;
    ELU → AvgPool(1, p2) → dropout; flatten → Dense(512).
    """

    num_channels: int
    T: int
    F1: int = 16
    D: int = 2
    F2: int = 32
    k1: int = 30
    k2: int = 4
    p1: int = 2
    p2: int = 4
    dr1: float = 0.5
    dr2: float = 0.5
    out_dim: int = 512
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, X, subject_idxs=None, *, train: bool = False):
        # (B, C, T) → NHWC (B, C, T, 1)
        h = X[..., None]
        h = nn.Conv(self.F1, kernel_size=(1, self.k1), padding="SAME", use_bias=False,
                    name="conv1", kernel_init=torch_kernel_init)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=self.bn_momentum,
                         name="bn1")(h)
        return self._tail(h, train)

    def _tail(self, h, train):
        """conv2 → separable conv3 → pools/dropouts → Dense head (shared with
        EEGNetSub, which only replaces conv1)."""
        # depthwise spatial conv over all channels: kernel (C, 1), groups=F1
        h = nn.Conv(self.D * self.F1, kernel_size=(self.num_channels, 1),
                    padding="VALID", feature_group_count=self.F1, use_bias=False,
                    name="conv2", kernel_init=torch_kernel_init)(h)  # (B, 1, T, D*F1)
        h = nn.BatchNorm(use_running_average=not train, momentum=self.bn_momentum,
                         name="bn2")(h)
        h = nn.elu(h)
        h = nn.avg_pool(h, window_shape=(1, self.p1), strides=(1, self.p1))
        h = nn.Dropout(rate=self.dr1, deterministic=not train)(h)

        # separable conv: depthwise (1, k2) then pointwise 1×1 → F2
        h = nn.Conv(self.D * self.F1, kernel_size=(1, self.k2), padding="SAME",
                    feature_group_count=self.D * self.F1, use_bias=False,
                    name="conv3_dw", kernel_init=torch_kernel_init)(h)
        h = nn.Conv(self.F2, kernel_size=(1, 1), use_bias=False, name="conv3_pw", kernel_init=torch_kernel_init)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=self.bn_momentum,
                         name="bn3")(h)
        h = nn.elu(h)
        h = nn.avg_pool(h, window_shape=(1, self.p2), strides=(1, self.p2))
        h = nn.Dropout(rate=self.dr2, deterministic=not train)(h)

        h = h.reshape(h.shape[0], -1)
        return nn.Dense(self.out_dim, name="classifier",
                        kernel_init=torch_kernel_init,
                        bias_init=torch_bias_init(int(h.shape[-1])))(h)


class EEGNetSub(EEGNet):
    """EEGNet with a **per-subject** first temporal conv.

    The reference's ``EEGNetSub`` is broken (wrong ``super()`` target,
    ``models.py:98``) and unreachable (the factory maps ``eegnet_sub`` to
    plain EEGNet, ``models.py:27-28``).  This is the *intended* semantics,
    implemented TPU-style: one (S, k1, 1, F1) kernel bank, gathered per
    sample and applied as a vmapped conv (no Python loop over the batch).
    Enable via ``model: eegnet_sub`` + ``eegnet_sub_fixed: true``.
    """

    num_subjects: int = 1

    @nn.compact
    def __call__(self, X, subject_idxs=None, *, train: bool = False):
        assert subject_idxs is not None, "EEGNetSub needs subject indices"
        h = X[..., None]  # (B, C, T, 1)
        bound = 1.0 / np.sqrt(self.k1)

        def _init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        W = self.param("conv1_sub", _init,
                       (self.num_subjects, 1, self.k1, 1, self.F1))
        Wb = W[subject_idxs]  # (B, 1, k1, 1, F1)

        def conv_one(x, w):
            return jax.lax.conv_general_dilated(
                x[None], w, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )[0]

        h = jax.vmap(conv_one)(h, Wb)
        h = nn.BatchNorm(use_running_average=not train, momentum=self.bn_momentum,
                         name="bn1")(h)
        return self._tail(h, train)


class LinearEncoder(nn.Module):
    """Optional time-mean ("SCP", reference ``models.py:334-335``) then a
    single Dense(C → 512) (``models.py:325-337``)."""

    out_dim: int = 512
    scp: bool = True

    @nn.compact
    def __call__(self, X, subject_idxs=None, *, train: bool = False):
        if self.scp:
            X = jnp.mean(X, axis=-1)  # (B, C, T) → (B, C)
        return nn.Dense(self.out_dim, name="linear",
                        kernel_init=torch_kernel_init,
                        bias_init=torch_bias_init(int(X.shape[-1])))(X)
