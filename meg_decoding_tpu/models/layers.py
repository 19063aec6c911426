"""Core encoder layers (Flax linen), designed TPU-first.

Reference semantics: ``meg_decoding/models.py`` —
``SpatialAttention`` (167-220), ``SpatialDropout`` (223-241),
``SubjectBlock`` (244-273), ``ConvBlock`` (276-322).

TPU-first design notes (differences from the reference's CUDA/torch layout):

* Internals are **time-major** ``(B, T, C)``: every channel-mixing op is then
  a plain trailing-dim matmul that XLA tiles directly onto the MXU, and 1-D
  convs become ``conv_general_dilated`` in NWC layout (the TPU-native conv
  layout).  The public module API still takes ``(B, C, T)`` like the
  reference; transposition happens once at the encoder boundary.
* The reference applies its per-subject 1×1 conv with a Python loop over the
  batch (``models.py:270-272``) — a serialization hot spot.  Here it is one
  gathered batched matmul ``einsum('btc,bcd->btd', X, W[subject_idxs])``
  (the same trick as the reference's own test oracle,
  ``tests/test_modules/models.py:33-35``).
* Spatial attention precomputes the Fourier basis ``cos/sin`` tables
  (``models.py:190-195``) once as constants; the forward pass is two small
  matmuls + softmax + one big ``(B·T, C) @ (C, D1)`` matmul.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "fourier_basis",
    "spatial_attention_weights",
    "SpatialAttention",
    "spatial_dropout_mask",
    "SubjectLayers",
    "ConvBlock",
    "torch_kernel_init",
    "torch_bias_init",
]


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv/Linear default init: ``kaiming_uniform(a=√5)`` →
    ``U[−1/√fan_in, 1/√fan_in]`` (flax's default is lecun_normal — ~3×
    lower variance — which measurably changes from-scratch training
    dynamics vs the reference).  flax kernels are (..., in/groups, out), so
    ``fan_in = prod(shape[:-1])`` matches torch's ``in/groups · kh · kw``."""
    bound = 1.0 / np.sqrt(np.prod(shape[:-1]))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    """torch's default bias init ``U[−1/√fan_in, 1/√fan_in]`` (flax default
    is zeros).  fan_in isn't derivable from the bias shape, so it's bound
    per layer."""
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def fourier_basis(loc: np.ndarray, K: int) -> tuple[np.ndarray, np.ndarray]:
    """Precompute cos/sin tables of the 2-D Fourier basis at sensor positions.

    Mirrors reference ``models.py:173-195``: for all (k, l) in [0, K)²,
    ``phi[kl, c] = 2π (k·x_c + l·y_c)``; returns ``cos(phi), sin(phi)`` of
    shape ``(K², C)``.
    """
    loc = np.asarray(loc, dtype=np.float32)
    x, y = loc[:, 0], loc[:, 1]
    k = np.repeat(np.arange(K, dtype=np.float32), K)  # kl-major like the ref
    l = np.tile(np.arange(K, dtype=np.float32), K)
    phi = 2.0 * np.pi * (np.outer(k, x) + np.outer(l, y))  # (K², C)
    return np.cos(phi).astype(np.float32), np.sin(phi).astype(np.float32)


def spatial_attention_weights(z_re, z_im, cos, sin):
    """softmax over channels of ``Re(z)·cos + Im(z)·sin`` (models.py:204-213)."""
    a = z_re @ cos + z_im @ sin  # (D1, C)
    return jax.nn.softmax(a, axis=-1)


def spatial_dropout_mask(rng, loc: jnp.ndarray, d_drop: float) -> jnp.ndarray:
    """One random drop-center for the whole batch; zero channels within
    ``d_drop`` of it (reference ``models.py:232-241``).  Returns (C,) mask."""
    num_channels = loc.shape[0]
    center_idx = jax.random.randint(rng, (), 0, num_channels)
    center = loc[center_idx]
    distances = jnp.linalg.norm(loc - center, axis=-1)
    return jnp.where(distances < d_drop, 0.0, 1.0)


class SpatialAttention(nn.Module):
    """Fourier-parameterized spatial attention over sensor (x, y) positions.

    Input  ``(B, T, C_in)`` time-major; output ``(B, T, D1)``.
    Parameters ``z_re, z_im`` are the real/imag parts of the reference's
    complex parameter ``z ∈ C^{D1×K²}`` (``models.py:186``), initialized
    U[0, 1) to match ``torch.rand(..., dtype=cfloat)``.
    """

    loc: np.ndarray  # (C, 2) normalized sensor positions (static)
    D1: int = 270
    K: int = 32
    d_drop: float = 0.1

    @nn.compact
    def __call__(self, X: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        cos_t, sin_t = fourier_basis(self.loc, self.K)
        cos_t = jnp.asarray(cos_t)
        sin_t = jnp.asarray(sin_t)
        z_re = self.param("z_re", nn.initializers.uniform(scale=1.0), (self.D1, self.K**2))
        z_im = self.param("z_im", nn.initializers.uniform(scale=1.0), (self.D1, self.K**2))
        sa_wts = spatial_attention_weights(z_re, z_im, cos_t, sin_t)  # (D1, C)

        if not deterministic:
            rng = self.make_rng("spatial")
            mask = spatial_dropout_mask(rng, jnp.asarray(self.loc), self.d_drop)
            X = X * mask[None, None, :]

        # (B, T, C) @ (C, D1) — one MXU matmul over the flattened batch·time
        return X @ sa_wts.T


class SubjectLayers(nn.Module):
    """Per-subject 1×1 channel mix as a gathered batched matmul.

    Replaces the reference's per-sample Python loop over ``nn.ModuleList`` of
    1×1 convs (``models.py:253-272``).  Weight (S, D, D), no bias
    (``models.py:255-263`` uses ``bias=False``).
    """

    num_subjects: int
    dim: int

    @nn.compact
    def __call__(self, X: jnp.ndarray, subject_idxs: jnp.ndarray) -> jnp.ndarray:
        # torch Conv1d default init: kaiming_uniform(a=√5) → U[-b, b] with
        # b = 1/√fan_in; use the same range so training dynamics match.
        bound = 1.0 / np.sqrt(self.dim)

        def _init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        W = self.param("weight", _init, (self.num_subjects, self.dim, self.dim))
        Wb = W[subject_idxs]  # (B, D, D)
        return jnp.einsum("btc,bcd->btd", X, Wb)


class FusedBatchNorm(nn.Module):
    """Drop-in replacement for ``nn.BatchNorm`` (same param/collection names:
    ``scale``/``bias`` params, ``batch_stats`` ``mean``/``var``) with
    selectable statistics backends (``ops/pallas/batchnorm.py``): 'auto' =
    plain XLA reductions — the backend that MEASURED fastest on v5e
    (tools/ablate_kernels.py; the Pallas one-read and MXU-matmul stats both
    lose to XLA's joint fusion, RESULTS.md round 3) — with 'pallas'/'mxu'
    kept as oracle-tested experiments.

    Semantics: flax fast-variance (biased ``E[x²]−E[x]²``), f32 statistics,
    running update ``ra = momentum·ra + (1−momentum)·batch``.  The affine
    output is computed in f32 and rounded once to the compute dtype (flax
    rounds intermediates to ``dtype`` — ours is strictly more accurate;
    PARITY.md).  Under a mesh keep the default: 'xla'/'mxu' auto-partition
    (synced-BN), the Pallas kernels have no partitioning rule.
    """

    use_running_average: bool = False
    momentum: float = 0.99  # flax nn.BatchNorm default (drop-in parity)
    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None
    impl: str = "auto"  # measured-best backend (= XLA reductions)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from meg_decoding_tpu.ops.pallas.batchnorm import batch_norm_train

        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (C,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (C,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        out_dtype = self.dtype or x.dtype
        if self.use_running_average:
            invstd = jax.lax.rsqrt(ra_var.value + self.epsilon)
            a = scale * invstd
            b = bias - ra_mean.value * a
            return (x * a + b).astype(out_dtype)
        y, mean, var = batch_norm_train(x, scale, bias, float(self.epsilon),
                                        self.impl)
        # update running stats only when the collection is mutable — exactly
        # nn.BatchNorm's guard; a train=True apply without
        # mutable=['batch_stats'] must silently skip the update, not raise
        if (not self.is_initializing()
                and self.is_mutable_collection("batch_stats")):
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var
        return y.astype(out_dtype)


class ConvBlock(nn.Module):
    """Residual conv block: conv(+skip) → BN → GELU ×2 → conv(2·D2) → GLU.

    Reference ``models.py:276-322``; the dilations there are commented out,
    so effective dilation is 1 (matched here, configurable for the
    seq2static variant's per-block kernel sizes).
    Operates in NWC ``(B, T, C)`` layout.  ``dtype`` sets the compute dtype
    (bf16 halves HBM traffic on TPU; params stay f32).
    """

    k: int
    D2: int
    ks: int = 3
    bn_momentum: float = 0.9  # flax momentum = 1 - torch momentum(0.1)
    dtype: jnp.dtype | None = None
    bn_impl: str = "auto"  # FusedBatchNorm stats impl ('xla' under a mesh)
    # tanh-approximate GELU: the erf GELU (torch F.gelu default, matched by
    # default) costs ~2.3 ms/step at B=256 seq2seq on v5e in VPU
    # transcendentals (tools/trace_b256_bf16_cached.json); the tanh form is
    # a documented opt-in perf deviation (PARITY.md)
    gelu_approximate: bool = False
    # explicit GELU implementation override: 'erf' | 'tanh' | 'erf_poly'
    # (ops/gelu.py — erf_poly is the f32-exact fast path, ≤2.5 ulp of erf);
    # None defers to gelu_approximate
    gelu_impl: str | None = None

    @nn.compact
    def __call__(self, X: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        from meg_decoding_tpu.ops.gelu import gelu as gelu_fn, resolve_impl

        gimpl = resolve_impl(self.gelu_impl, self.gelu_approximate)
        conv = lambda feats, cin, name: nn.Conv(
            features=feats, kernel_size=(self.ks,), padding="SAME", name=name,
            dtype=self.dtype, kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(cin * self.ks),
        )
        h = conv(self.D2, X.shape[-1], "conv0")(X)
        if self.k > 0:
            h = h + X  # skip (only when in/out dims match, models.py:308-312)
        h = FusedBatchNorm(
            use_running_average=not train, momentum=self.bn_momentum, name="bn0",
            dtype=self.dtype, impl=self.bn_impl,
        )(h)
        h = gelu_fn(h, gimpl)

        h2 = conv(self.D2, self.D2, "conv1")(h) + h
        h2 = FusedBatchNorm(
            use_running_average=not train, momentum=self.bn_momentum, name="bn1",
            dtype=self.dtype, impl=self.bn_impl,
        )(h2)
        h2 = gelu_fn(h2, gimpl)

        # GLU over features (models.py:320).  The reference's single
        # 2·D2-wide conv followed by a split forces XLA to relayout the
        # 640-channel activation before the elementwise GLU (~0.2 ms/block
        # fwd + as much in bwd on v5e); two D2-wide convs with the kernel
        # halves are the same math and fuse into the conv epilogues.
        a = conv(self.D2, self.D2, "conv2a")(h2)
        b = conv(self.D2, self.D2, "conv2b")(h2)
        return a * jax.nn.sigmoid(b)
