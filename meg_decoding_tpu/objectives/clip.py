"""CLIP-style symmetric InfoNCE loss with learnable temperature.

Reference: ``meg_decoding/utils/loss.py:55-112`` (``CLIPLoss``): L2-normalize
x and y, ``logits = x @ y.T * exp(temp)`` with learnable ``temp`` initialized
from ``init_temperature`` (5.1 in ``configs/config.yaml:32``), then
``(CE(logits, arange) + CE(logits.T, arange)) / 2``.

TPU-first notes:
* One matmul for the full logits matrix — float32 accumulation on the MXU.
* Under batch sharding, ``clip_loss_sharded`` all-gathers only the **y**
  embeddings: each device's local logit rows are a column-block of the
  global matrix, so the CE(y→x) term is rebuilt from a pmax/psum'd
  per-column logsumexp instead of gathering x and re-doing the matmul
  transposed — half the collective bytes of the textbook sharded-CLIP
  pattern.  Plain ``clip_loss`` under ``jit`` + NamedSharding lets XLA
  insert collectives automatically.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["CLIPLoss", "clip_loss", "clip_logits", "clip_loss_local_rows",
           "clip_loss_local_rows_gathered", "clip_loss_sharded"]

EPS = 1e-12


def _normalize(v: jnp.ndarray) -> jnp.ndarray:
    """L2-normalize over every non-batch axis WITHOUT flattening: a
    (B, F, T) → (B, F·T) reshape forces XLA layout copies in both the
    forward and backward pass (~2 ms/step at seq2seq scale on v5e,
    tools/profile_step.py); reducing over the trailing axes in place does
    the same math with zero data movement.

    The epsilon goes INSIDE the sqrt: ``maximum(sqrt(s), EPS)`` has a
    well-defined forward but d√s/ds = ∞ at s = 0, so an exactly-zero row
    (zero-padded sample, dead encoder output) would turn the whole step's
    gradient into NaN via 0·∞.

    The sum of squares and the division run in f32 regardless of input
    dtype (a bf16 accumulation over the ~370k elements of a seq2seq row
    would lose ~1% of the norm); the single rounding back to the input
    dtype fuses into the divide."""
    axes = tuple(range(1, v.ndim))
    v32 = v.astype(jnp.float32)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(v32 * v32, axis=axes, keepdims=True),
                                EPS * EPS))
    return (v32 / norm).astype(v.dtype)


def _row_norms(v: jnp.ndarray) -> jnp.ndarray:
    """Per-row L2 norm over every non-batch axis, (B, ...) → (B,) in f32.
    Same epsilon placement as ``_normalize`` (clamp the sum of squares, not
    the sqrt) so a zero row yields a finite gradient."""
    axes = tuple(range(1, v.ndim))
    v32 = v.astype(jnp.float32)
    return jnp.sqrt(jnp.maximum(jnp.sum(v32 * v32, axis=axes), EPS * EPS))


def _cosine_logits(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """(B, ...) × (B, ...) → (B, B) by contracting all non-batch axes in one
    ``dot_general`` — no flatten, no relayout."""
    axes = tuple(range(1, x.ndim))
    return jax.lax.dot_general(
        x, y, dimension_numbers=((axes, axes), ((), ())),
        preferred_element_type=jnp.float32)


def clip_logits(x: jnp.ndarray, y: jnp.ndarray, temp: jnp.ndarray,
                impl: str = "factored") -> jnp.ndarray:
    """Temperature-scaled cosine-similarity logits (B, B).

    ``impl='factored'`` (default, the measured-faster form): dot the RAW
    embeddings on the MXU and rescale the (B, B) logits by the outer product
    of inverse row norms — cos(xᵢ, yⱼ) = (xᵢ·yⱼ)/(|xᵢ||yⱼ|).  The normalized
    (B, F·T) tensors (f32 intermediates + a relayout copy in fwd AND bwd,
    ~3 ms/step at seq2seq B=256 on v5e, tools/trace_b256_bf16_cached.json)
    are never materialized; the norm correction touches only (B,) vectors
    and the (B, B) matrix.  For bf16 inputs this is also one fewer rounding
    (the reference normalizes then matmuls — ``loss.py:88-105`` — which
    rounds the normalized embeddings before the product).

    ``impl='normalized'`` keeps the normalize-then-dot order for A/B
    ablation (tools/ablate_kernels.py) and as the closest structural match
    to the reference."""
    if impl == "factored":
        g = _cosine_logits(x, y)
        inv = jnp.exp(temp) / (_row_norms(x)[:, None] * _row_norms(y)[None, :])
        return g * inv
    logits = _cosine_logits(_normalize(x), _normalize(y))
    return logits * jnp.exp(temp)


def _cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray, reduction: str) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    return jnp.mean(nll) if reduction == "mean" else jnp.sum(nll)


def clip_loss(x, y, temp, reduction: str = "mean", return_logits: bool = False,
              impl: str = "factored"):
    """Symmetric InfoNCE over the (global) batch. x, y: (B, ...)."""
    logits = clip_logits(x, y, temp, impl=impl)
    targets = jnp.arange(logits.shape[0])
    loss = (_cross_entropy(logits, targets, reduction)
            + _cross_entropy(logits.T, targets, reduction)) / 2.0
    if return_logits:
        return logits, loss
    return loss


def _local_row_topk_hits(logits_rows, local_targets, top_ks):
    """Per-shard retrieval hit counts from the LOCAL rows of the global
    logits matrix: for each local row, is its own (global) column among the
    k best?  Returns {f'top{k}': float hit count} — psum + divide by
    B_global gives exactly ``retrieval_accuracy_from_sim`` on the full
    matrix."""
    logits_rows = jax.lax.stop_gradient(logits_rows)
    hits = {}
    for k in top_ks:
        if k == 1:
            h = jnp.argmax(logits_rows, axis=1) == local_targets
        else:
            kk = min(k, logits_rows.shape[1])
            _, top_idx = jax.lax.top_k(logits_rows, kk)
            h = jnp.any(top_idx == local_targets[:, None], axis=-1)
        hits[f"top{k}"] = jnp.sum(h.astype(jnp.float32))
    return hits


def clip_loss_local_rows(x_local, y_local, temp, axis_name: str,
                         reduction: str = "mean", top_ks=None,
                         impl: str = "factored"):
    """Sharded CLIP loss for use inside ``shard_map``/``pmap``.

    Each device holds (B_local, F) slices of x and y.  Only **y** is
    all-gathered: the local rows ``logits_xy = x_local @ y_allᵀ`` already
    contain every device's column-block of the global logits matrix, and the
    CE(y→x) term needs exactly the *columns* of that matrix — a pmax/psum'd
    per-column logsumexp over the row-blocks reconstructs it with no x
    all-gather and no second (B_local, B_global) matmul.  Per step this
    halves the embedding collective (for the seq2seq model: ~94 MB instead
    of ~188 MB over ICI at B=128, F·T≈370k) and drops one of the two
    (B_local, B_global, D) matmuls; the replacement collectives move only
    2·B_global floats.

    ``top_ks``: also return retrieval metrics computed from the local
    ``x vs all-y`` logit rows (the rows of the matrix the unsharded path
    scores) — the logits-reuse optimization of the single-chip step, kept
    under sharding.  Returns ``(loss, {f'top{k}': acc})`` (metrics
    replicated via psum).
    """
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.psum(1, axis_name)
    b_local = x_local.shape[0]

    # norm-factored form (see clip_logits, the default): gather the RAW y
    # embeddings (same bytes as gathering normalized ones) and fold both row
    # norms into the (B_local, B_global) logits — the normalized (B, F·T)
    # tensors are never materialized, and the y column norms come from the
    # gathered tensor itself so the loss still needs exactly ONE all-gather.
    # impl='normalized' keeps the reference's normalize-then-dot op order
    # (LossConfig.clip_impl works identically with and without a mesh);
    # the collective pattern is unchanged — it gathers normalized rows.
    x_local = x_local.reshape(b_local, -1)
    y_local = y_local.reshape(b_local, -1)
    if impl == "normalized":
        x_local = _normalize(x_local)
        y_local = _normalize(y_local)
    y_all = jax.lax.all_gather(y_local, axis_name, tiled=True)  # (B_global, F)

    scale = jnp.exp(temp)
    local_targets = idx * b_local + jnp.arange(b_local)

    # this device's rows of the global logits: local x vs all y
    if impl == "normalized":
        inv = scale
    else:
        inv = scale / (_row_norms(x_local)[:, None] * _row_norms(y_all)[None, :])
    logits_xy = jnp.dot(x_local, y_all.T,
                        preferred_element_type=jnp.float32) * inv

    # CE(x→y) from the local rows
    ce_xy = _cross_entropy(logits_xy, local_targets, "sum")

    # CE(y→x) from the same matrix's columns: global per-column logsumexp
    # assembled from each device's row-block (max is stop-gradient — the
    # standard stable-logsumexp shift; the softmax gradient is shift-free)
    col_max = jax.lax.pmax(
        jax.lax.stop_gradient(jnp.max(logits_xy, axis=0)), axis_name)
    col_sum = jax.lax.psum(
        jnp.sum(jnp.exp(logits_xy - col_max[None, :]), axis=0), axis_name)
    col_lse = col_max + jnp.log(col_sum)  # (B_global,), replicated
    diag = jnp.take_along_axis(logits_xy, local_targets[:, None], axis=1)[:, 0]
    ce_yx = jnp.sum(
        jax.lax.dynamic_slice_in_dim(col_lse, idx * b_local, b_local) - diag)

    total = jax.lax.psum((ce_xy + ce_yx) / 2.0, axis_name)
    if reduction == "mean":
        total = total / (b_local * n)
    if top_ks is None:
        return total
    hits = _local_row_topk_hits(logits_xy, local_targets, top_ks)
    metrics = {k: jax.lax.psum(v, axis_name) / (b_local * n)
               for k, v in hits.items()}
    return total, metrics


def clip_loss_local_rows_gathered(x_local, y_local, temp, axis_name: str,
                                  reduction: str = "mean"):
    """The pre-round-4 both-gather variant (all-gather x AND y, two
    (B_local, B_global) matmuls) — kept as the comparison baseline for
    ``tests/test_objectives.py``'s equivalence check and for collective-cost
    ablations; the production path is ``clip_loss_local_rows``."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.psum(1, axis_name)
    b_local = x_local.shape[0]

    x_local = _normalize(x_local.reshape(b_local, -1))
    y_local = _normalize(y_local.reshape(b_local, -1))
    x_all = jax.lax.all_gather(x_local, axis_name, tiled=True)  # (B_global, F)
    y_all = jax.lax.all_gather(y_local, axis_name, tiled=True)

    scale = jnp.exp(temp)
    local_targets = idx * b_local + jnp.arange(b_local)

    logits_xy = jnp.dot(x_local, y_all.T, preferred_element_type=jnp.float32) * scale
    logits_yx = jnp.dot(y_local, x_all.T, preferred_element_type=jnp.float32) * scale

    loss_sum = (_cross_entropy(logits_xy, local_targets, "sum")
                + _cross_entropy(logits_yx, local_targets, "sum")) / 2.0
    total = jax.lax.psum(loss_sum, axis_name)
    if reduction == "mean":
        total = total / (b_local * n)
    return total


def clip_loss_sharded(x, y, temp, mesh, reduction: str = "mean",
                      axis_name: str = "data", top_ks=None,
                      impl: str = "factored"):
    """CLIP loss over a batch-sharded (x, y) via ``shard_map`` around
    ``clip_loss_local_rows``: only the (B_local, F) y-embeddings are
    all-gathered over ICI; each device computes its rows of the logits and
    both CE terms come from that one matrix (columns via psum'd logsumexp) —
    the collective pattern is explicit instead of left to XLA's auto-spmd.

    Differentiable (shard_map + psum/all_gather have exact transposes); the
    returned scalar is replicated.  Requires B divisible by the data-axis
    size.

    ``top_ks`` (e.g. ``(1, 10)``): additionally return replicated retrieval
    metrics computed from each shard's local logit rows — see
    ``clip_loss_local_rows``.  Returns ``(loss, metrics_dict)`` then.
    """
    from jax.sharding import PartitionSpec as P

    def local(xl, yl, t):
        return clip_loss_local_rows(xl, yl, t, axis_name,
                                    reduction=reduction, top_ks=top_ks,
                                    impl=impl)

    spec_x = P(axis_name, *([None] * (x.ndim - 1)))
    spec_y = P(axis_name, *([None] * (y.ndim - 1)))
    out_specs = P() if top_ks is None else \
        (P(), {f"top{k}": P() for k in top_ks})
    return jax.shard_map(local, mesh=mesh, in_specs=(spec_x, spec_y, P()),
                         out_specs=out_specs, check_vma=False)(x, y, temp)


class CLIPLoss(nn.Module):
    """Learnable-temperature CLIP loss as a module (temp is a trained param,
    optimized jointly with the encoder exactly as in reference
    ``train.py:158-162``)."""

    init_temperature: float = 5.1
    reduction: str = "mean"

    @nn.compact
    def __call__(self, x, y, return_logits: bool = False):
        temp = self.param(
            "temp", lambda key, shape: jnp.full(shape, self.init_temperature), ()
        )
        return clip_loss(x, y, temp, reduction=self.reduction, return_logits=return_logits)
