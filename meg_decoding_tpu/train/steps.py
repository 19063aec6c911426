"""Jitted train / eval steps.

One fused step = on-device collate (baseline + robust-scale + clamp,
replacing the reference's host-side sklearn collators,
``gwilliams2022.py:641-662``) → encoder forward → loss → grad → Adam update →
retrieval metrics.  The whole thing is a single XLA program; under a sharded
mesh the batch axis is partitioned and XLA inserts psum/all-gather over ICI.

Loss variants mirror the reference entry points (SURVEY §2.9):
* ``clip``            — train.py / train_wowandb_cv.py
* ``clip+same_label`` — train_wowandb_cv_contrastive.py (:212-213,261,303)
* ``mse``             — train_wowandb_cv_regression.py (:210), with optional
                        manual L2 penalty (train_regression.py:250-253)
* ``classification``  — train_my_classifier.py (MyCLIPLikeClassificationLoss)
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import optax

from meg_decoding_tpu.objectives.clip import clip_loss
from meg_decoding_tpu.objectives.losses import (
    clip_like_classification_loss,
    mse_loss,
    same_label_loss,
)
from meg_decoding_tpu.objectives.retrieval import retrieval_accuracy
from meg_decoding_tpu.ops.scaling import (
    collate_preprocess,
    collate_preprocess_cached,
)
from meg_decoding_tpu.train.state import TrainState

__all__ = ["LossConfig", "CollateConfig", "make_train_step", "make_eval_step"]


@dataclasses.dataclass(frozen=True)
class CollateConfig:
    baseline_len_samp: int = 0
    clamp_lim: float = 20.0
    clamp: bool = True
    enabled: bool = True
    # robust-scale percentile impl: auto = the measured-fastest backend
    # (keys-only sort — see ops/scaling.py robust_scale; 'pallas' is the
    # oracle-tested bisection-kernel experiment); forced to 'sort' under a
    # mesh (no partitioning rule for the Pallas call)
    quantile_impl: str = "auto"

    def resolve_quantile_impl(self, mesh) -> str:
        """The mesh-safety invariant, in ONE place for every program builder
        (per-step train/eval, fused step, scan epoch): the Pallas quantile
        kernel has no GSPMD partitioning rule, so any program traced over a
        (potentially) batch-sharded x must use the sort percentiles
        (ops/scaling.py robust_scale docstring)."""
        return "sort" if mesh is not None else self.quantile_impl


@dataclasses.dataclass(frozen=True)
class LossConfig:
    kind: str = "clip"              # clip | mse | classification
    reduction: str = "mean"
    same_label_weight: float = 0.0  # >0 adds SameLabelLoss (contrastive variant)
    l2_weight: float = 0.0          # manual L2 penalty on params (regression)
    criterion: str = "crossentropy"  # for classification kind
    smooth_value: float = 0.1
    label_offset: int = 0           # GOD vec_index is 1-indexed → offset 1
    grad_norms: bool = False        # log global grad norm (vis_grad parity)
    # temp_trainable: false freezes the CLIP temperature at
    # init_temperature (reference loss.py:140-143: a requires_grad=False
    # tensor instead of an nn.Parameter)
    temp_trainable: bool = True
    # clip logits form: 'factored' (raw MXU dot, norms folded into the
    # (B, B) matrix — measured faster, objectives/clip.py clip_logits) or
    # 'normalized' (normalize-then-dot, the reference's op order)
    clip_impl: str = "factored"


def _l2_penalty(params) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(params)
    return sum(jnp.sum(p**2) for p in leaves)


def _compute_loss(loss_cfg: LossConfig, Z, Y, labels, temp, params,
                  gallery=None, gallery_self_sim=None, train=True, mesh=None,
                  top_ks=(1, 10)):
    """Returns ``(loss, sim, shard_metrics)``: ``sim`` is the CLIP logits
    matrix (rows = Y, cols = Z) when the loss computed a full one, else None
    — the train step reuses it for retrieval metrics (rankings are invariant
    to the positive temperature scale), saving a second full-embedding
    normalize + (B, B) matmul per step.  Under a ``mesh`` the full matrix
    never exists on one device; ``shard_metrics`` then carries the same
    retrieval accuracies computed from each shard's local logit rows inside
    the collective (the multi-chip form of the logits-reuse optimization)."""
    sim = shard_metrics = None
    if not loss_cfg.temp_trainable:
        # frozen temperature (reference loss.py:140-143): zero gradient →
        # Adam leaves the param at init_temperature forever
        temp = jax.lax.stop_gradient(temp)
    if loss_cfg.kind == "clip":
        if mesh is not None:
            # explicit sharded-CLIP collectives (all-gather embeddings over
            # ICI, local CE rows, psum) instead of XLA auto-spmd — the
            # pattern of SURVEY §5.8
            from meg_decoding_tpu.objectives.clip import clip_loss_sharded

            loss, shard_metrics = clip_loss_sharded(
                Y, Z, temp, mesh, reduction=loss_cfg.reduction, top_ks=top_ks,
                impl=loss_cfg.clip_impl)
        else:
            sim, loss = clip_loss(Y, Z, temp, reduction=loss_cfg.reduction,
                                  return_logits=True,
                                  impl=loss_cfg.clip_impl)
        if loss_cfg.same_label_weight > 0.0 and labels is not None:
            loss = loss + loss_cfg.same_label_weight * same_label_loss(Z, labels)
    elif loss_cfg.kind == "mse":
        loss = mse_loss(Y, Z)
    elif loss_cfg.kind == "classification":
        assert gallery is not None and labels is not None
        # reference subtracts 1 from GOD labels before use (loss.py:191)
        loss = clip_like_classification_loss(
            Z, labels - loss_cfg.label_offset, gallery, temp,
            criterion=loss_cfg.criterion, train=train,
            smooth_value=loss_cfg.smooth_value,
            gallery_self_similarity=gallery_self_sim,
        )
    else:
        raise ValueError(loss_cfg.kind)
    if loss_cfg.l2_weight > 0.0:
        loss = loss + loss_cfg.l2_weight * _l2_penalty(params["model"])
    return loss, sim, shard_metrics


def make_train_step(model, optimizer, loss_cfg: LossConfig,
                    collate_cfg: CollateConfig,
                    gallery=None, gallery_self_sim=None, donate: bool = True,
                    mesh=None):
    """Build the jitted train step.

    Signature: ``step(state, X, Y, subject_idxs, labels=None,
    collate_stats=None) → (state, metrics)`` with metrics {loss, top1,
    top10, temp, lr-proxy step}.  ``collate_stats`` (optional, (B, 2C):
    median ∥ IQR concatenated): precomputed RobustScaler fits for this
    batch's windows — the collate then applies them instead of re-sorting
    (ulp-exact; see ``compute_collate_stats``).

    ``mesh`` (optional): when training data-parallel, routes the CLIP loss
    through the explicit sharded-collective path (``clip_loss_sharded``) —
    batch sizes must then be divisible by the data-axis size.

    ``gallery``/``gallery_self_sim`` are passed to the jitted function as
    ARGUMENTS (via the returned wrapper), never closed over — a closed-over
    jnp array is baked into the HLO as a constant and shipped through the
    remote-compile relay (CLAUDE.md).
    """

    # under a mesh the batch is sharded and traced through auto-spmd, where
    # the Pallas quantile kernel has no partitioning rule — use the sort
    # percentiles there (ops/scaling.py robust_scale docstring)
    qimpl = collate_cfg.resolve_quantile_impl(mesh)

    def train_step(state: TrainState, X, Y, subject_idxs, labels,
                   gallery, gallery_self_sim, collate_stats):
        key, spatial_key, dropout_key = jax.random.split(state.key, 3)
        if collate_cfg.enabled:
            if collate_stats is not None:
                # precomputed (B, 2·Cp) RobustScaler fits for these exact
                # windows — [:, :C] median, [:, Cp:Cp+C] IQR, lane-padded
                # so the table gather is layout-clean (data/gwilliams.py
                # compute_collate_stats): skips the per-step (B, C, T) sort,
                # ulp-exact output
                from meg_decoding_tpu.data.gwilliams import stats_lane_pad

                nC = X.shape[1]
                Cp = stats_lane_pad(nC)
                X = collate_preprocess_cached(
                    X, collate_stats[:, :nC],
                    collate_stats[:, Cp:Cp + nC],
                    collate_cfg.baseline_len_samp, collate_cfg.clamp_lim,
                    collate_cfg.clamp,
                )
            else:
                X = collate_preprocess(
                    X, collate_cfg.baseline_len_samp, collate_cfg.clamp_lim,
                    collate_cfg.clamp, quantile_impl=qimpl,
                )

        def loss_fn(params):
            variables = {"params": params["model"]}
            rngs = {"spatial": spatial_key, "dropout": dropout_key}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                Z, upd = model.apply(variables, X, subject_idxs, train=True,
                                     rngs=rngs, mutable=["batch_stats"])
                new_batch_stats = upd["batch_stats"]
            else:
                Z = model.apply(variables, X, subject_idxs, train=True, rngs=rngs)
                new_batch_stats = {}
            loss, sim, smet = _compute_loss(loss_cfg, Z, Y, labels,
                                            params["loss"]["temp"], params,
                                            gallery, gallery_self_sim,
                                            train=True, mesh=mesh)
            sim = None if sim is None else jax.lax.stop_gradient(sim)
            return loss, (Z, sim, smet, new_batch_stats)

        (loss, (Z, sim, smet, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # failure detection (SURVEY §5.3 — the reference has none): a batch
        # producing a non-finite loss or gradient is SKIPPED — params, opt
        # state and BN stats keep their previous values — and counted, so one
        # bad batch neither poisons the epoch nor kills the run.
        gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)

        def _keep_old(new, old):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(ok, n, o), new, old)

        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_params = _keep_old(new_params, state.params)
        new_opt_state = _keep_old(new_opt_state, state.opt_state)
        new_bs = _keep_old(new_bs, state.batch_stats if state.batch_stats else {})

        metrics = {"loss": jnp.where(ok, loss, 0.0),
                   "temp": new_params["loss"]["temp"],
                   "skipped": 1.0 - ok.astype(jnp.float32)}
        if loss_cfg.grad_norms:
            # debug visibility into gradient flow (reference
            # utils/vis_grad.py:4-6 printed per-module grad sums)
            metrics["grad_norm"] = jnp.where(ok, gnorm, 0.0)
        # the reference skeleton tracks retrieval top-k in every variant
        # (train_my_classifier.py shares train.py's metric loop); reuse the
        # loss's logits when available — same matrix up to the positive
        # temperature scale, so identical rankings at zero extra compute.
        # Under a mesh the sharded loss already scored its local logit rows
        # (smet) — the multi-chip form of the same reuse.
        if sim is not None:
            from meg_decoding_tpu.objectives.retrieval import (
                retrieval_accuracy_from_sim,
            )

            acc = retrieval_accuracy_from_sim(sim, top_ks=(1, 10))
        elif smet is not None:
            acc = smet
        else:
            acc = retrieval_accuracy(Z, Y, top_ks=(1, 10))
        metrics.update({k: jnp.where(ok, v, 0.0) for k, v in acc.items()})
        new_state = TrainState(
            params=new_params, batch_stats=new_bs, opt_state=new_opt_state,
            step=state.step + 1, key=key,
        )
        return new_state, metrics

    jitted = jax.jit(train_step, donate_argnums=(0,) if donate else ())

    def step(state, X, Y, subject_idxs, labels=None, collate_stats=None):
        return jitted(state, X, Y, subject_idxs, labels, gallery,
                      gallery_self_sim, collate_stats)

    return step


def make_eval_step(model, loss_cfg: LossConfig, collate_cfg: CollateConfig,
                   gallery=None, gallery_self_sim=None, top_ks=(1, 10),
                   mesh=None):
    """Build the jitted eval step: forward (running BN stats, no dropout) →
    loss + retrieval metrics.  Returns (metrics, Z).  Gallery arrays are
    jit arguments, not closures (see make_train_step).  ``mesh`` only picks
    the sharding-safe quantile impl for the collate (the loss itself runs
    unsharded on the gathered eval batch)."""
    qimpl = collate_cfg.resolve_quantile_impl(mesh)

    def eval_step(params, batch_stats, X, Y, subject_idxs, labels,
                  gallery, gallery_self_sim):
        if collate_cfg.enabled:
            X = collate_preprocess(
                X, collate_cfg.baseline_len_samp, collate_cfg.clamp_lim,
                collate_cfg.clamp, quantile_impl=qimpl,
            )
        variables = {"params": params["model"]}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        Z = model.apply(variables, X, subject_idxs, train=False)
        loss, sim, _ = _compute_loss(loss_cfg, Z, Y, labels,
                                     params["loss"]["temp"], params, gallery,
                                     gallery_self_sim, train=False)
        metrics = {"loss": loss, "temp": params["loss"]["temp"]}
        if sim is not None:
            from meg_decoding_tpu.objectives.retrieval import (
                retrieval_accuracy_from_sim,
            )

            metrics.update(retrieval_accuracy_from_sim(sim, top_ks=top_ks))
        else:
            metrics.update(retrieval_accuracy(Z, Y, top_ks=top_ks))
        return metrics, Z

    jitted = jax.jit(eval_step)

    def step(params, batch_stats, X, Y, subject_idxs, labels=None):
        return jitted(params, batch_stats, X, Y, subject_idxs, labels,
                      gallery, gallery_self_sim)

    return step
