"""Learning-rate schedules and optimizer construction.

Reference: ``train.py:160-175`` — Adam over encoder+loss params; schedulers:
``cosine`` (``CosineAnnealingLR(T_max=epochs, eta_min=0.1·lr)``),
``multistep`` (milestones at fractions of total epochs, gamma), or none.
Torch schedulers step per-epoch; we express the same curves per-step given
``updates_per_epoch``.
"""

from __future__ import annotations

import optax

__all__ = ["make_schedule", "make_optimizer"]


def make_schedule(cfg, updates_per_epoch: int):
    lr = float(cfg.lr)
    epochs = int(cfg.epochs)
    kind = cfg.get("lr_scheduler", "none")
    if kind == "cosine":
        # torch CosineAnnealingLR: lr(e) = eta_min + (lr-eta_min)(1+cos(πe/T))/2
        eta_min = lr * 0.1

        def sched(step):
            import jax.numpy as jnp

            epoch = step // max(updates_per_epoch, 1)
            return eta_min + (lr - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * epoch / epochs))

        return sched
    if kind == "multistep":
        milestones = [int(float(m) * epochs) for m in cfg.lr_multistep_mlstns]
        gamma = float(cfg.lr_step_gamma)

        def sched(step):
            import jax.numpy as jnp

            epoch = step // max(updates_per_epoch, 1)
            n_passed = sum((epoch >= m).astype(jnp.float32) for m in
                           [jnp.asarray(m) for m in milestones])
            return lr * gamma**n_passed

        return sched
    return lr  # constant


def make_optimizer(cfg, updates_per_epoch: int) -> optax.GradientTransformation:
    sched = make_schedule(cfg, updates_per_epoch)
    return optax.adam(learning_rate=sched)
