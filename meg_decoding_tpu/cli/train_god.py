"""GOD (MEG→image) contrastive / regression / classification trainer.

Covers the reference entry points that share the GOD skeleton (SURVEY §2.9):
``train_wowandb.py`` (given train/val splits), ``train_wowandb_cv.py``
(fixed-index CV split), ``train_wowandb_cv_contrastive.py`` (+SameLabelLoss),
``train_wowandb_cv_regression.py`` (MSE), ``train_regression.py`` (+manual L2),
``train_my_classifier.py`` (gallery classification loss).  Variant selection
is by config: ``training_mode: cv|split``, ``loss.kind``, ``loss.same_label``…

The whole per-step pipeline (collate → encoder → loss → grad → update →
metrics) is one jitted XLA program; the dataset lives in HBM.
"""

from __future__ import annotations

import os

import numpy as np

import jax

from meg_decoding_tpu.core.config import Config
from meg_decoding_tpu.data.god import build_god_dataset
from meg_decoding_tpu.data.layout import ch_locations_2d
from meg_decoding_tpu.data.roi import roi
from meg_decoding_tpu.data.sampling import god_cv_split
from meg_decoding_tpu.models.factory import get_model
from meg_decoding_tpu.objectives.retrieval import cosine_similarity_matrix
from meg_decoding_tpu.parallel.dp import maybe_distributed_init, setup_data_parallel
from meg_decoding_tpu.train.checkpoint import CheckpointManager
from meg_decoding_tpu.train.loop import fit
from meg_decoding_tpu.train.schedules import make_optimizer
from meg_decoding_tpu.train.state import create_train_state
from meg_decoding_tpu.train.steps import (
    CollateConfig,
    LossConfig,
    make_eval_step,
    make_train_step,
)
from meg_decoding_tpu.utils.logging import RunLogger

__all__ = ["run"]


def _loss_config(cfg) -> LossConfig:
    kind = cfg.select("loss.kind", "clip")
    return LossConfig(
        kind=kind,
        reduction=cfg.get("reduction", "mean"),
        same_label_weight=float(cfg.select("loss.same_label_weight", 0.0)),
        l2_weight=float(cfg.get("l2_weight", 0.0)),
        criterion=cfg.get("criterion", "crossentropy"),
        smooth_value=float(cfg.get("smooth_value", 0.1)),
        label_offset=1,  # GOD vec_index is 1-indexed (loss.py:191)
        temp_trainable=bool(cfg.get("temp_trainable", True)),
        clip_impl=str(cfg.select("loss.clip_impl", "factored")),
    )


def run(cfg: Config) -> dict:
    maybe_distributed_init(cfg)
    save_root = cfg.get("save_root", "runs_out")
    os.makedirs(save_root, exist_ok=True)

    # ---- data -----------------------------------------------------------
    source = build_god_dataset(cfg, "train")
    mode = cfg.get("training_mode", "cv")
    if mode == "cv":
        # fixed-index CV split over the packed epochs (train_wowandb_cv.py:145-148)
        n_per = int(cfg.get("epochs_per_subject", len(source) // max(source.num_subjects, 1)))
        frac = cfg.get("cv_train_per_subject")
        start = int(frac) if frac is not None else int(round(n_per * 5 / 6))
        ind_tr, ind_te = god_cv_split(n_per, source.num_subjects, start)
        train_set, test_set = source.subset(ind_tr), source.subset(ind_te)
    else:  # 'split': separate val session files (train_wowandb.py path)
        train_set = source
        test_set = build_god_dataset(
            cfg, "val", mean_X=source.mean_X, std_X=source.std_X,
            mean_Y=source.mean_Y, std_Y=source.std_Y,
        )
    cfg.num_subjects = source.num_subjects
    if cfg.get("host_resident", False):
        # spill path for datasets exceeding HBM: epochs stay in host RAM and
        # stream through the double-buffered prefetch pipeline (train/loop.py)
        train_set = train_set.to_host()

    # ---- model ----------------------------------------------------------
    if (len(jax.devices()) > 1 and bool(cfg.get("data_parallel", True))
            and not cfg.get("bn_impl")):
        cfg.bn_impl = "xla"  # see cli/train_speech.py: Pallas BN has no
        # partitioning rule under the auto-spmd mesh
    roi_channels = roi(cfg)
    loc = ch_locations_2d(cfg, roi_channels)
    model = get_model(cfg, loc=loc, num_channels=len(roi_channels))

    loss_cfg = _loss_config(cfg)
    rate = cfg.preprocs.get("brain_resample_rate") or 0
    collate_cfg = CollateConfig(
        baseline_len_samp=int(rate * float(cfg.preprocs.get("baseline_len_sec", 0))),
        clamp_lim=float(cfg.preprocs.get("clamp_lim", 20)),
        clamp=bool(cfg.preprocs.get("clamp", True)),
        quantile_impl=str(cfg.get("quantile_impl", "auto")),
    )

    gallery = gallery_self_sim = None
    labels0 = None
    with_labels = loss_cfg.kind == "classification" or loss_cfg.same_label_weight > 0
    if loss_cfg.kind == "classification":
        gallery = np.load(cfg.image_features_train_path).astype(np.float32)
        gallery = jax.numpy.asarray(gallery)
        if loss_cfg.criterion == "similarity_crossentropy":
            gallery_self_sim = cosine_similarity_matrix(gallery, gallery)

    updates = int(cfg.get("updates", 1200))
    optimizer = make_optimizer(cfg, updates)
    example = train_set.gather(np.arange(min(len(train_set), int(cfg.batch_size))))
    state = create_train_state(
        model, optimizer, example, jax.random.PRNGKey(int(cfg.get("seed", 0))),
        init_temperature=float(cfg.get("init_temperature", 5.1)),
    )
    mesh, shard_fn, replicate_fn = setup_data_parallel(cfg)
    state = replicate_fn(state)

    # mesh engages the explicit sharded-CLIP collectives in the per-step
    # trainer too (the scan path below already passes it).  Non-clip losses
    # ignore it in _compute_loss (replicated-gallery ops that auto-spmd
    # partitions fine) but still need it for the sharding-safe quantile
    # impl in the collate — the Pallas kernel has no partitioning rule.
    train_step = make_train_step(model, optimizer, loss_cfg, collate_cfg,
                                 gallery=gallery, gallery_self_sim=gallery_self_sim,
                                 mesh=mesh)
    eval_step = make_eval_step(model, loss_cfg, collate_cfg,
                               gallery=gallery, gallery_self_sim=gallery_self_sim,
                               mesh=mesh)

    logger = RunLogger(save_root, run_name=cfg.get("run_name"),
                       use_wandb=bool(cfg.get("use_wandb", False)),
                       wandb_cfg=cfg.get("wandb"))
    logger.dump_config(cfg)  # Hydra-parity .hydra/config.yaml (ref runs)
    ckpt = CheckpointManager(os.path.join(save_root, "ckpt"))
    from meg_decoding_tpu.train.loop import resume_if_requested, steps_per_epoch

    bm = mesh.shape["data"] if mesh else 1
    state, start_epoch = resume_if_requested(
        cfg, ckpt, state, save_root,
        steps_per_epoch_n=steps_per_epoch(cfg, len(train_set), bm))

    if (cfg.get("use_scan_epochs", False) and not with_labels
            and not cfg.get("host_resident", False)):
        # whole-epoch scan fast path (single-chip or data-parallel;
        # labels/classification and the host-spill path use the per-step
        # driver)
        from meg_decoding_tpu.train.loop import fit_scan
        from meg_decoding_tpu.train.scan_loop import make_scan_epoch

        n_data = mesh.shape["data"] if mesh else 1
        bs = max((int(cfg.batch_size) // n_data) * n_data, n_data)
        scan_epoch = make_scan_epoch(
            model, optimizer, loss_cfg, collate_cfg, train_set,
            updates=updates, batch_size=bs, mesh=mesh)
        state, best = fit_scan(cfg, train_set, test_set, state, scan_epoch,
                               eval_step, logger, ckpt,
                               seed=int(cfg.get("seed", 0)),
                               start_epoch=start_epoch)
        return best

    state, best = fit(cfg, train_set, test_set, state, train_step, eval_step,
                      logger, ckpt, seed=int(cfg.get("seed", 0)),
                      shard_fn=shard_fn, with_labels=with_labels,
                      batch_multiple=(mesh.shape["data"] if mesh else 1),
                      start_epoch=start_epoch)
    return best
