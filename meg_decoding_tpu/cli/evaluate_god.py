"""GOD evaluation: zero-shot classification + pairwise identification.

Reference: ``evaluate.py`` — loads the val split and ``model_best.pt``
(:134-142), scores predictions against the 50-image CLIP gallery
(``zero_shot_classification``, :32-82), and computes pairwise identification
accuracy via correlation and cosine (:191-261), including trial averaging
(:182-189).  ``eval_wowandb_cv.py`` adds retrieval + error analysis;
``eval_wowandb_cv_imagenet_val.py`` extends the gallery with 50k ImageNet-val
distractors (:149-160,366-391).

All metrics here are single matmuls on device (the reference loops in Python
per pair).
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from meg_decoding_tpu.core.config import Config
from meg_decoding_tpu.data.god import build_god_dataset
from meg_decoding_tpu.data.layout import ch_locations_2d
from meg_decoding_tpu.data.roi import roi
from meg_decoding_tpu.models.factory import get_model
from meg_decoding_tpu.objectives.retrieval import (
    pairwise_identification_gallery,
    retrieval_accuracy,
    zero_shot_classification,
)
from meg_decoding_tpu.ops.scaling import collate_preprocess
from meg_decoding_tpu.train.checkpoint import CheckpointManager
from meg_decoding_tpu.train.state import create_train_state

__all__ = ["run", "predict"]


def _build(cfg):
    source = build_god_dataset(cfg, "train")
    val = build_god_dataset(cfg, "val", mean_X=source.mean_X, std_X=source.std_X,
                            mean_Y=source.mean_Y, std_Y=source.std_Y)
    cfg.num_subjects = source.num_subjects
    roi_channels = roi(cfg)
    loc = ch_locations_2d(cfg, roi_channels)
    model = get_model(cfg, loc=loc, num_channels=len(roi_channels))
    return source, val, model


def predict(cfg, model, state, dataset, batch_size: int = 256):
    """Forward the whole dataset through the encoder (eval mode) with the
    on-device collate chain."""
    rate = cfg.preprocs.get("brain_resample_rate") or 0
    baseline = int(rate * float(cfg.preprocs.get("baseline_len_sec", 0)))
    clamp_lim = float(cfg.preprocs.get("clamp_lim", 20))

    @jax.jit
    def fwd(params, batch_stats, X, subs):
        X = collate_preprocess(X, baseline, clamp_lim,
                               bool(cfg.preprocs.get("clamp", True)))
        variables = {"params": params["model"]}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, X, subs, train=False)

    # back-overlap the final batch so every call shares ONE static shape —
    # a tail batch of a new size would recompile (~10 min through the
    # remote-compile relay, CLAUDE.md); same recipe as evaluate_speech
    n = len(dataset)
    bs = min(batch_size, n)
    out = None
    for i in range(0, n, bs):
        start = min(i, n - bs)
        idx = np.arange(start, start + bs)
        X, _, subs = dataset.gather(idx)[:3]
        z = np.asarray(fwd(state.params, state.batch_stats, X, subs))
        if out is None:
            out = np.empty((n,) + z.shape[1:], z.dtype)
        out[start:start + bs] = z
    return out


def run(cfg: Config) -> dict:
    save_root = cfg.get("save_root", "runs_out")
    source, val, model = _build(cfg)

    from meg_decoding_tpu.train.schedules import make_optimizer

    optimizer = make_optimizer(cfg, int(cfg.get("updates", 1200)))
    example = source.gather(np.arange(min(len(source), 8)))
    abstract = create_train_state(model, optimizer, example, jax.random.PRNGKey(0))
    # ckpt_dir override: where the checkpoint LIVES may differ from
    # where outputs go (multirun eval sweeps remap save_root per job)
    ckpt = CheckpointManager(cfg.get("ckpt_dir")
                             or os.path.join(save_root, "ckpt"))
    state, which = ckpt.load_best_or_last(abstract)
    print(f"loaded checkpoint: {which}")

    Z = predict(cfg, model, state, val)
    Y = np.asarray(val.Y)
    labels = np.asarray(val.labels)

    results = {}
    # retrieval within the val set
    acc = retrieval_accuracy(jnp.asarray(Z), jnp.asarray(Y), top_ks=(1, 10))
    results.update({f"val_{k}": float(v) for k, v in acc.items()})

    # zero-shot classification against the (test) gallery if provided
    gallery_path = cfg.get("image_features_path")
    if gallery_path:
        gallery = np.load(gallery_path).astype(np.float32)
        zs = zero_shot_classification(
            jnp.asarray(Z), jnp.asarray(gallery), jnp.asarray(labels - 1),
            top_ks=(1, 10),
        )
        results.update({f"zeroshot_{k}": float(v) for k, v in zs.items()})

    # pairwise identification (the headline GOD number, evaluate.py:191-249):
    # trial-average predictions per image (evaluate.py:182-189) and score
    # against the unique per-image gallery (denominator = n_images - 1)
    uniq_labels, first_idx = np.unique(labels, return_index=True)
    gallery_Y = Y[first_idx]
    Z_avg = np.stack([Z[labels == l].mean(0) for l in uniq_labels])
    targets = np.arange(len(uniq_labels))
    for metric in ("correlation", "cosine"):
        pid = pairwise_identification_gallery(
            jnp.asarray(Z_avg), jnp.asarray(gallery_Y), jnp.asarray(targets),
            metric=metric)
        results[f"pairwise_{metric}"] = float(jnp.mean(pid))

    # optional error analysis + ImageNet distractors (eval_wowandb_cv*.py)
    if cfg.get("error_analysis", False):
        from meg_decoding_tpu.cli.eval_analysis import run_error_analysis

        distractors = None
        dpath = cfg.get("imagenet_val_features_path")
        if dpath:
            distractors = np.load(dpath)
        analysis = run_error_analysis(
            Z, Y, labels, save_root, distractors=distractors,
            norm_mean=val.mean_Y, norm_std=val.std_Y,
        )
        results["similarity_acc"] = analysis["similarity_acc"]
        results["mean_acc_scene"] = analysis["mean_acc_scene"]
        image_dir = cfg.get("image_dir")
        if image_dir:
            from meg_decoding_tpu.cli.eval_analysis import save_top5_image_tiles

            import csv as _csv

            # run_error_analysis names the CSV by gallery kind
            csv_name = ("top5_with_imagenet_val.csv" if distractors is not None
                        else "top5.csv")
            with open(os.path.join(save_root, csv_name)) as f:
                rows = [{k: int(float(v)) if k != "acc(scene_id)" else float(v)
                         for k, v in r.items() if k}
                        for r in _csv.DictReader(f)]
            save_top5_image_tiles(rows, image_dir, save_root)

    out_path = os.path.join(save_root, "eval_results.json")
    os.makedirs(save_root, exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    return results
