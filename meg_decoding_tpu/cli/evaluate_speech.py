"""Speech-decoding evaluation from a checkpoint (Gwilliams2022 / Brennan2018).

The reference evaluates speech retrieval only inside the training loop
(train.py:223-245, single test batch per epoch).  This standalone evaluator
restores the checkpoint and scores the full test split: segment-retrieval
top-1/top-10 over candidate pools of the test batches, plus pairwise
identification — the paper's headline numbers, reproducible post-hoc.
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from meg_decoding_tpu.core.config import Config
from meg_decoding_tpu.data.layout import ch_locations_2d
from meg_decoding_tpu.models.factory import get_model
from meg_decoding_tpu.objectives.retrieval import (
    pairwise_identification,
    retrieval_accuracy,
)
from meg_decoding_tpu.ops.scaling import collate_preprocess
from meg_decoding_tpu.train.checkpoint import CheckpointManager
from meg_decoding_tpu.train.schedules import make_optimizer
from meg_decoding_tpu.train.state import create_train_state

__all__ = ["run"]


def run(cfg: Config) -> dict:
    from meg_decoding_tpu.cli.train_speech import _load_brennan, _load_gwilliams

    seed = int(cfg.get("seed", 0))
    save_root = cfg.get("save_root", "runs_out")
    if cfg.dataset == "Gwilliams2022":
        _, test_set = _load_gwilliams(cfg, seed)
    else:
        _, test_set = _load_brennan(cfg, seed)
    cfg.num_subjects = test_set.num_subjects

    num_channels = int(test_set.gather(np.arange(1))[0].shape[1])
    cfg.num_channels = num_channels
    loc = ch_locations_2d(cfg)
    model = get_model(cfg, loc=loc, num_channels=num_channels)

    optimizer = make_optimizer(cfg, int(cfg.get("updates", 1200)))
    example = test_set.gather(np.arange(min(len(test_set), 8)))
    abstract = create_train_state(model, optimizer, example[:3],
                                  jax.random.PRNGKey(seed))
    # ckpt_dir override: where the checkpoint LIVES may differ from
    # where outputs go (multirun eval sweeps remap save_root per job)
    ckpt = CheckpointManager(cfg.get("ckpt_dir")
                             or os.path.join(save_root, "ckpt"))
    state, which = ckpt.load_best_or_last(abstract)
    print(f"loaded checkpoint: {which}")

    rate = float(cfg.preprocs.brain_resample_rate)
    baseline = int(rate * float(cfg.preprocs.get("baseline_len_sec", 0)))
    clamp_lim = float(cfg.preprocs.get("clamp_lim", 20))
    collate = cfg.dataset == "Gwilliams2022"

    @jax.jit
    def fwd(params, batch_stats, X, subs):
        if collate:
            X = collate_preprocess(X, baseline, clamp_lim,
                                   bool(cfg.preprocs.get("clamp", True)))
        variables = {"params": params["model"]}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, X, subs, train=False)

    # score the whole test split in candidate pools of `test_size` segments
    # (the retrieval metric's difficulty scales with the pool size; the
    # reference uses one pool of test_size per epoch, train.py:223-245)
    pool = min(len(test_set), int(cfg.get("test_size", cfg.batch_size)))
    n_pools = max(-(-len(test_set) // pool), 1)  # ceil: cover the tail
    top1s, top10s, pids = [], [], []
    for p in range(n_pools):
        # the final pool overlaps backwards to keep static shapes while
        # covering every segment
        start = min(p * pool, len(test_set) - pool)
        idx = np.arange(start, start + pool)
        X, Y, subs = test_set.gather(idx)[:3]
        Z = fwd(state.params, state.batch_stats, X, subs)
        acc = retrieval_accuracy(Z, Y, top_ks=(1, 10))
        top1s.append(float(acc["top1"]))
        top10s.append(float(acc["top10"]))
        pids.append(float(jnp.mean(pairwise_identification(
            Z.reshape(Z.shape[0], -1), Y.reshape(Y.shape[0], -1),
            metric="correlation"))))

    results = {
        "test_top1": float(np.mean(top1s)),
        "test_top10": float(np.mean(top10s)),
        "pairwise_correlation": float(np.mean(pids)),
        "pool_size": pool,
        "n_pools": n_pools,
        "n_test_segments": len(test_set),
    }
    os.makedirs(save_root, exist_ok=True)
    with open(os.path.join(save_root, "eval_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    return results
