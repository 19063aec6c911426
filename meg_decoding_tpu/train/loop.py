"""Epoch driver: sampler → device gather → jitted steps → metrics → ckpt.

Reference skeleton: ``train.py:178-274`` (epoch loop with per-batch updates,
single-batch test pass, epoch metric means, model_last each epoch) and
``train_wowandb_cv.py:274-357`` (adds model_best on best test top-10).

Note: the reference updates Brennan only once per epoch using the *last*
batch's gradients (``train.py:218-221``) — an apparent bug we do NOT
reproduce; all datasets update per batch here (deviation documented, SURVEY
§7 hard-part 7).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np

from meg_decoding_tpu.data.packed import PackedDataset
from meg_decoding_tpu.data.sampling import sample_with_replacement, shuffle_batches
from meg_decoding_tpu.train.checkpoint import CheckpointManager
from meg_decoding_tpu.utils.logging import RunLogger
from meg_decoding_tpu.utils.profiling import StepTimer, profile_trace

__all__ = ["fit", "fit_scan", "resume_if_requested"]


def _mean_metrics(history: list[dict]) -> dict:
    """Per-epoch metric means.  Steps skipped by the non-finite guard carry
    masked-to-0 metrics (train/steps.py); averaging those zeros in would
    underreport loss — e.g. a 90%-skipped epoch would log ~10% of the true
    loss and look like progress.  So every metric except ``skipped`` itself
    averages over the VALID steps only; ``skipped`` stays the fraction of
    all steps."""
    if not history:
        return {}
    keys = history[0].keys()
    if "skipped" not in keys:
        return {k: float(np.mean([float(h[k]) for h in history])) for k in keys}
    valid = [h for h in history if float(h["skipped"]) == 0.0]
    unmasked = ("skipped", "temp")  # carried through skipped steps unmasked
    out = {k: (float(np.mean([float(h[k]) for h in valid])) if valid else 0.0)
           for k in keys if k not in unmasked}
    for k in unmasked:
        if k in keys:
            out[k] = float(np.mean([float(h[k]) for h in history]))
    return out


def _test_pool_starts(n: int, pool: int, sweep: bool) -> list[int]:
    """Window starts covering the test split with pools of exactly ``pool``
    elements: non-overlapping windows plus a tail-covering final window.
    ``sweep=False`` reproduces the reference's single-batch test pass
    (train.py:223-245)."""
    if not sweep or n <= pool:
        return [0]
    starts = list(range(0, n - pool + 1, pool))
    if starts[-1] + pool < n:
        starts.append(n - pool)
    return starts


def _eval_test_pools(cfg, test_set, eval_step, state, tkey, test_size,
                     shard_fn, with_labels: bool) -> dict:
    """Epoch test pass.  The reference scores ONE random batch of
    ``test_size`` (train.py:223-245) — a noisy signal to hang model_best
    selection off.  By default every pool of the (shuffled) test split is
    scored and metrics averaged; pool size stays ``test_size`` so the
    retrieval metric semantics (top-k among test_size candidates) are
    unchanged.  ``test_sweep: false`` restores the single-batch behavior."""
    n = len(test_set)
    perm = np.asarray(jax.random.permutation(tkey, n))
    sweep = bool(cfg.get("test_sweep", True)) if hasattr(cfg, "get") else True
    stochastic = getattr(test_set, "stochastic", False)
    hist = []
    for j, s in enumerate(_test_pool_starts(n, test_size, sweep)):
        idx = perm[s:s + test_size]
        if stochastic:
            tbatch = test_set.gather(idx, key=jax.random.fold_in(tkey, 1 + j))
        else:
            tbatch = test_set.gather(idx)
        if shard_fn is not None:
            tbatch = shard_fn(tbatch)
        if with_labels and len(tbatch) == 4:
            tX, tY, tsubs, tlabels = tbatch
            m, _ = eval_step(state.params, state.batch_stats, tX, tY, tsubs,
                             tlabels)
        else:
            tX, tY, tsubs = tbatch[:3]
            m, _ = eval_step(state.params, state.batch_stats, tX, tY, tsubs)
        hist.append(m)
    return _mean_metrics(hist)


def fit(
    cfg,
    train_set: PackedDataset,
    test_set: PackedDataset,
    state,
    train_step: Callable,
    eval_step: Callable,
    logger: RunLogger,
    ckpt: Optional[CheckpointManager] = None,
    seed: int = 0,
    shard_fn: Callable | None = None,
    with_labels: bool = False,
    batch_multiple: int = 1,
    start_epoch: int = 0,
):
    """Run the full training loop; returns (final_state, best_metrics).

    ``shard_fn`` (optional) device-puts a gathered batch with the mesh's data
    sharding — the multi-chip path; identity on a single device.
    ``batch_multiple`` rounds batch sizes down to a multiple (the data-axis
    size when sharding, so every device gets an equal slice).
    ``start_epoch`` continues epoch numbering after a resume (the state
    itself carries params/opt/step/PRNG — SURVEY §5.4's reference gap).
    """
    epochs = int(cfg.epochs)

    def _round(n):
        return max((n // batch_multiple) * batch_multiple, batch_multiple)

    batch_size = _round(min(int(cfg.batch_size), len(train_set)))
    use_sampler = bool(cfg.get("use_sampler", True))
    updates = int(cfg.get("updates", max(len(train_set) // batch_size, 1)))
    test_size = min(len(test_set), int(cfg.get("test_size", batch_size)))
    test_shard_fn = shard_fn
    if (test_size // batch_multiple) * batch_multiple > 0:
        test_size = (test_size // batch_multiple) * batch_multiple
    else:
        test_shard_fn = None  # tiny test set: run it unsharded

    base_key = jax.random.PRNGKey(seed)
    best_top10 = -1.0
    best_metrics: dict = {}
    timer = StepTimer()
    profile_dir = cfg.get("profile_dir") if hasattr(cfg, "get") else None
    profile_epoch = int(cfg.get("profile_epoch", 1)) if profile_dir else -1

    # loaders with sampling randomness of their own (random subject/session
    # pairing) take a per-call key derived from (seed, epoch, step) so a
    # resumed run replays the exact batches a continuous run would have
    stochastic_train = getattr(train_set, "stochastic", False)

    # spill path: a host-resident dataset (PackedDataset.to_host) streams
    # batches through the double-buffered prefetch pipeline so the
    # host→device copy overlaps the running step (SURVEY §2.11; replaces
    # the reference's DataLoader workers).  `prefetch: N` sets the buffer
    # depth (default 2 when the dataset lives on host).
    host_resident = bool(getattr(train_set, "host_resident", False))
    prefetch_n = int(cfg.get("prefetch", 2 if host_resident else 0) or 0)

    for epoch in range(start_epoch, epochs):
        # derived purely from (seed, epoch) so a resumed run samples the
        # exact batches the continuous run would have
        ekey, tkey, gkey = jax.random.split(jax.random.fold_in(base_key, epoch), 3)
        if use_sampler:
            idx_epoch = np.asarray(
                sample_with_replacement(ekey, len(train_set), updates, batch_size)
            )
        else:
            idx_epoch = shuffle_batches(ekey, len(train_set), batch_size)

        def gathered_batches():
            for step_i, idx in enumerate(idx_epoch):
                with timer.phase("gather"):
                    if stochastic_train:
                        batch = train_set.gather(
                            idx, key=jax.random.fold_in(gkey, step_i))
                    else:
                        batch = train_set.gather(idx)
                yield batch

        if prefetch_n > 0:
            from meg_decoding_tpu.data.prefetch import prefetch_to_device

            put = shard_fn if shard_fn is not None else jax.device_put
            batch_iter = prefetch_to_device(gathered_batches(),
                                            size=prefetch_n, device_put=put)
        elif shard_fn is not None:
            batch_iter = map(shard_fn, gathered_batches())
        else:
            batch_iter = gathered_batches()

        train_hist = []
        with profile_trace(profile_dir if epoch == profile_epoch else None):
            for batch in batch_iter:
                with timer.phase("step"):
                    if with_labels and len(batch) == 4:
                        X, Y, subs, labels = batch
                        state, metrics = train_step(state, X, Y, subs, labels)
                    else:
                        # arity-generic: fused loaders yield (segment_ids,)
                        state, metrics = train_step(state, *batch[:3])
                train_hist.append(metrics)

        # test pass: pools of test_size covering the whole split (see
        # _eval_test_pools; test_sweep=false restores the reference's
        # single-random-batch pass)
        test_metrics = _eval_test_pools(cfg, test_set, eval_step, state, tkey,
                                        test_size, test_shard_fn, with_labels)

        tm = _mean_metrics(train_hist)
        em = {f"test_{k}": float(v) for k, v in test_metrics.items()}
        row = {"epoch": epoch, **{f"train_{k}": v for k, v in tm.items()}, **em,
               **timer.means_ms()}
        timer.reset()
        # failure detection (the reference has none, SURVEY §5.3).  The jitted
        # step already skips any batch with a non-finite loss/grad (params and
        # opt state unchanged, train_skipped counts the fraction); abort only
        # when the whole epoch produced nothing, or a non-finite value leaked
        # through anyway — before it overwrites the last good checkpoint.
        if row.get("train_skipped", 0.0) >= 1.0:
            raise FloatingPointError(
                f"every step of epoch {epoch} was skipped (non-finite "
                "loss/grads) — state NOT checkpointed; restore model_last "
                "and lower the learning rate")
        if not np.isfinite(row.get("train_loss", 0.0)):
            raise FloatingPointError(
                f"non-finite training loss at epoch {epoch}: "
                f"{row.get('train_loss')} — state NOT checkpointed; restore "
                "model_last and lower the learning rate")
        logger.log(row)
        logger.summary(epoch, epochs, row)

        if ckpt is not None:
            ckpt.save("model_last", state)
            if em.get("test_top10", -1.0) > best_top10:
                best_top10 = em.get("test_top10", -1.0)
                best_metrics = row
                ckpt.save("model_best", state)
        elif em.get("test_top10", -1.0) > best_top10:
            best_top10 = em.get("test_top10", -1.0)
            best_metrics = row

    return state, best_metrics


def steps_per_epoch(cfg, n_train: int, batch_multiple: int = 1) -> int:
    """Actual update steps per epoch, matching ``fit``'s batching: the fixed
    ``updates`` schedule when ``use_sampler`` (configs/config.yaml:11), else
    the shuffle-batches count ``n_train // batch_size`` (drop-last)."""
    bs = min(int(cfg.batch_size), n_train)
    bs = max((bs // batch_multiple) * batch_multiple, batch_multiple)
    if bool(cfg.get("use_sampler", True)):
        return int(cfg.get("updates", max(n_train // bs, 1)))
    return max(n_train // bs, 1)


def resume_if_requested(cfg, ckpt, state, save_root: str,
                        steps_per_epoch_n: int | None = None):
    """Shared resume logic for the CLI trainers: restore model_last and
    continue epoch numbering at (max logged epoch)+1 across ALL prior run
    logs (each invocation writes a fresh runs/<ts>/metrics.jsonl).

    ``steps_per_epoch_n``: the trainer's actual update steps per epoch (use
    ``steps_per_epoch``).  With ``use_sampler: false`` (config_GOD.yaml) an
    epoch is ``len(train_set) // batch_size`` steps, NOT ``cfg.updates`` —
    capping with the wrong denominator would rewind ``start_epoch`` toward 0
    and silently retrain completed epochs."""
    import glob
    import json as _json
    import os

    if not (cfg.get("resume", False) and ckpt is not None
            and ckpt.exists("model_last")):
        return state, 0
    try:
        state = ckpt.restore("model_last", state)
    except FileNotFoundError as e:
        # exists() saw a directory but no generation was restorable (e.g. a
        # first-ever save crashed mid-write leaving only a partial .new):
        # start fresh rather than killing the job
        import warnings

        warnings.warn(f"resume requested but no restorable checkpoint "
                      f"({e}); starting from scratch")
        return state, 0
    last_epoch = -1
    for log in glob.glob(os.path.join(save_root, "runs", "*", "metrics.jsonl")):
        for line in open(log):
            last_epoch = max(last_epoch, int(_json.loads(line).get("epoch", -1)))
    start_epoch = last_epoch + 1
    # metrics.jsonl is written BEFORE ckpt.save each epoch; a crash between
    # the two leaves logs one epoch ahead of the checkpoint.  The restored
    # state.step is ground truth — cap start_epoch with the trainer's real
    # steps-per-epoch so the lost epoch is retrained, keeping the
    # (seed, epoch)-derived sampling keys consistent with the params.
    if steps_per_epoch_n is None and bool(cfg.get("use_sampler", True)):
        steps_per_epoch_n = cfg.get("updates")  # legacy-caller fallback
    if steps_per_epoch_n:
        start_epoch = min(start_epoch, int(state.step) // int(steps_per_epoch_n))
    print(f"resumed from model_last at epoch {start_epoch} "
          f"(step {int(state.step)})")
    return state, start_epoch


def fit_scan(
    cfg,
    train_set,
    test_set,
    state,
    scan_epoch: Callable,
    eval_step: Callable,
    logger: RunLogger,
    ckpt: Optional[CheckpointManager] = None,
    seed: int = 0,
    start_epoch: int = 0,
    batch_multiple: int = 1,
):
    """Epoch driver over whole-epoch scan programs (train/scan_loop.py):
    one device call per epoch, then the usual test pass + logging + ckpt.
    ``batch_multiple`` rounds the test-pool size down to a multiple (the
    data-axis size under a mesh, so the session-sharded eval gather and the
    sharded eval step both get equal per-device slices)."""
    epochs = int(cfg.epochs)
    test_size = min(len(test_set), int(cfg.get("test_size", cfg.batch_size)))
    if (test_size // batch_multiple) * batch_multiple > 0:
        test_size = (test_size // batch_multiple) * batch_multiple
    base_key = jax.random.PRNGKey(seed)
    best_top10, best_metrics = -1.0, {}

    for epoch in range(start_epoch, epochs):
        ekey, tkey = jax.random.split(jax.random.fold_in(base_key, epoch))
        state, tm = scan_epoch(state, ekey)
        tm = {k: float(v) for k, v in tm.items()}
        # same failure detection as fit(): an epoch whose every step was
        # skipped (or whose loss is non-finite) must abort BEFORE the state
        # overwrites the last good checkpoint — on the scan path the
        # masked-to-0 metrics would otherwise log train_loss 0.0 forever
        if tm.get("skipped", 0.0) >= 1.0:
            raise FloatingPointError(
                f"every step of epoch {epoch} was skipped (non-finite "
                "loss/grads) — state NOT checkpointed; restore model_last "
                "and lower the learning rate")
        if not np.isfinite(tm.get("loss", 0.0)):
            raise FloatingPointError(
                f"non-finite training loss at epoch {epoch}: {tm.get('loss')}"
                " — state NOT checkpointed; restore model_last and lower "
                "the learning rate")

        test_metrics = _eval_test_pools(cfg, test_set, eval_step, state, tkey,
                                        test_size, None, with_labels=False)
        em = {f"test_{k}": float(v) for k, v in test_metrics.items()}
        row = {"epoch": epoch, **{f"train_{k}": v for k, v in tm.items()}, **em}
        logger.log(row)
        logger.summary(epoch, epochs, row)
        if ckpt is not None:
            ckpt.save("model_last", state)
        if em.get("test_top10", -1.0) > best_top10:
            best_top10 = em.get("test_top10", -1.0)
            best_metrics = row
            if ckpt is not None:
                ckpt.save("model_best", state)
    return state, best_metrics
