"""Export a trained checkpoint as a deployable serving artifact.

``meg-decode-export dataset=Gwilliams2022 save_root=runs_out`` (or
``python -m meg_decoding_tpu.cli.export_model ...``) rebuilds the model the
same way the evaluators do (``cli/evaluate_speech.py``/``evaluate_god.py``),
restores ``model_best``/``model_last`` from ``save_root/ckpt``, and writes a
batch-polymorphic tpu+cpu ``jax.export`` artifact (full collate + encoder
pipeline) to ``save_root/export/`` — see ``serving/export.py``.  The
reference has no analog: its inference requires the training repo + torch.
"""

from __future__ import annotations

import os

import numpy as np

import jax

from meg_decoding_tpu.core.config import Config
from meg_decoding_tpu.data.layout import ch_locations_2d
from meg_decoding_tpu.models.factory import get_model
from meg_decoding_tpu.serving.export import save_artifact
from meg_decoding_tpu.train.checkpoint import CheckpointManager
from meg_decoding_tpu.train.schedules import make_optimizer
from meg_decoding_tpu.train.state import create_train_state
from meg_decoding_tpu.train.steps import CollateConfig

__all__ = ["run", "main"]


def _gwilliams_export_meta(cfg) -> tuple[int, int, int]:
    """(num_subjects, num_channels, seq_len) without staging the packed
    recordings on device: subjects from the tiny onset table, channel count
    from config → cache ``meta.json`` sidecar → host-side peek of one
    recording (legacy caches only — that last resort does load the
    multi-GB ``x_dict.npy`` into host RAM).  Matches
    ``build_gwilliams_dataset``'s own derivations (data/gwilliams.py)."""
    from meg_decoding_tpu.cli.train_speech import find_gwilliams_cache
    from meg_decoding_tpu.data.gwilliams import parse_sessions

    cache_dir = find_gwilliams_cache(cfg)
    meg_on = np.load(os.path.join(cache_dir, "meg_onsets.npy"),
                     allow_pickle=True).item()
    _, subjects = parse_sessions(meg_on.keys())

    rate = float(cfg.preprocs.get("brain_resample_rate"))
    seq_len = int(rate * float(cfg.preprocs.seq_len_sec))

    # channel count must match the DATA (what the model was trained on) —
    # NOT layout.npy's row count: KIT layouts can carry more positions than
    # recorded channels (tests/test_layouts.py, 224 rows vs 208 channels).
    # Sources in order: config (training-time value) → cache meta.json
    # sidecar → peek one recording (host numpy load of a legacy cache,
    # never staged on device).
    num_channels = cfg.get("num_channels")
    if not num_channels:
        meta_path = os.path.join(cache_dir, "meta.json")
        if os.path.exists(meta_path):
            import json

            with open(meta_path) as f:
                num_channels = json.load(f).get("num_channels")
    if not num_channels:
        x = np.load(os.path.join(cache_dir, "x_dict.npy"),
                    allow_pickle=True).item()
        if not x:
            raise ValueError(
                f"cache {cache_dir} holds no recordings — cannot derive "
                "the export's channel count (pass num_channels=… or "
                "rebuild the cache)")
        num_channels = next(iter(x.values())).shape[0]
    return len(subjects), int(num_channels), seq_len


def run(cfg: Config) -> str:
    seed = int(cfg.get("seed", 0))
    save_root = cfg.get("save_root", "runs_out")
    out_dir = cfg.get("export_dir") or os.path.join(save_root, "export")

    if cfg.dataset == "GOD":
        from meg_decoding_tpu.data.god import build_god_dataset
        from meg_decoding_tpu.data.roi import roi

        dataset = build_god_dataset(cfg, "train")
        cfg.num_subjects = dataset.num_subjects
        roi_channels = roi(cfg)
        loc = ch_locations_2d(cfg, roi_channels)
        num_channels = len(roi_channels)
        example = dataset.gather(np.arange(min(len(dataset), 8)))
        seq_len = int(np.asarray(example[0]).shape[-1])
    elif cfg.dataset == "Gwilliams2022":
        # the artifact only needs (num_subjects, num_channels, seq_len) —
        # read them from the cache metadata instead of staging the packed
        # recordings (~9.3 GB at full scale) on device just for shapes
        num_subjects, num_channels, seq_len = _gwilliams_export_meta(cfg)
        cfg.num_subjects = num_subjects
        cfg.num_channels = num_channels
        loc = ch_locations_2d(cfg)
        example = (np.zeros((3, num_channels, seq_len), np.float32), None,
                   np.zeros((3,), np.int32))
    else:
        # Brennan: the effective srate (and so seq_len) is data-dependent —
        # fs · audio_len / T_raw (data/brennan.py) — and the EEG is small, so
        # build the dataset the same way the trainer does
        from meg_decoding_tpu.cli.train_speech import _load_brennan

        dataset, _ = _load_brennan(cfg, seed)
        cfg.num_subjects = dataset.num_subjects
        num_channels = int(dataset.gather(np.arange(1))[0].shape[1])
        cfg.num_channels = num_channels
        loc = ch_locations_2d(cfg)
        example = dataset.gather(np.arange(min(len(dataset), 8)))
        seq_len = int(np.asarray(example[0]).shape[-1])

    model = get_model(cfg, loc=loc, num_channels=num_channels)
    optimizer = make_optimizer(cfg, int(cfg.get("updates", 1200)))
    abstract = create_train_state(model, optimizer, example[:3],
                                  jax.random.PRNGKey(seed))
    # ckpt_dir override: where the checkpoint LIVES may differ from
    # where outputs go (multirun eval sweeps remap save_root per job)
    ckpt = CheckpointManager(cfg.get("ckpt_dir")
                             or os.path.join(save_root, "ckpt"))
    state, which = ckpt.load_best_or_last(abstract)
    print(f"exporting checkpoint: {which}")

    rate = float(cfg.preprocs.get("brain_resample_rate") or 0)
    collate_cfg = CollateConfig(
        baseline_len_samp=int(rate * float(cfg.preprocs.get("baseline_len_sec", 0))),
        clamp_lim=float(cfg.preprocs.get("clamp_lim", 20)),
        clamp=bool(cfg.preprocs.get("clamp", True)),
        # mirror the trainers' collate decision (cli/train_speech.py:279,
        # evaluate_god.py predict applies the chain for GOD too)
        enabled=cfg.dataset in ("Gwilliams2022", "GOD"),
    )
    save_artifact(out_dir, model, state.params, state.batch_stats,
                  num_channels, seq_len, collate_cfg,
                  extra_meta={"dataset": str(cfg.dataset),
                              "checkpoint": which,
                              "num_subjects": int(cfg.num_subjects)})
    print(f"serving artifact written to {out_dir}")
    return out_dir


def main(argv=None):
    from meg_decoding_tpu.cli.main import parse_cli_auto

    return run(parse_cli_auto(argv))


if __name__ == "__main__":
    main()
