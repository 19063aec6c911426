"""Run logging: console epoch summaries + JSONL metric history.

Reference: ``meg_decoding/utils/loggers.py`` (``Pickleogger`` re-pickles the
whole metric history to a timestamped file each epoch, ``loggers.py:12-30``)
plus colored console prints (``train.py:247-255``) and optional wandb
(``train.py:257-269``).  Here: append-only JSONL (cheap, resumable, plottable
by ``cli/view_training_curve.py``), same metric names, wandb optional and
gated on availability.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

__all__ = ["RunLogger"]


class RunLogger:
    def __init__(self, save_root: str, run_name: str | None = None,
                 use_wandb: bool = False, wandb_cfg: Any = None):
        ts = time.strftime("%Y%m%d-%H%M%S")
        self.run_dir = os.path.join(save_root, "runs", run_name or ts)
        os.makedirs(self.run_dir, exist_ok=True)
        self.path = os.path.join(self.run_dir, "metrics.jsonl")
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # optional; absent in this image

                wandb.init(project=wandb_cfg.project, entity=wandb_cfg.entity,
                           name=wandb_cfg.run_name)
                # assign only AFTER init succeeds: a failed init (no
                # credentials/offline) must leave _wandb unset or every
                # later log() would crash the run
                self._wandb = wandb
            except Exception as e:  # missing module or no credentials
                print(f"[logger] wandb unavailable ({e}); falling back to JSONL only")

    def dump_config(self, cfg) -> str:
        """Persist the fully composed run config as ``config.yaml`` in the
        run directory (Hydra-parity: the reference's runs carry
        ``.hydra/config.yaml``).  The dump is a resolved flat config (no
        ``defaults:`` list), so ``python evaluate.py --config-path
        <run_dir> --config-name config`` rebuilds the EXACT trained model —
        including model-affecting levers like ``gelu_approximate`` that a
        re-typed CLI invocation can silently drop.

        Guarded like every other logger convenience (wandb init, metric
        coercion): a programmatic config carrying a non-YAML-native value
        (e.g. a numpy scalar from a sweep driver — ``yaml.safe_dump``
        raises RepresenterError) must not kill the training run over a
        reproducibility nicety."""
        import yaml

        from meg_decoding_tpu.core.config import to_dict

        path = os.path.join(self.run_dir, "config.yaml")
        try:
            text = yaml.safe_dump(to_dict(cfg), sort_keys=False)
            with open(path, "w") as f:
                f.write(text)
        except Exception as e:  # noqa: BLE001
            print(f"[logger] config dump failed ({e}); run continues "
                  f"without {path}")
            return None
        return path

    def log(self, metrics: dict):
        metrics = {k: (float(v) if hasattr(v, "__float__") else v)
                   for k, v in metrics.items()}
        with open(self.path, "a") as f:
            f.write(json.dumps(metrics) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics)

    def summary(self, epoch: int, epochs: int, metrics: dict):
        parts = [f"Ep {epoch}/{epochs}"]
        for k, v in metrics.items():
            if k == "epoch":
                continue
            parts.append(f"{k}: {float(v):.4f}" if hasattr(v, "__float__") else f"{k}: {v}")
        print(" | ".join(parts), flush=True)
