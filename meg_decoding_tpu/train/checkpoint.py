"""Orbax checkpointing: full TrainState (params + opt state + step + PRNG).

Reference saves only ``state_dict`` → ``model_last.pt`` each epoch and
``model_best.pt`` on best test top-10 (``train.py:274``,
``train_wowandb_cv.py:349-357``); eval prefers best, falls back to last
(``eval_wowandb_cv.py:213-221``).  Same last/best layout here, but the
checkpoint carries everything needed for exact resume (SURVEY §5.4 gap).
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    def __init__(self, ckpt_dir: str):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.ckpt_dir, name)

    def save(self, name: str, state: Any):
        path = self._path(name)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()

    def restore(self, name: str, abstract_state: Any):
        """Restore into the structure of ``abstract_state`` (a concrete state
        with the right shapes/dtypes, e.g. a freshly initialized one)."""
        return self._ckptr.restore(self._path(name), abstract_state)

    def exists(self, name: str) -> bool:
        return os.path.isdir(self._path(name))

    def load_best_or_last(self, abstract_state: Any):
        """Eval-side preference: best, else last (eval_wowandb_cv.py:213-221)."""
        for name in ("model_best", "model_last"):
            if self.exists(name):
                return self.restore(name, abstract_state), name
        raise FileNotFoundError(f"no checkpoint under {self.ckpt_dir}")
