"""Orbax checkpointing: full TrainState (params + opt state + step + PRNG).

Reference saves only ``state_dict`` → ``model_last.pt`` each epoch and
``model_best.pt`` on best test top-10 (``train.py:274``,
``train_wowandb_cv.py:349-357``); eval prefers best, falls back to last
(``eval_wowandb_cv.py:213-221``).  Same last/best layout here, but the
checkpoint carries everything needed for exact resume (SURVEY §5.4 gap).

Corruption resilience (SURVEY §5.3 — the reference has none): every save is
double-buffered.  The new checkpoint is written beside the old one
(``<name>.new``), then the generations rotate with atomic directory renames —
the previous complete checkpoint survives as ``<name>.old`` until the next
save.  A crash at ANY point leaves at least one complete generation on disk,
and ``restore`` tries ``name.new → name → name.old`` — newest complete
generation first (a crash mid-rotation leaves ``.new`` as the freshest).
"""

from __future__ import annotations

import os
import shutil
import warnings
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
        """Double-buffered save: write ``<name>.new`` fully, then rotate
        ``<name>`` → ``<name>.old`` → deleted.  The previous complete
        checkpoint is never touched until the new one is on disk."""
        new, cur, old = (self._path(name + ".new"), self._path(name),
                         self._path(name + ".old"))
        self._ckptr.save(new, state, force=True)
        self._ckptr.wait_until_finished()
        if os.path.isdir(old):
            shutil.rmtree(old)
        if os.path.isdir(cur):
            os.rename(cur, old)
        os.rename(new, cur)

    def restore(self, name: str, abstract_state: Any):
        """Restore into the structure of ``abstract_state`` (a concrete state
        with the right shapes/dtypes, e.g. a freshly initialized one).

        Falls back across generations when the preferred directory is
        missing or fails to load.  ``<name>.new`` is tried FIRST: in normal
        operation it does not exist (``save`` renames it away), but a crash
        after the ``.new`` write completed and before the rotation renames
        leaves BOTH ``name`` (older) and a COMPLETE ``.new`` (newest) on
        disk — preferring ``name`` there would silently lose the last save.
        A partial ``.new`` (crash mid-write) simply fails to restore and
        falls through to ``name`` → ``.old``."""
        errors = []
        for cand in (name + ".new", name, name + ".old"):
            path = self._path(cand)
            if not os.path.isdir(path):
                continue
            try:
                restored = self._ckptr.restore(path, abstract_state)
            except Exception as e:  # corrupt/partial generation: try older
                errors.append(f"{cand}: {type(e).__name__}: {e}")
                continue
            if cand != name:
                warnings.warn(
                    f"restored generation '{cand}' of checkpoint '{name}'"
                    + (f" (errors: {'; '.join(errors)})" if errors else "")
                )  # '.new' = newest complete write left by a crash
                # mid-rotation; '.old' = the generation before 'name'
            return restored
        raise FileNotFoundError(
            f"no restorable checkpoint '{name}' under {self.ckpt_dir}"
            + (f" (errors: {'; '.join(errors)})" if errors else ""))

    def exists(self, name: str) -> bool:
        """True when any restorable generation of ``name`` is present."""
        return any(os.path.isdir(self._path(n))
                   for n in (name, name + ".old", name + ".new"))

    def load_best_or_last(self, abstract_state: Any):
        """Eval-side preference: best, else last (eval_wowandb_cv.py:213-221)."""
        for name in ("model_best", "model_last"):
            if self.exists(name):
                return self.restore(name, abstract_state), name
        raise FileNotFoundError(f"no checkpoint under {self.ckpt_dir}")
