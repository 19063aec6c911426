"""Device-resident packed dataset: the framework's replacement for
host-side ``torch.utils.data.Dataset`` + DataLoader workers.

After preprocessing, each dataset is a set of fixed-shape arrays living in
HBM (they are small: e.g. GOD is 7200 × 160ch × 24 samples ≈ 110 MB f32).
A training "loader" is then just (PRNG key → index array → device gather →
jitted collate kernel) — no worker processes, no host↔device copies in the
steady state (reference relied on ``num_workers: 6`` host workers,
``configs/config.yaml:15``, ``get_dataloaders.py:13``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["PackedDataset"]


@dataclasses.dataclass
class PackedDataset:
    """Epoched, device-ready arrays.

    X: (N, C, T) brain epochs; Y: (N, F) or (N, F, T') stimulus latents;
    subject_idxs: (N,); labels: (N,) optional (GOD image ids, 0-indexed).
    """

    X: jnp.ndarray
    Y: jnp.ndarray
    subject_idxs: jnp.ndarray
    labels: Optional[jnp.ndarray] = None
    num_subjects: int = 1
    # normalization stats kept for reuse on the val split (god.py:44-65)
    mean_X: Optional[np.ndarray] = None
    std_X: Optional[np.ndarray] = None
    mean_Y: Optional[np.ndarray] = None
    std_Y: Optional[np.ndarray] = None

    def __len__(self) -> int:
        return int(self.X.shape[0])

    @property
    def host_resident(self) -> bool:
        return isinstance(self.X, np.ndarray)

    def gather(self, idx) -> tuple:
        """Index a batch; idx may be a host or device int array.  On a
        host-resident dataset (``to_host``) this is a numpy slice — the
        batch is then moved to device by the prefetch pipeline
        (``data/prefetch.py``), not here."""
        idx = np.asarray(idx) if self.host_resident else jnp.asarray(idx)
        out = [self.X[idx], self.Y[idx], self.subject_idxs[idx]]
        if self.labels is not None:
            out.append(self.labels[idx])
        return tuple(out)

    def to_host(self) -> "PackedDataset":
        """Spill the packed arrays to host RAM (numpy) for datasets that
        exceed HBM; train with ``prefetch: N`` so the host→device copy of
        each batch rides under the previous step's compute (SURVEY §2.11
        'host→device prefetch pipeline')."""
        return dataclasses.replace(
            self,
            X=np.asarray(self.X),
            Y=np.asarray(self.Y),
            subject_idxs=np.asarray(self.subject_idxs),
            labels=None if self.labels is None else np.asarray(self.labels),
        )

    def subset(self, idx) -> "PackedDataset":
        idx = np.asarray(idx)
        return dataclasses.replace(
            self,
            X=self.X[idx],
            Y=self.Y[idx],
            subject_idxs=self.subject_idxs[idx],
            labels=None if self.labels is None else self.labels[idx],
        )
