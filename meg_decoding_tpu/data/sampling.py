"""Pure-function batch samplers (PRNG-key-driven).

Reference: ``meg_decoding/utils/get_dataloaders.py`` — ``get_samplers`` uses
``RandomSampler(replacement=True, num_samples=updates*batch_size)`` (48-68),
defining an epoch as a fixed number of update steps (the mode actually used
for Gwilliams/GOD, ``configs/config.yaml:11``); ``get_dataloaders`` is plain
shuffle-batching (4-45).  The GOD CV split uses fixed index ranges
(``train_wowandb_cv.py:145-148``).

Everything is a pure function of a JAX PRNG key → reproducible, jit-able, and
device-resident (no host DataLoader processes; batches are gathered from
device-resident packed arrays).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "sample_with_replacement",
    "shuffle_batches",
    "god_cv_split",
    "random_split",
]


def sample_with_replacement(key, n: int, updates: int, batch_size: int) -> jnp.ndarray:
    """(updates, batch_size) indices drawn i.i.d. with replacement from [0, n)."""
    return jax.random.randint(key, (updates, batch_size), 0, n)


def shuffle_batches(key, n: int, batch_size: int, drop_last: bool = True) -> np.ndarray:
    """Shuffled epoch split into batches. Returns (num_batches, batch_size)
    (drop_last) or a list of index arrays (keep last partial)."""
    perm = np.asarray(jax.random.permutation(key, n))
    num_full = n // batch_size
    if drop_last:
        return perm[: num_full * batch_size].reshape(num_full, batch_size)
    out = [perm[i * batch_size : (i + 1) * batch_size] for i in range(num_full)]
    if n % batch_size:
        out.append(perm[num_full * batch_size :])
    return out


def god_cv_split(num_per_subject: int = 3600, num_subjects: int = 2,
                 test_fraction_start: int = 3000):
    """The reference's fixed-index GOD CV split (train_wowandb_cv.py:145-148):
    per subject-block of 3600 epochs, [0,3000) train and [3000,3600) test.
    Generalized to ``num_subjects`` consecutive blocks."""
    ind_tr, ind_te = [], []
    for s in range(num_subjects):
        base = s * num_per_subject
        ind_tr += list(range(base, base + test_fraction_start))
        ind_te += list(range(base + test_fraction_start, base + num_per_subject))
    return np.asarray(ind_tr), np.asarray(ind_te)


def random_split(key, n: int, split_ratio: float) -> tuple[np.ndarray, np.ndarray]:
    """Shuffle-split indices (the reference's ``torch.random_split`` path,
    ``train.py:73-77``)."""
    perm = np.asarray(jax.random.permutation(key, n))
    n_train = int(round(n * split_ratio))
    return perm[:n_train], perm[n_train:]
