"""Cross-entropy semantics check — the reference's
``notebooks/check_cross_entropy.ipynb`` (torch CE with hard integer targets
vs SOFT probability targets, the mechanism behind
``MyCLIPLikeClassificationLoss``'s smoothed same-category labels,
``loss.py:175-187``) reproduced against this framework's jax
implementation, with the closed-form expectation printed alongside.

    python examples/check_cross_entropy.py
"""

import os
import sys

import numpy as np

import jax.nn
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the notebook's dummy logits: 4 samples × 5 classes
LOGITS = np.array(
    [[1, 2, 1, 1, 2], [1, 1, 1, 1, 3], [1, 1, 2, 2, 1], [6, 1, 0, 0, 0]],
    np.float32)


def ce_hard(logits, targets):
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    return -jnp.take_along_axis(logp, jnp.asarray(targets)[:, None], 1)[:, 0]


def ce_soft(logits, target_probs):
    """torch CrossEntropyLoss with probability targets: −Σ p·log_softmax —
    note it does NOT renormalize p, so a 0.5 target row halves the loss
    (exactly what the notebook observed)."""
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    return -jnp.sum(jnp.asarray(target_probs) * logp, axis=-1)


def main():
    hard = np.asarray(ce_hard(LOGITS, np.zeros(4, np.int64)))
    print("hard targets [0,0,0,0]:", np.round(hard, 4))

    soft = np.array([[0.5, 0, 0, 0, 0],
                     [1, 0, 0, 0, 0],
                     [1, 0, 0, 0, 0],
                     [1, 0, 0, 0, 0]], np.float32)
    s = np.asarray(ce_soft(LOGITS, soft))
    print("soft targets (first row p=0.5):", np.round(s, 4))
    assert np.allclose(s[0], 0.5 * hard[0], rtol=1e-6), \
        "un-normalized soft targets scale the loss"
    assert np.allclose(s[1:], hard[1:], rtol=1e-6)

    # smoothed same-category labels as the GOD classification loss builds
    # them (smooth_value spread over the same-category gallery columns)
    smooth_value = 0.1
    same_cat = np.array([[1, 0, 0, 1, 0]], np.float32)  # cols 0,3 same cat
    target = same_cat * smooth_value / same_cat.sum()
    target[0, 0] += 1.0 - smooth_value
    print("smoothed target row:", target[0], "(sums to", target.sum(), ")")
    print("smoothed CE:", float(ce_soft(LOGITS[:1], target)[0]))

    # torch oracle when available (test-only dependency)
    try:
        import torch

        t = torch.nn.CrossEntropyLoss(reduction="none")
        th = t(torch.tensor(LOGITS), torch.zeros(4, dtype=torch.long)).numpy()
        ts = t(torch.tensor(LOGITS), torch.tensor(soft)).numpy()
        assert np.allclose(th, hard, rtol=1e-5)
        assert np.allclose(ts, s, rtol=1e-5)
        print("torch CrossEntropyLoss agrees (hard + soft targets)")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
