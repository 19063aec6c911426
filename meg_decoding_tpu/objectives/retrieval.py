"""Retrieval / identification metrics.

Reference: ``meg_decoding/models.py:386-460`` (``Classifier`` — cosine
retrieval filled by an **O(B²) Python double loop**), ``evaluate.py:32-82``
(``zero_shot_classification`` vs the 50-image gallery), and
``evaluate.py:191-249`` (pairwise identification accuracy via correlation /
cosine, matching ``assets/evaluate.m``).

Everything here is one matmul + top-k on device — jit-able and batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "cosine_similarity_matrix",
    "retrieval_accuracy",
    "zero_shot_classification",
    "pairwise_identification",
    "pairwise_identification_gallery",
]

EPS = 1e-8


def cosine_similarity_matrix(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """sim[i, j] = cos(x_i, y_j), clamping norms at 1e-8 like the reference
    (``models.py:427``)."""
    x = x.reshape(x.shape[0], -1)
    y = y.reshape(y.shape[0], -1)
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), EPS)
    yn = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), EPS)
    return jnp.dot(xn, yn.T, preferred_element_type=jnp.float32)


def _topk_contains(sim: jnp.ndarray, targets: jnp.ndarray, k: int) -> jnp.ndarray:
    """For each row, is the target column within the k best scores?"""
    k = min(k, sim.shape[1])
    _, top_idx = jax.lax.top_k(sim, k)
    return jnp.any(top_idx == targets[:, None], axis=-1)


def retrieval_accuracy_from_sim(sim: jnp.ndarray, top_ks=(1, 10)):
    """Top-k diagonal retrieval given a precomputed (B, B) similarity whose
    rows are Y and columns Z (the reference's transposed orientation,
    ``models.py:432``).  Any positively-scaled similarity gives identical
    rankings — in particular the CLIP loss's temperature-scaled logits
    (``clip_loss(Y, Z, return_logits=True)``), which the train step reuses
    so the metrics cost no second normalize + matmul."""
    targets = jnp.arange(sim.shape[0])
    out = {}
    for k in top_ks:
        if k == 1:
            out["top1"] = jnp.mean(jnp.argmax(sim, axis=1) == targets)
        else:
            out[f"top{k}"] = jnp.mean(_topk_contains(sim, targets, k))
    return out


def retrieval_accuracy(Z, Y, top_ks=(1, 10)):
    """Diagonal retrieval accuracy: for matched batches (Z_i ↔ Y_i), the
    fraction of rows whose own column ranks in the top-k.

    The reference transposes the similarity matrix before scoring
    (``models.py:432``), i.e. it scores *Y rows against Z columns*; matched
    here exactly.  Returns dict {f'top{k}': acc}.
    """
    sim = cosine_similarity_matrix(Z, Y).T  # (B, B): rows = Y, cols = Z
    return retrieval_accuracy_from_sim(sim, top_ks)


def zero_shot_classification(Z, gallery, labels, top_ks=(1, 10)):
    """Classify each prediction against a fixed gallery by cosine similarity
    (reference ``evaluate.py:32-82``).  ``labels`` are 0-indexed gallery rows.
    Returns dict {f'top{k}': acc}."""
    sim = cosine_similarity_matrix(Z, gallery)  # (B, G)
    out = {}
    for k in top_ks:
        if k == 1:
            out["top1"] = jnp.mean(jnp.argmax(sim, axis=1) == labels)
        else:
            out[f"top{k}"] = jnp.mean(_topk_contains(sim, labels, k))
    return out


def _rowwise_corr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """corr[i, j] = Pearson correlation of a_i with b_j."""
    a = a - a.mean(axis=1, keepdims=True)
    b = b - b.mean(axis=1, keepdims=True)
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), EPS)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), EPS)
    return jnp.dot(a, b.T, preferred_element_type=jnp.float32)


def pairwise_identification(Z, Y, metric: str = "correlation") -> jnp.ndarray:
    """Pairwise identification accuracy (reference ``evaluate.py:191-249``,
    ``assets/evaluate.m:14-35``): for each true pair (Z_i, Y_i), the fraction
    of distractors Y_j (j≠i) for which sim(Z_i, Y_i) > sim(Z_i, Y_j).
    Returns per-query accuracies (B,); mean is the headline number."""
    if metric == "correlation":
        sim = _rowwise_corr(Z.reshape(Z.shape[0], -1), Y.reshape(Y.shape[0], -1))
    elif metric == "cosine":
        sim = cosine_similarity_matrix(Z, Y)
    else:
        raise ValueError(metric)
    B = sim.shape[0]
    true_sim = jnp.diagonal(sim)[:, None]
    # the strict '>' already excludes the self comparison from the numerator
    wins = (true_sim > sim).astype(jnp.float32)
    return jnp.sum(wins, axis=1) / max(B - 1, 1)


def pairwise_identification_gallery(Z, gallery, target_idx,
                                    metric: str = "correlation") -> jnp.ndarray:
    """Pairwise identification against an explicit candidate gallery — the
    reference's headline GOD setup (evaluate.py:191-249 scores each
    prediction against the 50-image ``image_features.npy``; denominator
    G−1 = 49).  Returns per-query accuracies (B,)."""
    if metric == "correlation":
        sim = _rowwise_corr(Z.reshape(Z.shape[0], -1),
                            gallery.reshape(gallery.shape[0], -1))
    elif metric == "cosine":
        sim = cosine_similarity_matrix(Z, gallery)
    else:
        raise ValueError(metric)
    G = sim.shape[1]
    true_sim = jnp.take_along_axis(sim, target_idx[:, None], axis=1)
    wins = jnp.sum((true_sim > sim).astype(jnp.float32), axis=1)
    return wins / (G - 1)
