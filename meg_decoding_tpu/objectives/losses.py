"""Auxiliary losses: MSE, same-label pull, GOD classification-vs-gallery.

Reference: ``meg_decoding/utils/loss.py`` — ``MSELoss`` (43-52),
``SameLabelLoss`` (17-38), ``MyCLIPLikeClassificationLoss`` (115-249).
All reference Python loops are vectorized; gallery features are passed in as
arrays (the reference loads them from disk inside the loss, ``loss.py:149-166``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from meg_decoding_tpu.objectives.clip import _normalize

__all__ = [
    "mse_loss",
    "same_label_loss",
    "classification_logits",
    "clip_like_classification_loss",
    "smooth_category_targets",
]


def mse_loss(Y: jnp.ndarray, Z: jnp.ndarray) -> jnp.ndarray:
    """Squared error summed over all non-batch dims, averaged over batch
    (reference ``loss.py:43-52``)."""
    se = (Y - Z) ** 2
    return jnp.mean(jnp.sum(se.reshape(se.shape[0], -1), axis=-1))


def same_label_loss(Z: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Pull embeddings of same-label samples together via pairwise MSE.

    Vectorizes the reference's double Python loop (``loss.py:28-37``).  The
    reference anchors at ``Z[label]`` (an apparent index bug); here the anchor
    is ``Z[i]`` — the intended semantics — and the pair (i, j) contributes
    ``mean((Z[i]-Z[j])²)`` for every j≠i with the same label.
    """
    B = Z.shape[0]
    Z = Z.reshape(B, -1)  # seq2seq (B, F, T) embeddings flatten like clip.py
    same = labels[:, None] == labels[None, :]
    mask = same & ~jnp.eye(B, dtype=bool)
    d2 = jnp.mean((Z[:, None, :] - Z[None, :, :]) ** 2, axis=-1)  # (B, B)
    count = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, d2, 0.0)) / count


def smooth_category_targets(
    labels: jnp.ndarray,
    gallery_size: int,
    same_category_length: int = 8,
    smooth_value: float = 0.1,
) -> jnp.ndarray:
    """Smoothed one-hot targets over the training gallery.

    Reference intent (``loss.py:175-187``): besides the true index, the
    other images of the label's 8-image category block receive
    ``smooth_value``.  The reference computes the block with ``l % 8`` —
    inside a condition that is always False (``loss.py:179`` ands two
    incompatible mode checks), i.e. dead code; the live semantics here use
    the label's actual category ``l // 8``.  labels are 0-indexed (the
    reference subtracts 1 at ``loss.py:191``).
    """
    B = labels.shape[0]
    cols = jnp.arange(gallery_size)[None, :]
    l_cat = (labels // same_category_length)[:, None]
    block = (cols >= l_cat * same_category_length) & (
        cols < (l_cat + 1) * same_category_length
    )
    targets = jnp.where(block, smooth_value, 0.0)
    targets = targets.at[jnp.arange(B), labels].set(1.0)
    return targets


def classification_logits(x: jnp.ndarray, gallery: jnp.ndarray, temp) -> jnp.ndarray:
    """Cosine logits of predictions against a fixed gallery, scaled by e^temp
    (reference ``loss.py:217-229``)."""
    x = _normalize(x.reshape(x.shape[0], -1))
    g = _normalize(gallery.reshape(gallery.shape[0], -1))
    return jnp.dot(x, g.T, preferred_element_type=jnp.float32) * jnp.exp(temp)


def clip_like_classification_loss(
    x: jnp.ndarray,
    labels: jnp.ndarray,
    gallery: jnp.ndarray,
    temp,
    criterion: str = "crossentropy",
    train: bool = True,
    smooth_value: float = 0.1,
    same_category_length: int = 8,
    gallery_self_similarity: jnp.ndarray | None = None,
):
    """GOD classification-against-gallery loss, three criterion modes
    (reference ``loss.py:120-136, 190-244``).  ``labels`` are 0-indexed.

    - ``crossentropy``: CE against smoothed category targets (train) or hard
      labels (eval).
    - ``binary_crossentropy``: sigmoid + BCE against the same targets.
    - ``similarity_crossentropy``: soft targets = softmax of the gallery's
      self-similarity row scaled by e^temp (train); hard labels (eval).
    """
    logits = classification_logits(x, gallery, temp)
    G = gallery.shape[0]

    if criterion == "crossentropy":
        if train:
            targets = smooth_category_targets(labels, G, same_category_length, smooth_value)
            # torch CrossEntropyLoss with soft targets: mean over batch of
            # -sum(target * logprob)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(jnp.sum(targets * logp, axis=-1))
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))

    if criterion == "binary_crossentropy":
        if train:
            targets = smooth_category_targets(labels, G, same_category_length, smooth_value)
        else:
            targets = jax.nn.one_hot(labels, G)
        p = jax.nn.sigmoid(logits)
        p = jnp.clip(p, 1e-7, 1 - 1e-7)
        return -jnp.mean(targets * jnp.log(p) + (1 - targets) * jnp.log(1 - p))

    if criterion == "similarity_crossentropy":
        logp = jax.nn.log_softmax(logits, axis=-1)
        if train:
            assert gallery_self_similarity is not None
            rows = gallery_self_similarity[labels]  # (B, G)
            targets = jax.nn.softmax(rows * jnp.exp(temp), axis=-1)
            return -jnp.mean(jnp.sum(targets * logp, axis=-1))
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))

    raise ValueError(f"unknown criterion {criterion!r}")
