"""Kamitani feature-prediction pipeline, vmapped over units.

Reference: ``examples/kamitani_regression.py`` — per-unit Python loop
(:531-618): normalize x/y, select top-n voxels by |corr| with the unit,
add bias, SLiR fit/predict, denormalize; then category-averaged pairwise
identification (:163-213, ``get_averaged_feature`` :621-629).

TPU-native: all units run in ONE vmapped jitted program — voxel selection is
a batched top-k gather, and the ARD iterations for all 512 units execute as
batched matmuls on the MXU (the reference fits units serially on CPU,
seconds per unit).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from meg_decoding_tpu.kamitani.helpers import corrmat
from meg_decoding_tpu.kamitani.slir import slir_fit, slir_predict

__all__ = ["feature_prediction", "get_averaged_feature", "pairwise_identification_rate"]


def feature_prediction(x_train, y_train, x_test, y_test, n_voxel: int = 500,
                       n_iter: int = 200):
    """Predict every image-feature unit from brain data.

    x_*: (N, V) brain features; y_*: (N, U) image features.
    Returns (y_predicted (N_test, U), y_true (N_test, U)).
    """
    x_train = np.asarray(x_train, np.float64)
    x_test = np.asarray(x_test, np.float64)
    y_train = np.asarray(y_train, np.float64)
    y_test = np.asarray(y_test, np.float64)
    n_voxel = min(n_voxel, x_train.shape[1])

    # normalize brain data with train stats (:553-558)
    mx = x_train.mean(0)
    sx = x_train.std(0, ddof=1)
    sx = np.where(sx == 0, 1.0, sx)
    xtr = (x_train - mx) / sx
    xte = (x_test - mx) / sx

    # normalize each feature unit (:576-581)
    my = y_train.mean(0)
    sy = y_train.std(0, ddof=1)
    sy = np.where(sy == 0, 1.0, sy)
    ytr = (y_train - my) / sy  # (N, U)

    # per-unit voxel selection by |corr| (:584-588) — one corr matmul
    C = np.abs(corrmat(ytr.T, xtr.T))  # (U, V)
    C = np.where(np.isnan(C), -np.inf, C)
    top_idx = np.argsort(-C, axis=1)[:, :n_voxel]  # (U, n_voxel)

    # gather per-unit design matrices + bias column
    Xtr_units = xtr[:, top_idx]            # (N, U, n_voxel) via fancy index
    Xtr_units = np.transpose(Xtr_units, (1, 0, 2))  # (U, N, n_voxel)
    Xte_units = np.transpose(xte[:, top_idx], (1, 0, 2))
    ones_tr = np.ones((*Xtr_units.shape[:2], 1))
    ones_te = np.ones((*Xte_units.shape[:2], 1))
    Xtr_units = np.concatenate([Xtr_units, ones_tr], -1).astype(np.float32)
    Xte_units = np.concatenate([Xte_units, ones_te], -1).astype(np.float32)

    # vmapped ARD fit over units
    fit = jax.vmap(lambda X, y: slir_fit(X, y[:, None], n_iter=n_iter))
    W, A, SY, mask = fit(jnp.asarray(Xtr_units), jnp.asarray(ytr.T))
    preds = jax.vmap(slir_predict)(W, jnp.asarray(Xte_units))  # (U, N_test, 1)
    y_pred = np.asarray(preds)[:, :, 0].T  # (N_test, U)

    # denormalize (:607)
    y_pred = y_pred * sy + my
    return y_pred, y_test


def get_averaged_feature(pred_y, true_y, labels):
    """Category-averaged features (reference :621-629)."""
    labels = np.asarray(labels)
    labels_set = np.unique(labels)
    pred_av = np.stack([pred_y[labels == c].mean(0) for c in labels_set])
    true_av = np.stack([true_y[labels == c].mean(0) for c in labels_set])
    return pred_av, true_av, labels_set


def pairwise_identification_rate(pred, candidates):
    """Pairwise identification correct rate per prediction
    (reference ``get_pwident_correctrate`` :191-213): for prediction i, the
    fraction of candidates j≠i whose correlation with pred_i does not exceed
    that of the true candidate i."""
    simmat = corrmat(np.asarray(pred), np.asarray(candidates))  # (P, C)
    P, C = simmat.shape
    correct = np.diagonal(simmat)[:, None]
    wins = np.sum(simmat > correct, axis=1)
    return (C - 1 - wins) / float(C - 1)
