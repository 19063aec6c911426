"""SLiR — ARD-style sparse linear regression (Kamitani-lab baseline).

Reference: ``meg_decoding/kamitani_lab/slir.py`` (a vendored copy of the
public KamitaniLab/slir): iterative ARD updates
``A ← sqrt(A · (WW/SY) / (G_A · L))`` with noise-variance re-estimation and
dimension pruning, sklearn estimator API.

TPU-first redesign: the reference prunes by *physically shrinking* arrays
each iteration (dynamic shapes — hostile to XLA).  ``slir_fit`` keeps static
shapes and prunes by **masking**: pruned features get their alpha forced to
~0 contribution.  The whole fit is a ``lax.fori_loop`` and is ``vmap``-able
over output units — the reference driver fits units in a Python loop
(``examples/kamitani_regression.py``); here all units fit in parallel on the
MXU.  A numpy sklearn-style wrapper keeps the classic API.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["slir_fit", "slir_predict", "SparseLinearRegression"]


@partial(jax.jit, static_argnames=("n_iter", "prune_mode"))
def slir_fit(X, Y, n_iter: int = 200, minval: float = 1e-15,
             prune_mode: int = 1, prune_threshold: float = 1e-10):
    """ARD regression with masked pruning.

    X: (N, D) features; Y: (N, L) targets.  Returns (W (L, D), A (D,), SY,
    mask (D,) bool).  Matches the reference's update equations with pruning
    expressed as a persistent boolean mask (dims with relative alpha below
    ``prune_threshold`` are frozen out).
    """
    X = jnp.asarray(X, jnp.float32).T  # (D, N)
    Y = jnp.asarray(Y, jnp.float32).T  # (L, N)
    D, N = X.shape
    L = Y.shape[0]

    X_var = jnp.mean(X**2, axis=1)
    SY0 = jnp.mean(jnp.mean(Y**2, axis=1))
    alpha0 = jnp.maximum(1.0 / jnp.mean(X_var), minval)
    A = jnp.full((D,), alpha0)
    mask = jnp.ones((D,), bool)

    YX = Y @ X.T            # (L, D)
    sumYY = jnp.sum(Y**2)

    use_dual = N < D  # the N×N woodbury branch vs the D×D normal branch
    XXT = None if use_dual else X @ X.T  # (D, D)

    def _solve(Am):
        """Posterior weight + gain for prior variances Am (pruned dims = 0).

        Primal form is rewritten with symmetric √A scaling so pruning needs
        no 1/A (f32-safe): with B = diag(√A), SW' = B·XXᵀ·B + I,
        W = YX·B·inv(SW')·B and G_A = diag(B·XXᵀ·B·inv(SW'))."""
        if use_dual:
            XA = X.T * Am[None, :]                   # (N, D)
            CC = XA @ X + jnp.eye(N)                 # (N, N)
            XC = X @ jnp.linalg.pinv(CC)             # (D, N)
            W = YX * Am[None, :]
            W = W - (W @ XC) @ XA                    # (L, D)
            G_A = Am * jnp.sum(X * XC, axis=1)
        else:
            s = jnp.sqrt(Am)                          # (D,)
            G = (s[:, None] * XXT) * s[None, :]
            inv_SWp = jnp.linalg.pinv(G + jnp.eye(D))
            W = ((YX * s[None, :]) @ inv_SWp) * s[None, :]
            G_A = jnp.sum(G * inv_SWp.T, axis=1)      # diag(G @ inv_SWp)
        return W, G_A

    def body(_, carry):
        A, mask, SY = carry
        Am = jnp.where(mask, A, 0.0)  # pruned dims contribute nothing
        W, G_A = _solve(Am)

        WW = jnp.sum(W**2, axis=0)                   # (D,)
        SY = (sumYY - jnp.sum(W * YX)) / (L * N)
        # reference slir.py:177-183: when the quick noise estimate collapses
        # (interpolating regime), re-estimate from residuals + weight/alpha
        # penalty, which stays bounded away from zero
        resid = Y - W @ X
        penalty = jnp.sum(jnp.where(mask, WW / jnp.maximum(A, minval), 0.0))
        SY_fallback = (jnp.sum(resid**2) + penalty) / (L * N)
        SY = jnp.where(SY / SY0 < 1e-6, jnp.maximum(SY_fallback, minval), SY)
        G_A = jnp.maximum(G_A, minval)
        A_new = jnp.sqrt(jnp.maximum(A, minval) * (WW / SY) / (G_A * L))
        # f32 safety cap; alpha this large is already "fully relevant"
        A_new = jnp.minimum(jnp.where(mask, A_new, 0.0), 1e8)

        if prune_mode == 1:
            rel = A_new / jnp.maximum(jnp.max(A_new), minval)
        elif prune_mode == 2:
            rel = WW / jnp.maximum(jnp.max(WW), minval)
        else:
            rel = jnp.ones_like(A_new)
        new_mask = mask & (rel > prune_threshold) if prune_mode > 0 else mask
        # never prune everything
        new_mask = jax.lax.cond(jnp.any(new_mask), lambda: new_mask, lambda: mask)
        return (jnp.maximum(A_new, 0.0), new_mask, SY)

    A, mask, SY = jax.lax.fori_loop(0, n_iter, body, (A, mask, SY0))

    # final weights at converged alpha
    Am = jnp.where(mask, A, 0.0)
    W, _ = _solve(Am)
    return W, Am, SY, mask


def slir_predict(W, X):
    """(L, D) weights × (N, D) features → (N, L) predictions."""
    return jnp.asarray(X, jnp.float32) @ W.T


class SparseLinearRegression:
    """sklearn-style wrapper over the jitted masked ARD fit
    (drop-in for the reference's estimator API, ``slir.py:12-276``)."""

    def __init__(self, n_iter=200, minval=1.0e-15, prune_mode=1,
                 prune_threshold=1.0e-10, verbose=False):
        self.n_iter = n_iter
        self.minval = minval
        self.prune_mode = prune_mode
        self.prune_threshold = prune_threshold
        self.verbose = verbose

    def fit(self, X, y):
        y = np.asarray(y)
        if y.ndim == 1:
            y = y[:, None]
        W, A, SY, mask = slir_fit(
            np.asarray(X), y, n_iter=self.n_iter, minval=self.minval,
            prune_mode=self.prune_mode, prune_threshold=self.prune_threshold,
        )
        self.coef_ = np.asarray(W).squeeze()
        self.lambda_ = np.asarray(A)
        self.alpha_ = float(SY)
        self.valid_index_list = np.where(np.asarray(mask))[0]
        self._W = np.asarray(W)
        return self

    def predict(self, X):
        C = np.asarray(slir_predict(jnp.asarray(self._W), np.asarray(X)))
        return C.flatten() if C.shape[1] == 1 else C
