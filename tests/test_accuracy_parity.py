"""Accuracy anchor (VERDICT round-1 item 4, BASELINE.md criterion).

No real MEG ships in this image, so the "reference measurement" is
established on planted-signal synthetic data: Y is a known function of X
plus noise.  The torch replica of the reference stack
(tools/baseline_torch.py — architecture per ``meg_decoding/models.py:341-383``
incl. the per-sample subject-layer loop, CLIP loss per ``utils/loss.py:55-112``,
Adam) and this framework train from the SAME transplanted initial weights on
the SAME batch schedule with identical hyperparameters; final top-10
retrieval accuracy (metric per ``models.py:437-445``) must agree closely.

Round-2 finding recorded in RESULTS.md: with independent inits the two
stacks can land >20 points apart on this small task (init luck under a
retrieval objective), with transplanted inits they agree to ~2 points —
so the anchor pins init as well as dynamics.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
import torch
import torch.nn as nn

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from baseline_torch import BrainEncoder as TorchBrainEncoder  # noqa: E402
from baseline_torch import clip_loss as torch_clip_loss  # noqa: E402

from meg_decoding_tpu.models.brain_encoder import BrainEncoder
from meg_decoding_tpu.train.state import create_train_state
from meg_decoding_tpu.train.steps import (
    CollateConfig,
    LossConfig,
    make_train_step,
)

C, T, F = 12, 32, 24
D1, D2, K = 16, 24, 4
NSUB = 2
N_TRAIN, N_TEST, BATCH = 4096, 512, 64
STEPS = 1200
LR, TEMP0 = 1e-3, 2.0


def _t(x):
    return torch.tensor(np.asarray(x))


def _conv1d_w(k):  # flax (ks, in, out) → torch (out, in, ks)
    return _t(np.transpose(np.asarray(k), (2, 1, 0)))


def _dense_as_conv(k):  # flax Dense (in, out) → torch conv1d (out, in, 1)
    return _t(np.asarray(k).T[:, :, None])


def transplant_into_torch(params, tm: TorchBrainEncoder, n_sub: int):
    """Copy a flax BrainEncoder param tree into the torch replica."""
    with torch.no_grad():
        sb = params["subject_block"]
        tm.subject_block.sa.z_re.copy_(_t(sb["spatial_attention"]["z_re"]))
        tm.subject_block.sa.z_im.copy_(_t(sb["spatial_attention"]["z_im"]))
        tm.subject_block.conv.weight.copy_(_dense_as_conv(sb["conv"]["kernel"]))
        tm.subject_block.conv.bias.copy_(_t(sb["conv"]["bias"]))
        W = np.asarray(sb["subject_layer"]["weight"])
        for s in range(n_sub):
            tm.subject_block.subject_layer[s].weight.copy_(
                _t(W[s].T[:, :, None]))
        from tests.fixtures import transplant_conv_blocks

        transplant_conv_blocks(params, tm.blocks)
        tm.f1.weight.copy_(_dense_as_conv(params["conv_final1"]["kernel"]))
        tm.f1.bias.copy_(_t(params["conv_final1"]["bias"]))
        tm.f2.weight.copy_(_dense_as_conv(params["conv_final2"]["kernel"]))
        tm.f2.bias.copy_(_t(params["conv_final2"]["bias"]))


def _top10(Z, Y):
    """Reference retrieval metric (models.py:437-445): cosine similarity,
    hit when the true index appears in the top 10."""
    Z = Z / np.linalg.norm(Z, axis=1, keepdims=True)
    Yn = Y / np.linalg.norm(Y, axis=1, keepdims=True)
    ranks = (-(Z @ Yn.T)).argsort(1)
    return float(np.mean([i in ranks[i, :10] for i in range(len(Z))]))


@pytest.mark.slow
def test_seq2seq_planted_signal_top10_matches_torch_reference():
    """Speech-flagship head (seq2seq): CLIP over (B, F·T) embeddings.
    Planted mapping is a time-local linear map Y[:, f, t] = Σ_c X[:, c, t]
    W[c, f] + noise — learnable by the conv stack."""
    rng = np.random.RandomState(7)
    loc = rng.rand(C, 2).astype(np.float32) * 0.8 + 0.1
    W_plant = (rng.randn(C, F) * 1.5).astype(np.float32)
    steps = 800

    def planted(n):
        X = rng.randn(n, C, T).astype(np.float32)
        # heavy noise so top-10 lands mid-range: a saturated (=1.0) anchor
        # can't tell a slightly-wrong stack from a correct one.  The flat
        # (F·T = 768)-dim cosine averages the noise down by √768, so the
        # per-element noise must be several × the signal std (≈ √C·1.5) to keep
        # the true-match margin near the distractor spread
        Y = np.einsum("nct,cf->nft", X, W_plant) \
            + 30.0 * rng.randn(n, F, T).astype(np.float32)
        return X, Y.astype(np.float32), rng.randint(0, NSUB, n)

    Xtr, Ytr, Str = planted(N_TRAIN)
    Xte, Yte, Ste = planted(N_TEST)
    batch_idx = [rng.randint(0, N_TRAIN, BATCH) for _ in range(steps)]

    model = BrainEncoder(loc=loc, num_subjects=NSUB, D1=D1, D2=D2, F=F, K=K,
                         d_drop=0.0, seq2seq=True)
    opt = optax.adam(LR)
    state = create_train_state(
        model, opt,
        (jnp.asarray(Xtr[:BATCH]), jnp.asarray(Ytr[:BATCH]),
         jnp.asarray(Str[:BATCH])),
        jax.random.PRNGKey(0), init_temperature=TEMP0)

    torch.manual_seed(0)
    tm = TorchBrainEncoder(loc, d1=D1, d2=D2, f_dim=F, k_dim=K,
                           num_subjects=NSUB, seq2seq=True)
    transplant_into_torch(state.params["model"], tm, NSUB)
    temp = nn.Parameter(torch.tensor(TEMP0))
    topt = torch.optim.Adam(list(tm.parameters()) + [temp], lr=LR)

    step = make_train_step(model, opt, LossConfig(kind="clip"),
                           CollateConfig(enabled=False), donate=False)
    jax_losses, torch_losses = [], []
    for i in range(steps):
        b = batch_idx[i]
        state, m = step(state, jnp.asarray(Xtr[b]), jnp.asarray(Ytr[b]),
                        jnp.asarray(Str[b]))
        jax_losses.append(float(m["loss"]))
    for i in range(steps):
        b = batch_idx[i]
        topt.zero_grad()
        loss = torch_clip_loss(tm(_t(Xtr[b]), torch.tensor(Str[b])),
                               _t(Ytr[b]), temp)
        loss.backward()
        topt.step()
        torch_losses.append(float(loss.detach()))

    assert jax_losses[0] == pytest.approx(torch_losses[0], rel=1e-3)

    variables = {"params": state.params["model"],
                 "batch_stats": state.batch_stats}
    Z = np.asarray(model.apply(variables, jnp.asarray(Xte), jnp.asarray(Ste),
                               train=False)).reshape(N_TEST, -1)
    tm.eval()
    with torch.no_grad():
        Zt = tm(_t(Xte), torch.tensor(Ste)).numpy().reshape(N_TEST, -1)

    acc_jax = _top10(Z, Yte.reshape(N_TEST, -1))
    acc_torch = _top10(Zt, Yte.reshape(N_TEST, -1))
    print(f"seq2seq anchor: jax top10={acc_jax:.4f} "
          f"torch top10={acc_torch:.4f} diff={abs(acc_jax-acc_torch):.4f}")
    # both stacks must have learned well above the 10/512 = 2% chance level
    # (measured 0.250 vs 0.244 — mid-range, so the anchor can discriminate)...
    assert acc_jax > 0.15 and acc_torch > 0.15, (acc_jax, acc_torch)
    # ...and agree closely (measured 0.6 pts; gate 5 absorbs binomial noise)
    assert abs(acc_jax - acc_torch) <= 0.05, (acc_jax, acc_torch)


def _run_static_anchor(seed: int, steps: int = STEPS, n_test: int = N_TEST):
    """One paired run of the static-head anchor: both stacks, shared
    transplanted init, same batch schedule.  Returns (acc_jax, acc_torch)."""
    rng = np.random.RandomState(seed)
    loc = rng.rand(C, 2).astype(np.float32) * 0.8 + 0.1
    W_plant = (rng.randn(C, F) * 2.0).astype(np.float32)

    def planted(n):
        X = rng.randn(n, C, T).astype(np.float32)
        Y = (X.mean(-1) @ W_plant) + 0.05 * rng.randn(n, F).astype(np.float32)
        return X, Y.astype(np.float32), rng.randint(0, NSUB, n)

    Xtr, Ytr, Str = planted(N_TRAIN)
    Xte, Yte, Ste = planted(n_test)
    batch_idx = [rng.randint(0, N_TRAIN, BATCH) for _ in range(steps)]

    # --- jax framework ----------------------------------------------------
    model = BrainEncoder(loc=loc, num_subjects=NSUB, D1=D1, D2=D2, F=F, K=K,
                         d_drop=0.0)
    opt = optax.adam(LR)
    state = create_train_state(
        model, opt,
        (jnp.asarray(Xtr[:BATCH]), jnp.asarray(Ytr[:BATCH]),
         jnp.asarray(Str[:BATCH])),
        jax.random.PRNGKey(seed), init_temperature=TEMP0)

    # --- torch replica, SAME initial weights --------------------------------
    torch.manual_seed(seed)
    tm = TorchBrainEncoder(loc, d1=D1, d2=D2, f_dim=F, k_dim=K,
                           num_subjects=NSUB)
    transplant_into_torch(state.params["model"], tm, NSUB)
    temp = nn.Parameter(torch.tensor(TEMP0))
    topt = torch.optim.Adam(list(tm.parameters()) + [temp], lr=LR)

    step = make_train_step(model, opt, LossConfig(kind="clip"),
                           CollateConfig(enabled=False), donate=False)
    jax_losses, torch_losses = [], []
    for i in range(steps):
        b = batch_idx[i]
        state, m = step(state, jnp.asarray(Xtr[b]), jnp.asarray(Ytr[b]),
                        jnp.asarray(Str[b]))
        jax_losses.append(float(m["loss"]))
    for i in range(steps):
        b = batch_idx[i]
        topt.zero_grad()
        loss = torch_clip_loss(tm(_t(Xtr[b]), torch.tensor(Str[b])),
                               _t(Ytr[b]), temp)
        loss.backward()
        topt.step()
        torch_losses.append(float(loss.detach()))

    # transplant sanity: the very first loss must match to float tolerance
    assert jax_losses[0] == pytest.approx(torch_losses[0], rel=1e-3)

    variables = {"params": state.params["model"],
                 "batch_stats": state.batch_stats}
    Z = np.asarray(model.apply(variables, jnp.asarray(Xte), jnp.asarray(Ste),
                               train=False))
    tm.eval()
    with torch.no_grad():
        Zt = tm(_t(Xte), torch.tensor(Ste)).numpy()

    acc_jax, acc_torch = _top10(Z, Yte), _top10(Zt, Yte)
    print(f"accuracy anchor seed={seed}: jax top10={acc_jax:.4f} "
          f"torch top10={acc_torch:.4f} diff={abs(acc_jax-acc_torch):.4f}")
    return acc_jax, acc_torch


@pytest.mark.slow
def test_planted_signal_top10_matches_torch_reference():
    acc_jax, acc_torch = _run_static_anchor(seed=42)
    # both stacks must have learned the planted signal...
    assert acc_jax > 0.30 and acc_torch > 0.30, (acc_jax, acc_torch)
    # ...and agree closely (measured 2.2 points at 1200 steps; the gate
    # allows 5 to absorb estimator noise on the 512-sample eval set —
    # binomial std alone is ~2.2 points at p≈0.4)
    assert abs(acc_jax - acc_torch) <= 0.05, (acc_jax, acc_torch)


@pytest.mark.slow
def test_mean_seed_diff_certifies_1pt_criterion():
    """BASELINE.md's actual criterion is 1 POINT — uncertifiable from one
    paired run (binomial noise alone ~2.2 pts on a 512 gallery).  Average
    the PAIRED diff over 10 seeds scored on a 2048-sample gallery (both
    stacks share init + batch schedule per seed, scored on the same eval
    set, so the diff is dynamics divergence, not eval noise).

    Round 4 (VERDICT r3 weak #3): the round-3 design's CI half-width
    (±1.31 pts over 5 seeds × 512 gallery) exceeded the criterion it
    claimed to certify — a true +1.5-pt regression would have passed ~1/3
    of the time.  The gate now requires the measurement itself to be
    capable of certifying 1 pt: 95% CI half-width ≤ 1.0 pt AND
    |mean| ≤ 1 pt.  Measured values go in RESULTS.md."""
    seeds = tuple(range(1, 11))
    diffs, rows = [], []
    for s in seeds:
        aj, at = _run_static_anchor(seed=s, n_test=2048)
        diffs.append(aj - at)
        rows.append((s, aj, at))
    from scipy.stats import t as student_t

    mean_diff = float(np.mean(diffs))
    sem = float(np.std(diffs, ddof=1) / np.sqrt(len(diffs)))
    # Student-t critical value, not 1.96: with n=10 seeds the normal
    # quantile understates the interval (t(9)=2.262) — the gate must be
    # at least as wide as the claim it certifies
    half = float(student_t.ppf(0.975, len(diffs) - 1)) * sem
    print("seed table:", rows)
    print(f"mean paired diff={mean_diff*100:.2f} pts  "
          f"95% CI ±{half*100:.2f} pts (t, df={len(diffs)-1})")
    assert half <= 0.01, ("CI half-width exceeds the 1-pt criterion — "
                          "the design cannot certify it", half, rows)
    assert abs(mean_diff) <= 0.01, (mean_diff, rows)


def _run_gelu_pair(seed: int, n_test: int = 2048):
    """One paired run of the framework against ITSELF: exact-erf GELU (the
    reference's ``F.gelu`` default, ``models.py:358``) vs tanh-approximate
    GELU (PARITY deviation 17, the measured −21%-step-time throughput
    lever).  Same init (the flag changes no parameter shapes, so the same
    PRNGKey yields bit-identical initial weights), same planted data, same
    batch schedule — the paired diff isolates activation-function dynamics."""
    rng = np.random.RandomState(seed)
    loc = rng.rand(C, 2).astype(np.float32) * 0.8 + 0.1
    W_plant = (rng.randn(C, F) * 2.0).astype(np.float32)

    def planted(n):
        X = rng.randn(n, C, T).astype(np.float32)
        Y = (X.mean(-1) @ W_plant) + 0.05 * rng.randn(n, F).astype(np.float32)
        return X, Y.astype(np.float32), rng.randint(0, NSUB, n)

    Xtr, Ytr, Str = planted(N_TRAIN)
    Xte, Yte, Ste = planted(n_test)
    batch_idx = [rng.randint(0, N_TRAIN, BATCH) for _ in range(STEPS)]

    accs = []
    for tanh in (False, True):
        model = BrainEncoder(loc=loc, num_subjects=NSUB, D1=D1, D2=D2, F=F,
                             K=K, d_drop=0.0, gelu_approximate=tanh)
        opt = optax.adam(LR)
        state = create_train_state(
            model, opt,
            (jnp.asarray(Xtr[:BATCH]), jnp.asarray(Ytr[:BATCH]),
             jnp.asarray(Str[:BATCH])),
            jax.random.PRNGKey(seed), init_temperature=TEMP0)
        step = make_train_step(model, opt, LossConfig(kind="clip"),
                               CollateConfig(enabled=False), donate=False)
        for b in batch_idx:
            state, m = step(state, jnp.asarray(Xtr[b]), jnp.asarray(Ytr[b]),
                            jnp.asarray(Str[b]))
        variables = {"params": state.params["model"],
                     "batch_stats": state.batch_stats}
        Z = np.asarray(model.apply(variables, jnp.asarray(Xte),
                                   jnp.asarray(Ste), train=False))
        accs.append(_top10(Z, Yte))
    acc_exact, acc_tanh = accs
    print(f"gelu anchor seed={seed}: exact top10={acc_exact:.4f} "
          f"tanh top10={acc_tanh:.4f} diff={acc_tanh-acc_exact:+.4f}")
    return acc_exact, acc_tanh


@pytest.mark.slow
def test_tanh_gelu_certified_no_accuracy_loss():
    """Promotion gate for the tanh-GELU throughput lever (round 4): before
    the recommended config may enable ``gelu_approximate``, the paired
    design must certify NON-INFERIORITY against the 1-pt criterion: over
    10 paired seeds × 2048-sample gallery, the one-sided 97.5% LOWER
    confidence bound of the mean paired diff (tanh − exact) must lie above
    −1 pt.  One-sided on purpose: the criterion protects against accuracy
    LOSS; a measured improvement must not fail the gate.  Per-seed "has it
    learned" sanity uses 0.10 — 20× the 10/2048 ≈ 0.5% chance level but
    below the observed per-seed floor (the 10-seed range on this task is
    ~0.24-0.45; the single-anchor tests' 0.30 gate is calibrated to their
    own seeds, not these).  Values in RESULTS.md."""
    seeds = tuple(range(1, 21))  # round 5: 10 → 20 seeds (VERDICT r4 weak
    # #1: the 10-seed bound cleared the gate by only 0.07 pts; doubling N
    # shrinks the CI ~1/√2 and the t quantile from 2.262 to 2.093)
    diffs, rows = [], []
    for s in seeds:
        ae, at = _run_gelu_pair(seed=s)
        assert ae > 0.10 and at > 0.10, ("a stack failed to learn", s, ae, at)
        diffs.append(at - ae)
        rows.append((s, ae, at))
    from scipy.stats import t as student_t

    mean_diff = float(np.mean(diffs))
    sem = float(np.std(diffs, ddof=1) / np.sqrt(len(diffs)))
    # Student-t quantile (t(9)=2.262), not 1.96: the normal approximation
    # would overstate the claimed 97.5% one-sided confidence at n=10
    crit = float(student_t.ppf(0.975, len(diffs) - 1))
    lower = mean_diff - crit * sem
    print("gelu seed table:", rows)
    print(f"mean paired diff (tanh - exact)={mean_diff*100:.2f} pts  "
          f"95% CI ±{crit*sem*100:.2f} pts (t, df={len(diffs)-1})  "
          f"lower bound={lower*100:.2f} pts")
    assert lower >= -0.01, ("tanh GELU cannot be certified non-inferior "
                            "to the 1-pt criterion", mean_diff, lower, rows)
