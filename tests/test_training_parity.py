"""Training-dynamics parity: JAX vs torch replica over multiple steps.

Transplants identical initial weights into a torch replica of the reference
model + loss + Adam, feeds both the same batch sequence, and asserts the loss
trajectories track.  Catches subtle divergences (BatchNorm momentum/eps, Adam
eps placement, GLU/GELU variants, temperature gradient flow) that single
forward-pass parity can't see.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from meg_decoding_tpu.models.brain_encoder import BrainEncoder
from meg_decoding_tpu.train.state import create_train_state
from meg_decoding_tpu.train.steps import CollateConfig, LossConfig, make_train_step

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as TF  # noqa: E402

from tests.test_torch_parity import (  # noqa: E402
    C, T, B, D1, D2, F, K, S, TorchBrainEncoder, _conv1d_w, _dense_as_conv, _loc, _t,
)


def _transplant(p, tm):
    with torch.no_grad():
        sb = p["subject_block"]
        tm.z_re.copy_(_t(sb["spatial_attention"]["z_re"]))
        tm.z_im.copy_(_t(sb["spatial_attention"]["z_im"]))
        tm.conv.weight.copy_(_dense_as_conv(sb["conv"]["kernel"]))
        tm.conv.bias.copy_(_t(sb["conv"]["bias"]))
        W = np.asarray(sb["subject_layer"]["weight"])
        for s in range(S):
            tm.subject_layer[s].weight.copy_(_t(W[s].T[:, :, None]))
        from tests.fixtures import transplant_conv_blocks

        transplant_conv_blocks(p, tm.blocks)
        tm.f1.weight.copy_(_dense_as_conv(p["conv_final1"]["kernel"]))
        tm.f1.bias.copy_(_t(p["conv_final1"]["bias"]))
        tm.f2.weight.copy_(_dense_as_conv(p["conv_final2"]["kernel"]))
        tm.f2.bias.copy_(_t(p["conv_final2"]["bias"]))


def test_loss_trajectories_track():
    loc = _loc()
    n_steps = 12
    lr = 1e-3
    rng = np.random.RandomState(7)
    Xs = rng.randn(n_steps, B, C, T).astype(np.float32)
    Ws = rng.randn(C, F).astype(np.float32)
    Ys = np.einsum("sbct,cf->sbf", Xs, Ws).astype(np.float32) / T
    subs = rng.randint(0, S, (n_steps, B))

    # --- JAX side: d_drop=0 disables spatial dropout (no randomness) -------
    model = BrainEncoder(loc=loc, num_subjects=S, D1=D1, D2=D2, F=F, K=K,
                         d_drop=0.0)
    optimizer = optax.adam(lr)
    state = create_train_state(
        model, optimizer,
        (jnp.array(Xs[0]), jnp.array(Ys[0]), jnp.array(subs[0])),
        jax.random.PRNGKey(0), init_temperature=5.1)
    step = make_train_step(model, optimizer, LossConfig(kind="clip"),
                           CollateConfig(enabled=False), donate=False)
    jax_losses = []
    for i in range(n_steps):
        state, m = step(state, jnp.array(Xs[i]), jnp.array(Ys[i]),
                        jnp.array(subs[i]))
        jax_losses.append(float(m["loss"]))

    # --- torch side: same initial weights, same loss, same Adam ------------
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "spatial": jax.random.PRNGKey(1)},
        jnp.array(Xs[0]), jnp.array(subs[0]))
    # create_train_state used PRNGKey(0) split — params must match what the
    # train state holds; rebuild identically:
    params_key, spatial_key, _ = jax.random.split(jax.random.PRNGKey(0), 3)
    variables = model.init({"params": params_key, "spatial": spatial_key},
                           jnp.array(Xs[0]), jnp.array(subs[0]))
    tm = TorchBrainEncoder(loc)
    _transplant(variables["params"], tm)
    temp = nn.Parameter(torch.tensor(5.1))
    opt = torch.optim.Adam(list(tm.parameters()) + [temp], lr=lr)

    def torch_clip_loss(x, y, t):
        x = x / x.norm(dim=-1, keepdim=True)
        y = y / y.norm(dim=-1, keepdim=True)
        logits = (y @ x.T) * torch.exp(t)  # reference order: loss(Y, Z)
        tgt = torch.arange(x.shape[0])
        ce = nn.CrossEntropyLoss()
        return (ce(logits, tgt) + ce(logits.T, tgt)) / 2

    tm.train()
    torch_losses = []
    for i in range(n_steps):
        opt.zero_grad()
        Z = tm(_t(Xs[i]), subs[i])
        loss = torch_clip_loss(Z, _t(Ys[i]), temp)
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))

    # initial losses identical (same weights, same batch)
    assert jax_losses[0] == pytest.approx(torch_losses[0], rel=1e-3)
    # trajectories track closely step by step
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=0.05)
    # and both actually went down
    assert jax_losses[-1] < jax_losses[0]
