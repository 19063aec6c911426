"""Weight-transplant parity: the full JAX BrainEncoder vs a torch replica of
the reference architecture (meg_decoding/models.py:341-383 semantics).

Copies every parameter from the initialized flax model into the torch module
and asserts the eval-mode forward passes agree — end-to-end numerical parity
of SpatialAttention + SubjectBlock + 5×ConvBlock + final convs + pooling.

The replica itself is certified against the LITERAL reference classes in
tests/test_reference_code_parity.py (imports /root/reference directly), so
a transcription error here can no longer hide — this module remains as the
fast, reference-checkout-independent variant.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meg_decoding_tpu.models.brain_encoder import BrainEncoder

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as TF  # noqa: E402

C, T, B = 12, 48, 4
D1, D2, F, K, S = 8, 10, 16, 4, 3


def _loc():
    rng = np.random.RandomState(0)
    loc = rng.rand(C, 2).astype(np.float32)
    loc = (loc - loc.min(0)) / (loc.max(0) - loc.min(0))
    return loc * 0.8 + 0.1


class TorchBrainEncoder(nn.Module):
    """Test-only oracle assembling the reference's forward from torch ops."""

    def __init__(self, loc):
        super().__init__()
        k = torch.arange(K).repeat_interleave(K).float()
        l = torch.arange(K).repeat(K).float()
        x, y = torch.tensor(loc[:, 0]), torch.tensor(loc[:, 1])
        phi = 2 * torch.pi * (torch.outer(k, x) + torch.outer(l, y))
        self.register_buffer("cos", torch.cos(phi))
        self.register_buffer("sin", torch.sin(phi))
        self.z_re = nn.Parameter(torch.zeros(D1, K * K))
        self.z_im = nn.Parameter(torch.zeros(D1, K * K))
        self.conv = nn.Conv1d(D1, D1, 1)
        self.subject_layer = nn.ModuleList(
            [nn.Conv1d(D1, D1, 1, bias=False) for _ in range(S)]
        )
        self.blocks = nn.ModuleList()
        for kk in range(5):
            cin = D1 if kk == 0 else D2
            blk = nn.ModuleDict({
                "conv0": nn.Conv1d(cin, D2, 3, padding="same"),
                "bn0": nn.BatchNorm1d(D2),
                "conv1": nn.Conv1d(D2, D2, 3, padding="same"),
                "bn1": nn.BatchNorm1d(D2),
                "conv2": nn.Conv1d(D2, 2 * D2, 3, padding="same"),
            })
            self.blocks.append(blk)
        self.f1 = nn.Conv1d(D2, 2 * D2, 1)
        self.f2 = nn.Conv1d(2 * D2, F, 1)

    def forward(self, X, subject_idxs):
        a = self.z_re @ self.cos + self.z_im @ self.sin
        wts = TF.softmax(a, dim=-1)
        X = torch.einsum("oi,bit->bot", wts, X)
        X = self.conv(X)
        X = torch.cat([self.subject_layer[i](x.unsqueeze(0))
                       for i, x in zip(subject_idxs, X)])
        for kk, blk in enumerate(self.blocks):
            h = blk["conv0"](X) if kk == 0 else blk["conv0"](X) + X
            h = TF.gelu(blk["bn0"](h))
            h = TF.gelu(blk["bn1"](blk["conv1"](h) + h))
            X = TF.glu(blk["conv2"](h), dim=-2)
        X = TF.gelu(self.f1(X))
        X = TF.gelu(self.f2(X))
        return X.mean(-1)


def _t(x):
    return torch.tensor(np.asarray(x))


def _conv1d_w(kernel):  # flax (ks, in, out) → torch (out, in, ks)
    return _t(np.transpose(np.asarray(kernel), (2, 1, 0)))


def _dense_as_conv(kernel):  # flax Dense (in, out) → torch conv1d (out, in, 1)
    return _t(np.asarray(kernel).T[:, :, None])


class TorchEEGNet(nn.Module):
    """Test-only oracle: the reference EEGNet (``models.py:32-94``) in torch
    NCHW, matched to ``meg_decoding_tpu/models/eegnet.py``'s NHWC layout."""

    def __init__(self, C_, T_, F1, D, F2, k1, k2, p1, p2, out_dim):
        super().__init__()
        self.p1, self.p2 = p1, p2
        self.conv1 = nn.Conv2d(1, F1, (1, k1), padding="same", bias=False)
        self.bn1 = nn.BatchNorm2d(F1)
        self.conv2 = nn.Conv2d(F1, D * F1, (C_, 1), groups=F1, bias=False)
        self.bn2 = nn.BatchNorm2d(D * F1)
        self.conv3_dw = nn.Conv2d(D * F1, D * F1, (1, k2), groups=D * F1,
                                  padding="same", bias=False)
        self.conv3_pw = nn.Conv2d(D * F1, F2, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(F2)
        n_flat = F2 * (T_ // p1 // p2)
        self.classifier = nn.Linear(n_flat, out_dim)

    def forward(self, X):
        h = X.unsqueeze(1)  # (B, 1, C, T)
        h = self.bn1(self.conv1(h))
        h = TF.elu(self.bn2(self.conv2(h)))
        h = TF.avg_pool2d(h, (1, self.p1))
        h = TF.elu(self.bn3(self.conv3_pw(self.conv3_dw(h))))
        h = TF.avg_pool2d(h, (1, self.p2))
        # flatten in the flax NHWC order so the Dense transplant lines up
        h = h.permute(0, 2, 3, 1).flatten(1)
        return self.classifier(h)


def _conv2d_w(kernel):  # flax (kh, kw, in/g, out) → torch (out, in/g, kh, kw)
    return _t(np.transpose(np.asarray(kernel), (3, 2, 0, 1)))


def test_eegnet_matches_torch_replica():
    from meg_decoding_tpu.models.eegnet import EEGNet

    C_, T_, B_ = 16, 64, 6
    F1, D, F2, k1, k2, p1, p2, out = 4, 2, 8, 10, 4, 2, 4, 32
    model = EEGNet(num_channels=C_, T=T_, F1=F1, D=D, F2=F2, k1=k1, k2=k2,
                   p1=p1, p2=p2, out_dim=out)
    rng = np.random.RandomState(1)
    X = rng.randn(B_, C_, T_).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(X))
    p = variables["params"]

    tm = TorchEEGNet(C_, T_, F1, D, F2, k1, k2, p1, p2, out)
    with torch.no_grad():
        tm.conv1.weight.copy_(_conv2d_w(p["conv1"]["kernel"]))
        tm.conv2.weight.copy_(_conv2d_w(p["conv2"]["kernel"]))
        tm.conv3_dw.weight.copy_(_conv2d_w(p["conv3_dw"]["kernel"]))
        tm.conv3_pw.weight.copy_(_conv2d_w(p["conv3_pw"]["kernel"]))
        for bn in ("bn1", "bn2", "bn3"):
            getattr(tm, bn).weight.copy_(_t(p[bn]["scale"]))
            getattr(tm, bn).bias.copy_(_t(p[bn]["bias"]))
        tm.classifier.weight.copy_(_t(np.asarray(p["classifier"]["kernel"]).T))
        tm.classifier.bias.copy_(_t(p["classifier"]["bias"]))

    Z = np.asarray(model.apply(variables, jnp.asarray(X), train=False))
    tm.eval()
    with torch.no_grad():
        Zt = tm(_t(X)).numpy()
    np.testing.assert_allclose(Z, Zt, rtol=1e-4, atol=1e-4)


def test_full_encoder_matches_torch_replica():
    loc = _loc()
    model = BrainEncoder(loc=loc, num_subjects=S, D1=D1, D2=D2, F=F, K=K)
    rng = np.random.RandomState(1)
    X = rng.randn(B, C, T).astype(np.float32)
    subs = np.array([0, 1, 2, 0])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "spatial": jax.random.PRNGKey(1)},
        jnp.array(X), jnp.array(subs))
    out_jax = np.asarray(model.apply(variables, jnp.array(X), jnp.array(subs)))

    p = variables["params"]
    tm = TorchBrainEncoder(loc)
    with torch.no_grad():
        sb = p["subject_block"]
        tm.z_re.copy_(_t(sb["spatial_attention"]["z_re"]))
        tm.z_im.copy_(_t(sb["spatial_attention"]["z_im"]))
        tm.conv.weight.copy_(_dense_as_conv(sb["conv"]["kernel"]))
        tm.conv.bias.copy_(_t(sb["conv"]["bias"]))
        W = np.asarray(sb["subject_layer"]["weight"])  # (S, D, D) btc,bcd->btd
        for s in range(S):
            tm.subject_layer[s].weight.copy_(_t(W[s].T[:, :, None]))
        from tests.fixtures import transplant_conv_blocks

        transplant_conv_blocks(p, tm.blocks)
        tm.f1.weight.copy_(_dense_as_conv(p["conv_final1"]["kernel"]))
        tm.f1.bias.copy_(_t(p["conv_final1"]["bias"]))
        tm.f2.weight.copy_(_dense_as_conv(p["conv_final2"]["kernel"]))
        tm.f2.bias.copy_(_t(p["conv_final2"]["bias"]))

    tm.eval()
    with torch.no_grad():
        out_torch = tm(_t(X), subs).numpy()

    np.testing.assert_allclose(out_jax, out_torch, rtol=1e-3, atol=1e-4)
