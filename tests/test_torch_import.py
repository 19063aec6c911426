"""Reference-checkpoint importer (utils/torch_import.py).

Round trip against the PROVEN JAX→torch transplant (tests/test_torch_parity
certifies the mapping end to end): init a JAX BrainEncoder, transplant into
the torch replica, rename its state_dict to the REFERENCE's module names
(models.py:340-361 — ``spatial_attention`` with a complex ``z``,
``conv_blocks.conv{k}.batchnorm*``, a single 2·D2 ``conv2``,
``conv_final1/2``), import back, and require bit-identical trees plus
forward agreement."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meg_decoding_tpu.data.layout import (
    normalize_locations,
    synthetic_cap_locations,
)
from meg_decoding_tpu.models.brain_encoder import BrainEncoder
from meg_decoding_tpu.models.eegnet import LinearEncoder
from meg_decoding_tpu.utils.torch_import import (
    brain_encoder_from_state_dict,
    linear_encoder_from_state_dict,
    state_dict_to_numpy,
)

torch = pytest.importorskip("torch")

C, T, D1v, D2v, Fv, Kv, S = 12, 40, 8, 12, 16, 4, 3


def _reference_named_state_dict(variables):
    """Reference-named state_dict (numpy) + the torch replica carrying the
    same weights — shared builder in tests/fixtures.py."""
    from tests.fixtures import reference_named_state_dict

    loc = np.asarray(normalize_locations(synthetic_cap_locations(C)))
    out, tm = reference_named_state_dict(variables, loc, d1=D1v, d2=D2v,
                                         f_dim=Fv, k_dim=Kv, num_subjects=S,
                                         seq2seq=False)
    return state_dict_to_numpy(out), tm


@pytest.fixture(scope="module")
def jax_encoder():
    loc = normalize_locations(synthetic_cap_locations(C))
    model = BrainEncoder(loc=loc, num_subjects=S, D1=D1v, D2=D2v, F=Fv, K=Kv,
                         seq2seq=False)
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.randn(4, C, T), jnp.float32)
    subs = jnp.asarray(rng.randint(0, S, 4))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "spatial": jax.random.PRNGKey(1)}, X, subs)
    # make running stats non-trivial so the import of mean/var is load-bearing
    variables = jax.device_get(variables)
    variables["batch_stats"] = jax.tree_util.tree_map(
        lambda a: np.asarray(a) + rng.rand(*np.shape(a)).astype(np.float32),
        variables["batch_stats"])
    return model, variables


class TestBrainEncoderImport:
    def test_roundtrip_is_bit_identical(self, jax_encoder):
        model, variables = jax_encoder
        ref_sd, _ = _reference_named_state_dict(variables)
        params, stats = brain_encoder_from_state_dict(ref_sd)

        flat0, tree0 = jax.tree_util.tree_flatten_with_path(
            {"p": variables["params"], "s": variables["batch_stats"]})
        flat1, tree1 = jax.tree_util.tree_flatten_with_path(
            {"p": params, "s": stats})
        assert tree0 == tree1  # same tree structure, same names
        for (path0, a0), (_, a1) in zip(flat0, flat1):
            np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1),
                                          err_msg=str(path0))

    def test_imported_forward_matches_torch(self, jax_encoder):
        model, variables = jax_encoder
        ref_sd, tm = _reference_named_state_dict(variables)
        params, stats = brain_encoder_from_state_dict(ref_sd)
        rng = np.random.RandomState(7)
        X = rng.randn(4, C, T).astype(np.float32)
        subs = np.array([0, 1, 2, 0])
        Z = np.asarray(model.apply({"params": params, "batch_stats": stats},
                                   jnp.asarray(X), jnp.asarray(subs),
                                   train=False))
        tm.eval()
        with torch.no_grad():
            Zt = tm(torch.tensor(X), subs).numpy()
        np.testing.assert_allclose(Z, Zt, rtol=1e-3, atol=1e-4)


def test_linear_encoder_import():
    model = LinearEncoder(scp=True, out_dim=8)
    rng = np.random.RandomState(0)
    X = rng.randn(4, C, T).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(X))
    sd = {"linear.weight":
          np.asarray(variables["params"]["linear"]["kernel"]).T,
          "linear.bias": np.asarray(variables["params"]["linear"]["bias"])}
    params, stats = linear_encoder_from_state_dict(sd)
    np.testing.assert_array_equal(params["linear"]["kernel"],
                                  variables["params"]["linear"]["kernel"])
    out = model.apply({"params": params}, jnp.asarray(X))
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(model.apply(variables, jnp.asarray(X))), rtol=1e-6)


class TestEEGNetImport:
    def test_reference_sequential_state_dict_forward_matches(self):
        """Build the reference's EXACT EEGNet module structure
        (models.py:32-94: positional nn.Sequential stages, NCHW flatten),
        randomize it, import its state_dict, and require forward agreement
        — this certifies the classifier's NCHW→NHWC column permutation, not
        just shape compatibility."""
        import torch.nn as nn

        from meg_decoding_tpu.models.eegnet import EEGNet
        from meg_decoding_tpu.utils.torch_import import (
            eegnet_from_state_dict,
        )

        C_, T_, B_ = 16, 64, 6
        F1, D, F2, k1, k2, p1, p2, out = 4, 2, 8, 10, 4, 2, 4, 32

        class RefEEGNet(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Sequential(
                    nn.Conv2d(1, F1, (1, k1), padding="same", bias=False),
                    nn.BatchNorm2d(F1))
                self.conv2 = nn.Sequential(
                    nn.Conv2d(F1, D * F1, (C_, 1), groups=F1, bias=False),
                    nn.BatchNorm2d(D * F1), nn.ELU(),
                    nn.AvgPool2d((1, p1)), nn.Dropout(0.0))
                self.conv3 = nn.Sequential(
                    nn.Conv2d(D * F1, D * F1, (1, k2), padding="same",
                              groups=D * F1, bias=False),
                    nn.Conv2d(D * F1, F2, (1, 1), bias=False),
                    nn.BatchNorm2d(F2), nn.ELU(),
                    nn.AvgPool2d((1, p2)), nn.Dropout(0.0))
                n_dim = F2 * (T_ // p1 // p2)
                self.classifier = nn.Linear(n_dim, out, bias=True)

            def forward(self, x):
                x = x.unsqueeze(1)
                x = self.conv3(self.conv2(self.conv1(x)))
                return self.classifier(x.view(len(x), -1))  # NCHW flatten

        torch.manual_seed(0)
        tm = RefEEGNet()
        # non-trivial running stats so their import is load-bearing
        with torch.no_grad():
            for m in tm.modules():
                if isinstance(m, nn.BatchNorm2d):
                    m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                    m.running_var.copy_(1.0 + torch.rand_like(m.running_var))
        tm.eval()

        from meg_decoding_tpu.utils.torch_import import state_dict_to_numpy

        params, stats = eegnet_from_state_dict(
            state_dict_to_numpy(tm.state_dict()))
        model = EEGNet(num_channels=C_, T=T_, F1=F1, D=D, F2=F2, k1=k1,
                       k2=k2, p1=p1, p2=p2, out_dim=out)
        rng = np.random.RandomState(3)
        X = rng.randn(B_, C_, T_).astype(np.float32)
        Z = np.asarray(model.apply({"params": params, "batch_stats": stats},
                                   jnp.asarray(X), train=False))
        with torch.no_grad():
            Zt = tm(torch.tensor(X)).numpy()
        np.testing.assert_allclose(Z, Zt, rtol=1e-4, atol=1e-4)


def test_importer_cli_ignores_pt_valued_overrides(monkeypatch):
    """A key=value override whose VALUE ends in .pt (e.g. a path config key)
    must stay a config override — only bare .pt/.pth tokens name the
    checkpoint (scripts/import_torch_checkpoint.py main)."""
    import scripts.import_torch_checkpoint as m

    seen = {}
    monkeypatch.setattr(
        m, "run",
        lambda ckpt, cfg: seen.update(ckpt=ckpt,
                                      y=cfg.get("y_embeds_path"),
                                      ds=cfg.dataset))
    m.main(["model_last.pt", "y_embeds_path=embd.pt", "dataset=Brennan2018"])
    assert seen["ckpt"] == "model_last.pt"
    assert seen["y"] == "embd.pt"
    assert seen["ds"] == "Brennan2018"
