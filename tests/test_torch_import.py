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
    """Transplant the flax variables into the torch replica, copy the BN
    running stats too, then rename every key to the reference's names."""
    import sys

    sys.path.insert(0, ".")
    from tools.baseline_torch import BrainEncoder as TorchBrainEncoder
    from tests.test_accuracy_parity import transplant_into_torch

    loc = np.asarray(normalize_locations(synthetic_cap_locations(C)))
    tm = TorchBrainEncoder(torch.tensor(loc), d1=D1v, d2=D2v, f_dim=Fv,
                           k_dim=Kv, num_subjects=S, seq2seq=False)
    transplant_into_torch(variables["params"], tm, S)
    with torch.no_grad():
        for k in range(5):
            blk = variables["batch_stats"][f"conv{k}"]
            for i in (0, 1):
                bn = getattr(tm.blocks[k], f"bn{i}")
                bn.running_mean.copy_(
                    torch.tensor(np.asarray(blk[f"bn{i}"]["mean"])))
                bn.running_var.copy_(
                    torch.tensor(np.asarray(blk[f"bn{i}"]["var"])))

    sd = state_dict_to_numpy(tm.state_dict())
    out = {"subject_block.spatial_attention.z":
           sd.pop("subject_block.sa.z_re")
           + 1j * sd.pop("subject_block.sa.z_im")}
    for k, v in sd.items():
        k = k.replace("subject_block.sa.", "subject_block.spatial_attention.")
        for i in range(5):
            k = k.replace(f"blocks.{i}.", f"conv_blocks.conv{i}.")
        k = k.replace(".bn0.", ".batchnorm0.").replace(".bn1.", ".batchnorm1.")
        if k.startswith("f1."):
            k = "conv_final1." + k[3:]
        if k.startswith("f2."):
            k = "conv_final2." + k[3:]
        out[k] = v
    return out, tm


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
