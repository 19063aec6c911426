"""Synthetic-dataset fixtures for tests (GOD .mat sessions, Gwilliams
preprocessed caches, Brennan raw EEG) — thin wrappers over the package's
generators (``meg_decoding_tpu/data/synthetic.py``, shared with the
zero-data quickstart), plus flax→torch transplant helpers for the parity
tests."""

import os

import numpy as np


def make_god_fixture(root, num_channels=12, num_roi=8, fs=200.0,
                     n_train=20, n_test=10, feat_dim=16, subjects=("sbj01",),
                     seed=0):
    """Synthetic GOD sessions (Brainstorm .mat schema) — generator lives in
    the package (``data/synthetic.py``), shared with the quickstart."""
    from meg_decoding_tpu.data.synthetic import make_synthetic_god_dataset

    return make_synthetic_god_dataset(
        root, num_channels=num_channels, num_roi=num_roi, fs=fs,
        n_train=n_train, n_test=n_test, feat_dim=feat_dim,
        subjects=subjects, seed=seed)


def make_gwilliams_cache(cache_dir, n_subjects=2, n_sessions_per=2, C=12,
                         rate=120, rec_sec=30.0, words_per_task=24, F=16,
                         seed=0):
    """Reference-format synthetic Gwilliams cache — the generator lives in
    the package (``data/synthetic.py``) so users get the same zero-data
    quickstart path the tests exercise."""
    from meg_decoding_tpu.data.synthetic import make_synthetic_gwilliams_cache

    return make_synthetic_gwilliams_cache(
        cache_dir, n_subjects=n_subjects, n_sessions_per=n_sessions_per,
        C=C, rate=rate, rec_sec=rec_sec, words_per_task=words_per_task,
        F=F, seed=seed)


def make_brennan_raw(root, n_subjects=4, C=8, fs=500.0, rec_sec=60.0, F=16,
                     seed=0):
    """Synthetic Brennan-format raw EEG + Y stream — generator lives in the
    package (``data/synthetic.py``), shared with the quickstart."""
    from meg_decoding_tpu.data.synthetic import make_synthetic_brennan_raw

    return make_synthetic_brennan_raw(
        root, n_subjects=n_subjects, C=C, fs=fs, rec_sec=rec_sec, F=F,
        seed=seed)


# --- shared flax→torch transplant helpers (torch imported lazily: most -----
# --- fixture users don't need it) ------------------------------------------

def torch_t(x):
    import torch

    return torch.tensor(np.asarray(x))


def torch_conv1d_w(kernel):
    """flax conv kernel (ks, in, out) → torch Conv1d weight (out, in, ks)."""
    return torch_t(np.transpose(np.asarray(kernel), (2, 1, 0)))


def transplant_conv_blocks(params, torch_blocks, n_blocks: int = 5):
    """Copy the flax ``conv{k}`` ConvBlock trees into torch block modules.

    Accepts both attribute-style blocks (``blk.conv0``, tools/baseline_torch)
    and ModuleDict-style (``blk["conv0"]``).  Centralizes the GLU-halves
    mapping — flax stores the 2·D2 GLU conv as ``conv2a``/``conv2b``
    (models/layers.py layout optimization) while every torch replica keeps
    the reference's single ``conv2`` — so a layer-layout change edits ONE
    place, not every transplant site.
    """
    import torch

    with torch.no_grad():
        for kk in range(n_blocks):
            blk = params[f"conv{kk}"]
            tblk = torch_blocks[kk]
            get = (tblk.__getitem__ if hasattr(tblk, "__getitem__")
                   else lambda name, _m=tblk: getattr(_m, name))
            for cname in ["conv0", "conv1"]:
                get(cname).weight.copy_(torch_conv1d_w(blk[cname]["kernel"]))
                get(cname).bias.copy_(torch_t(blk[cname]["bias"]))
            get("conv2").weight.copy_(torch.cat(
                [torch_conv1d_w(blk["conv2a"]["kernel"]),
                 torch_conv1d_w(blk["conv2b"]["kernel"])]))
            get("conv2").bias.copy_(torch.cat(
                [torch_t(blk["conv2a"]["bias"]),
                 torch_t(blk["conv2b"]["bias"])]))
            for bname in ["bn0", "bn1"]:
                get(bname).weight.copy_(torch_t(blk[bname]["scale"]))
                get(bname).bias.copy_(torch_t(blk[bname]["bias"]))


def reference_named_state_dict(variables, loc, d1, d2, f_dim, k_dim,
                               num_subjects, seq2seq=False):
    """Build a torch state_dict with the REFERENCE's module names
    (``meg_decoding/models.py:340-361`` — ``subject_block.spatial_attention``
    with a complex ``z``, ``conv_blocks.conv{k}.batchnorm*``, a single 2·D2
    ``conv2``, ``conv_final1/2``) from flax variables via the certified
    transplant: exactly what a real ``model_last.pt`` contains.  Returns
    ``(state_dict_of_torch_tensors, torch_model)``; ``torch.save`` the dict
    to fabricate a reference checkpoint (tests/test_rehearsal.py), or
    numpy-ify it to drive the importer round trip (tests/test_torch_import).
    """
    import sys

    import torch

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.baseline_torch import BrainEncoder as TorchBrainEncoder

    from tests.test_accuracy_parity import transplant_into_torch

    tm = TorchBrainEncoder(torch.tensor(np.asarray(loc)), d1=d1, d2=d2,
                           f_dim=f_dim, k_dim=k_dim,
                           num_subjects=num_subjects, seq2seq=seq2seq)
    transplant_into_torch(variables["params"], tm, num_subjects)
    with torch.no_grad():  # BN running stats too — load-bearing at eval
        for k in range(5):
            blk = variables["batch_stats"][f"conv{k}"]
            for i in (0, 1):
                bn = getattr(tm.blocks[k], f"bn{i}")
                bn.running_mean.copy_(
                    torch.tensor(np.asarray(blk[f"bn{i}"]["mean"])))
                bn.running_var.copy_(
                    torch.tensor(np.asarray(blk[f"bn{i}"]["var"])))

    sd = tm.state_dict()
    out = {"subject_block.spatial_attention.z":
           torch.complex(sd.pop("subject_block.sa.z_re"),
                         sd.pop("subject_block.sa.z_im"))}
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
