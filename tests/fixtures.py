"""Synthetic-dataset fixtures for tests (GOD .mat sessions, Gwilliams
preprocessed caches, Brennan raw EEG) — thin wrappers over the package's
generators (``meg_decoding_tpu/data/synthetic.py``, shared with the
zero-data quickstart), plus flax→torch transplant helpers for the parity
tests."""

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
