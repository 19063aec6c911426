"""Import trained REFERENCE checkpoints (torch ``state_dict``s) into this
framework's parameter pytrees.

A user of arayabrain/MEG-decoding switching to this framework arrives with
``model_last.pt`` files saved by the reference trainers (``train.py:271``:
``torch.save(brain_encoder.state_dict(), ...)``).  This module maps those
state_dicts — by the reference's own module names (``models.py:340-361``:
``subject_block.spatial_attention.z``, ``conv_blocks.conv{k}.*``,
``conv_final1/2``) — onto the flax trees of ``models/brain_encoder.py`` /
``models/eegnet.py:LinearEncoder``, inverting the exact transplant mapping
the parity tests certify (tests/test_torch_parity.py: JAX→torch agreement
to rtol 1e-3 on the full encoder).

Pure numpy: callers hand in ``{name: np.ndarray}`` (use
``state_dict_to_numpy`` on a loaded torch state_dict — torch itself is only
imported there, never in the compute path).  The converted trees drop into
``TrainState.params['model']`` / ``.batch_stats`` and from there into the
evaluators, the serving exporter, or continued training.
"""

from __future__ import annotations

import numpy as np

__all__ = ["state_dict_to_numpy", "brain_encoder_from_state_dict",
           "eegnet_from_state_dict", "linear_encoder_from_state_dict",
           "load_torch_checkpoint"]


def load_torch_checkpoint(path: str, allow_pickle: bool = False) -> dict:
    """``torch.load`` a reference checkpoint → ``{name: np.ndarray}``.
    (The only torch use in the package; import stays local.)

    ``weights_only=True`` by default: a plain ``state_dict`` (what the
    reference trainers save, ``train.py:274``) loads without unpickling
    arbitrary code.  A checkpoint holding a whole pickled ``nn.Module``
    (``torch.save(model, ...)``) cannot — pass ``allow_pickle=True`` to
    retry with full unpickling IF you trust the file (it executes the
    pickle's code), and the module's ``state_dict()`` is then extracted."""
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        if not allow_pickle:
            raise
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):  # a whole module was saved
        sd = sd.state_dict()
    return state_dict_to_numpy(sd)


def state_dict_to_numpy(sd: dict) -> dict:
    out = {}
    for k, v in sd.items():
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        out[k] = v
    return out


def _dense_from_conv1x1(w: np.ndarray, f32=np.float32) -> np.ndarray:
    """torch Conv1d weight (out, in, 1) → flax Dense kernel (in, out)."""
    assert w.ndim == 3 and w.shape[-1] == 1, w.shape
    return np.ascontiguousarray(w[:, :, 0].T).astype(f32)


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv1d weight (out, in, ks) → flax Conv kernel (ks, in, out)."""
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0))).astype(np.float32)


def brain_encoder_from_state_dict(sd: dict, num_blocks: int = 5):
    """Reference BrainEncoder state_dict → ``(params, batch_stats)`` flax
    trees for ``models/brain_encoder.py:BrainEncoder``.

    Name map (reference → here):

    * ``subject_block.spatial_attention.z`` (complex) → ``z_re``/``z_im``
    * ``subject_block.conv`` (1×1 Conv1d) → Dense ``conv``
    * ``subject_block.subject_layer.{s}.weight`` (bias-free 1×1 convs) →
      one stacked ``subject_layer.weight`` (S, D1, D1) batched matmul
    * ``conv_blocks.conv{k}.conv0/conv1`` → ``conv{k}.conv0/conv1``;
      ``...conv2`` (2·D2 GLU conv) → SPLIT into ``conv2a``/``conv2b``
      halves (models/layers.py GLU-fusion layout, PARITY deviation 10)
    * ``...batchnorm0/1`` → ``bn0/1`` (scale/bias + running mean/var)
    * ``conv_final1/2`` (1×1 convs) → Dense ``conv_final1/2``
    """
    f32 = np.float32
    z = np.asarray(sd["subject_block.spatial_attention.z"])
    S = len({k.split(".")[2] for k in sd
             if k.startswith("subject_block.subject_layer.")})
    subject_w = np.stack([
        _dense_from_conv1x1(sd[f"subject_block.subject_layer.{s}.weight"])
        for s in range(S)])

    params = {
        "subject_block": {
            "spatial_attention": {"z_re": np.real(z).astype(f32),
                                  "z_im": np.imag(z).astype(f32)},
            "conv": {"kernel": _dense_from_conv1x1(sd["subject_block.conv.weight"]),
                     "bias": np.asarray(sd["subject_block.conv.bias"], f32)},
            "subject_layer": {"weight": subject_w},
        },
        "conv_final1": {"kernel": _dense_from_conv1x1(sd["conv_final1.weight"]),
                        "bias": np.asarray(sd["conv_final1.bias"], f32)},
        "conv_final2": {"kernel": _dense_from_conv1x1(sd["conv_final2.weight"]),
                        "bias": np.asarray(sd["conv_final2.bias"], f32)},
    }
    batch_stats = {}
    for k in range(num_blocks):
        ref = f"conv_blocks.conv{k}"
        w2 = np.asarray(sd[f"{ref}.conv2.weight"])
        b2 = np.asarray(sd[f"{ref}.conv2.bias"], f32)
        D2 = w2.shape[0] // 2
        blk = {
            "conv0": {"kernel": _conv_kernel(sd[f"{ref}.conv0.weight"]),
                      "bias": np.asarray(sd[f"{ref}.conv0.bias"], f32)},
            "conv1": {"kernel": _conv_kernel(sd[f"{ref}.conv1.weight"]),
                      "bias": np.asarray(sd[f"{ref}.conv1.bias"], f32)},
            "conv2a": {"kernel": _conv_kernel(w2[:D2]), "bias": b2[:D2]},
            "conv2b": {"kernel": _conv_kernel(w2[D2:]), "bias": b2[D2:]},
        }
        blk_stats = {}
        for i in (0, 1):
            blk[f"bn{i}"] = {
                "scale": np.asarray(sd[f"{ref}.batchnorm{i}.weight"], f32),
                "bias": np.asarray(sd[f"{ref}.batchnorm{i}.bias"], f32)}
            blk_stats[f"bn{i}"] = {
                "mean": np.asarray(sd[f"{ref}.batchnorm{i}.running_mean"], f32),
                "var": np.asarray(sd[f"{ref}.batchnorm{i}.running_var"], f32)}
        params[f"conv{k}"] = blk
        batch_stats[f"conv{k}"] = blk_stats
    return params, batch_stats


def eegnet_from_state_dict(sd: dict):
    """Reference EEGNet (``models.py:32-94``) state_dict →
    ``(params, batch_stats)`` for ``models/eegnet.py:EEGNet``.

    The reference wraps stages in ``nn.Sequential`` so keys are positional
    (``conv1.0`` = conv, ``conv1.1`` = BN; ``conv3.0/1/2`` = depthwise /
    pointwise / BN).  Two layout conversions:

    * Conv2d weights (out, in/g, kh, kw) → flax (kh, kw, in/g, out);
    * the classifier: the reference flattens NCHW (``x.view(-1, n_dim)``,
      index = c·W + w after the height collapses to 1) while the flax model
      flattens NHWC (index = w·C + c) — the classifier weight COLUMNS are
      permuted accordingly, so the imported head is bit-equivalent, not
      just shape-compatible.
    """
    f32 = np.float32

    def k4(w):
        return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))).astype(f32)

    def bn(prefix):
        p = {"scale": np.asarray(sd[f"{prefix}.weight"], f32),
             "bias": np.asarray(sd[f"{prefix}.bias"], f32)}
        s = {"mean": np.asarray(sd[f"{prefix}.running_mean"], f32),
             "var": np.asarray(sd[f"{prefix}.running_var"], f32)}
        return p, s

    bn1p, bn1s = bn("conv1.1")
    bn2p, bn2s = bn("conv2.1")
    bn3p, bn3s = bn("conv3.2")
    W = np.asarray(sd["classifier.weight"], f32)         # (out, C·W') NCHW-flat
    F2 = int(np.asarray(sd["conv3.1.weight"]).shape[0])  # pointwise out = C
    Wp = W.shape[1] // F2
    w_nhwc = W.reshape(-1, F2, Wp).transpose(0, 2, 1).reshape(W.shape[0], -1)
    params = {
        "conv1": {"kernel": k4(sd["conv1.0.weight"])},
        "bn1": bn1p,
        "conv2": {"kernel": k4(sd["conv2.0.weight"])},
        "bn2": bn2p,
        "conv3_dw": {"kernel": k4(sd["conv3.0.weight"])},
        "conv3_pw": {"kernel": k4(sd["conv3.1.weight"])},
        "bn3": bn3p,
        "classifier": {"kernel": np.ascontiguousarray(w_nhwc.T),
                       "bias": np.asarray(sd["classifier.bias"], f32)},
    }
    return params, {"bn1": bn1s, "bn2": bn2s, "bn3": bn3s}


def linear_encoder_from_state_dict(sd: dict):
    """Reference LinearEncoder (``models.py:325-337``: one
    ``linear.weight/bias``) → flax Dense tree."""
    w = np.asarray(sd["linear.weight"], np.float32)  # (out, in)
    return {"linear": {"kernel": np.ascontiguousarray(w.T),
                       "bias": np.asarray(sd["linear.bias"], np.float32)}}, {}
