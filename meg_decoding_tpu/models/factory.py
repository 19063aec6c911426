"""Model factory: config → encoder module.

Reference: ``meg_decoding/models.py:18-30`` (``get_model``).  The same model
names are accepted, including the reference's ``brain_endcoder_seq2static``
typo (kept for config compatibility) and ``eegnet_sub`` mapping to plain
EEGNet (the reference does the same at ``models.py:27-28``).
"""

from __future__ import annotations

import numpy as np

from meg_decoding_tpu.models.brain_encoder import BrainEncoder, BrainEncoderSeq2Static
from meg_decoding_tpu.models.eegnet import EEGNet, EEGNetSub, LinearEncoder

__all__ = ["get_model"]


def _resolve_F(cfg) -> int:
    # F becomes 1024 when the dataset uses wav2vec last-4-layer features
    # (reference models.py:348)
    if cfg.select("preprocs.last4layers", False):
        return 1024
    return int(cfg.get("F", 512))


def _compute_dtype(cfg):
    import jax.numpy as jnp

    name = cfg.get("compute_dtype", "float32")
    return {"float32": None, "bfloat16": jnp.bfloat16}[str(name)]


def get_model(cfg, loc: np.ndarray | None = None, num_channels: int | None = None):
    """Build the encoder named by ``cfg.model``.

    Args:
      cfg: composed config (see ``core/config.py``).
      loc: (C, 2) sensor locations — required by the brain_encoder family.
      num_channels: input channel count — required by EEGNet.
    """
    name = cfg.model
    known = {"brain_encoder", "brain_endcoder_seq2static", "eegnet", "eegnet_sub", "linear"}
    if name not in known:
        raise ValueError(f"no model named {name!r} is prepared (known: {sorted(known)})")
    if name not in ("brain_encoder", "brain_endcoder_seq2static"):
        # these levers only exist on the brain_encoder family — warn instead
        # of silently ignoring them, so a dumped run config never claims a
        # lever the model didn't consume
        import warnings

        for flag in ("gelu_approximate", "emit_bf16_z", "gelu_impl"):
            if cfg.get(flag, None):
                warnings.warn(
                    f"config sets {flag} but model {name!r} has no "
                    "such lever — ignored", stacklevel=2)
    if name in ("linear",):
        return LinearEncoder(scp=bool(cfg.get("scp", True)), out_dim=_resolve_F(cfg))
    if name in ("eegnet", "eegnet_sub"):
        assert num_channels is not None, "eegnet needs num_channels"
        T = int(round((cfg.window.end - cfg.window.start) * cfg.preprocs.brain_resample_rate))
        # the reference maps eegnet_sub to plain EEGNet (models.py:27-28,
        # its EEGNetSub being broken); eegnet_sub_fixed=true enables the
        # working per-subject variant
        if name == "eegnet_sub" and cfg.get("eegnet_sub_fixed", False):
            return EEGNetSub(
                num_subjects=int(cfg.num_subjects),
                num_channels=num_channels,
                T=T,
                out_dim=_resolve_F(cfg),
                F1=int(cfg.get("F1", 16)), D=int(cfg.get("D", 2)),
                F2=int(cfg.get("F2", 32)), k1=int(cfg.get("k1", 30)),
                k2=int(cfg.get("k2", 4)), p1=int(cfg.get("p1", 2)),
                p2=int(cfg.get("p2", 4)), dr1=float(cfg.get("dr1", 0.5)),
                dr2=float(cfg.get("dr2", 0.5)),
            )
        return EEGNet(
            num_channels=num_channels,
            T=T,
            out_dim=_resolve_F(cfg),
            F1=int(cfg.get("F1", 16)),
            D=int(cfg.get("D", 2)),
            F2=int(cfg.get("F2", 32)),
            k1=int(cfg.get("k1", 30)),
            k2=int(cfg.get("k2", 4)),
            p1=int(cfg.get("p1", 2)),
            p2=int(cfg.get("p2", 4)),
            dr1=float(cfg.get("dr1", 0.5)),
            dr2=float(cfg.get("dr2", 0.5)),
        )
    common = dict(
        num_subjects=int(cfg.num_subjects),
        D1=int(cfg.get("D1", 270)),
        D2=int(cfg.get("D2", 320)),
        F=_resolve_F(cfg),
        K=int(cfg.get("K", 32)),
        d_drop=float(cfg.get("d_drop", 0.1)),
        # 'auto' resolves to plain XLA reductions — the measured-fastest
        # backend (RESULTS.md round 3); 'pallas'/'mxu' are opt-in
        # experiments (models/layers.py FusedBatchNorm).  The CLIs force
        # 'xla' under a mesh only to pin that choice against future
        # defaults (the Pallas kernels have no partitioning rule).
        bn_impl=str(cfg.get("bn_impl", "auto")),
    )
    if name == "brain_encoder":
        assert loc is not None, "brain_encoder needs sensor locations"
        return BrainEncoder(loc=loc, seq2seq=bool(cfg.get("seq2seq", False)),
                            dtype=_compute_dtype(cfg),
                            # tanh GELU: opt-in perf deviation (PARITY.md);
                            # default erf matches torch F.gelu
                            gelu_approximate=bool(
                                cfg.get("gelu_approximate", False)),
                            # 'erf' | 'tanh' | 'erf_poly' (ops/gelu.py);
                            # unset defers to gelu_approximate
                            gelu_impl=cfg.get("gelu_impl", None),
                            # bf16 Z into the loss (only meaningful with
                            # compute_dtype: bfloat16) — PARITY deviation 15
                            # extended to the Z side
                            emit_f32=not bool(cfg.get("emit_bf16_z", False)),
                            **common)
    if name == "brain_endcoder_seq2static":  # sic — reference's spelling
        assert loc is not None
        ks_list = list(cfg.select("ConvBlocks.ks", [3, 3, 3, 3, 3]))
        return BrainEncoderSeq2Static(
            loc=loc, ks_list=ks_list,
            dtype=_compute_dtype(cfg),
            gelu_approximate=bool(cfg.get("gelu_approximate", False)),
            gelu_impl=cfg.get("gelu_impl", None),
            emit_f32=not bool(cfg.get("emit_bf16_z", False)),
            **common)
    raise AssertionError("unreachable")
