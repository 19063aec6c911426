"""Deployable AOT serving artifacts via ``jax.export`` (StableHLO).

The reference has no deployment story — inference means running
``examples/inference.py`` inside the full training repo with torch
installed (reference ``inference.py``).  A production TPU framework should
hand serving a self-contained artifact that needs neither the training code
nor retracing.  An artifact here is a directory:

* ``forward.jaxexport`` — the serialized ``jax.export`` program: raw MEG
  windows ``(B, C, T)`` + subject ids → embeddings.  Batch-POLYMORPHIC
  (symbolic ``b``), so one program serves any request size, and lowered for
  BOTH ``tpu`` and ``cpu`` so the same artifact runs on serving chips and on
  CPU canaries/CI.  The program contains the FULL serving pipeline: the
  on-device collate chain (baseline correction → RobustScaler → clamp,
  ``ops/scaling.py`` — what the training collator applied, reference
  ``gwilliams2022.py:641-662``) fused into the encoder's eval forward, so
  clients send exactly what the sensors record.
* ``weights.msgpack`` — flax-serialized inference variables (params +
  batch_stats).  Weights stay call-time ARGUMENTS, never baked into the
  program as constants: constants would bloat the artifact by the full
  parameter size and ship the weights through whatever compiler consumes
  the program (this rig's remote-compile relay rejects multi-hundred-MB
  programs outright — CLAUDE.md).
* ``meta.json`` — input shapes/dtypes, collate parameters, model config
  echo; enough for a serving host to validate requests without importing
  this package.

``load_artifact`` needs only jax + flax (no model code, no torch): the
program is data.  Percentiles inside the exported collate use the portable
sort lowering (``quantile_impl='sort'``): a Pallas custom call would pin
the artifact to one mosaic runtime version, the wrong trade for a
deployment format.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["make_serving_forward", "export_serving", "save_artifact",
           "load_artifact", "ServingModel"]

ARTIFACT_PROGRAM = "forward.jaxexport"
ARTIFACT_WEIGHTS = "weights.msgpack"
ARTIFACT_META = "meta.json"


def _package_version() -> str:
    import meg_decoding_tpu

    return getattr(meg_decoding_tpu, "__version__", "unknown")


def make_serving_forward(model, collate_cfg=None):
    """The deployable forward: optional collate chain + eval-mode encoder.

    Returns ``fn(variables, X, subject_idxs) -> Z`` with ``variables`` the
    full inference pytree ({'params', 'batch_stats'}) passed as an argument
    (see module docstring for why it is never closed over)."""
    from meg_decoding_tpu.ops.scaling import collate_preprocess

    enabled = bool(collate_cfg is not None
                   and getattr(collate_cfg, "enabled", True))

    def forward(variables, X, subject_idxs):
        if enabled:
            X = collate_preprocess(
                X, collate_cfg.baseline_len_samp, collate_cfg.clamp_lim,
                collate_cfg.clamp, quantile_impl="sort")
        return model.apply(variables, X, subject_idxs, train=False)

    return forward


def _inference_variables(params, batch_stats):
    variables = {"params": params["model"] if "model" in params else params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return variables


def export_serving(model, params, batch_stats, num_channels: int,
                   seq_len: int, collate_cfg=None,
                   platforms: Sequence[str] = ("tpu", "cpu")):
    """Export the serving forward as a batch-polymorphic multi-platform
    ``jax.export.Exported``.  ``params``/``batch_stats`` as held by a
    ``TrainState`` (only their SHAPES matter here; values travel separately
    in the artifact)."""
    from jax import export

    forward = make_serving_forward(model, collate_cfg)
    variables = _inference_variables(params, batch_stats)
    (b,) = export.symbolic_shape("b")
    vspec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        variables)
    xspec = jax.ShapeDtypeStruct((b, num_channels, seq_len), jnp.float32)
    sspec = jax.ShapeDtypeStruct((b,), jnp.int32)
    return export.export(jax.jit(forward), platforms=tuple(platforms))(
        vspec, xspec, sspec)


def save_artifact(out_dir: str, model, params, batch_stats,
                  num_channels: int, seq_len: int, collate_cfg=None,
                  platforms: Sequence[str] = ("tpu", "cpu"),
                  extra_meta: dict | None = None) -> str:
    """Export + write the three artifact files; returns ``out_dir``."""
    from flax import serialization

    exported = export_serving(model, params, batch_stats, num_channels,
                              seq_len, collate_cfg, platforms)
    variables = _inference_variables(params, batch_stats)
    host_vars = jax.tree_util.tree_map(np.asarray, variables)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, ARTIFACT_PROGRAM), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(out_dir, ARTIFACT_WEIGHTS), "wb") as f:
        f.write(serialization.msgpack_serialize(host_vars))
    meta = {
        "input": {"X": [None, int(num_channels), int(seq_len)],
                  "X_dtype": "float32",
                  "subject_idxs": [None], "subject_idxs_dtype": "int32"},
        "platforms": list(platforms),
        "collate": None if collate_cfg is None else {
            "enabled": bool(getattr(collate_cfg, "enabled", True)),
            "baseline_len_samp": int(collate_cfg.baseline_len_samp),
            "clamp_lim": float(collate_cfg.clamp_lim),
            "clamp": bool(collate_cfg.clamp),
        },
        "model": type(model).__name__,
        "framework_version": _package_version(),
    }
    meta.update(extra_meta or {})
    with open(os.path.join(out_dir, ARTIFACT_META), "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


class ServingModel:
    """A loaded artifact: ``__call__(X, subject_idxs) -> Z``.

    Each distinct concrete batch size compiles once on the target backend
    (the program itself is batch-polymorphic); production hosts should pin
    their batch tiers and rely on jax's persistent compilation cache."""

    def __init__(self, exported, variables, meta: dict):
        self.exported = exported
        self.variables = variables
        self.meta = meta

    @property
    def platforms(self):
        return tuple(self.exported.platforms)

    def __call__(self, X, subject_idxs):
        X = jnp.asarray(X, jnp.float32)
        subject_idxs = jnp.asarray(subject_idxs, jnp.int32)
        return self.exported.call(self.variables, X, subject_idxs)


def load_artifact(out_dir: str) -> ServingModel:
    """Load a serving artifact — no model code required (the program IS the
    model; weights are a flax msgpack pytree)."""
    from flax import serialization
    from jax import export

    with open(os.path.join(out_dir, ARTIFACT_PROGRAM), "rb") as f:
        exported = export.deserialize(f.read())
    with open(os.path.join(out_dir, ARTIFACT_WEIGHTS), "rb") as f:
        variables = serialization.msgpack_restore(f.read())
    with open(os.path.join(out_dir, ARTIFACT_META)) as f:
        meta = json.load(f)
    return ServingModel(exported, variables, meta)
