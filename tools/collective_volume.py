"""Measure per-step collective traffic of the sharded train step from HLO.

Multi-chip hardware isn't reachable from this rig, so the multi-chip perf
story is the COLLECTIVE VOLUME the step moves over ICI (RESULTS.md
"Expected scaling"); this tool turns that from an argument into a
measurement: lower the real data-parallel seq2seq train step on an
N-device mesh, walk the optimized HLO, and sum the output bytes of every
collective op (all-gather / all-reduce / reduce-scatter / collective-
permute), fusion-internal ops included.

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/collective_volume.py [--batch 128] [--small]

(device count comes from the XLA_FLAGS virtual-device setting)

Prints one JSON line: bytes per step by op kind + totals.  Round-4 check:
the y-only-gather CLIP loss (objectives/clip.py) must show ~half the
all-gather volume of the retired both-gather variant — both are printed.
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
                "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1, "c64": 8, "c128": 16}

_COLLECTIVES = ("all-gather", "all-reduce", "reduce-scatter",
                "collective-permute", "all-to-all")


def _shape_bytes(shape_str: str) -> int:
    """'f32[64,1024,361]' (or a tuple '(f32[2], s32[3])') → total bytes."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_bytes(hlo_text: str) -> dict:
    """Sum output bytes of every collective instruction in optimized HLO.
    Async pairs are counted once (the -start op carries the transfer; the
    -done is skipped)."""
    out = {k: 0 for k in _COLLECTIVES}
    counts = {k: 0 for k in _COLLECTIVES}
    for line in hlo_text.splitlines():
        line = line.strip()
        # '[ROOT ]%name = TYPE[SHAPE] op-name(...)' — op must be the called op
        m = re.match(r"(?:ROOT )?%?[\w.\-]+ = (.+?) ([\w\-]+)\(", line)
        if not m:
            continue
        shape_str, op = m.group(1), m.group(2)
        if op.endswith("-done"):
            continue
        base = op[:-6] if op.endswith("-start") else op
        if base in _COLLECTIVES:
            if op.endswith("-start") and shape_str.lstrip().startswith("("):
                # async form: the result tuple is (operand, result[, ...]);
                # the transferred buffer is the RESULT (last array shape),
                # not the operand+result sum
                shapes = re.findall(r"\w+\[[\d,]*\]", shape_str)
                shape_str = shapes[-1] if shapes else shape_str
            out[base] += _shape_bytes(shape_str)
            counts[base] += 1
    return {"bytes": out, "counts": counts,
            "total_bytes": int(sum(out.values()))}


def lower_sharded_step(batch: int, loss_fn_name: str, C=208, F=1024,
                       seq_len=360, D1=270, D2=320, K=32, S=27):
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from meg_decoding_tpu.core.mesh import make_mesh, replicated
    from meg_decoding_tpu.data.layout import (
        normalize_locations,
        synthetic_cap_locations,
    )
    from meg_decoding_tpu.models.brain_encoder import BrainEncoder
    from meg_decoding_tpu.train.state import create_train_state
    from meg_decoding_tpu.train.steps import (
        CollateConfig,
        LossConfig,
        make_train_step,
    )
    import meg_decoding_tpu.objectives.clip as clip_mod

    mesh = make_mesh(n_data=len(jax.devices()))
    loc = normalize_locations(synthetic_cap_locations(C))
    model = BrainEncoder(loc=loc, num_subjects=S, D1=D1, D2=D2, F=F, K=K,
                         seq2seq=True)
    opt = optax.adam(3e-4)
    X = jnp.zeros((batch, C, seq_len))
    Y = jnp.zeros((batch, F, seq_len))
    subs = jnp.zeros((batch,), jnp.int32)
    state = create_train_state(model, opt, (X, Y, subs),
                               jax.random.PRNGKey(0))
    state = jax.device_put(state, replicated(mesh))
    X, Y, subs = (jax.device_put(a, NamedSharding(
        mesh, P("data", *([None] * (a.ndim - 1))))) for a in (X, Y, subs))

    # select which sharded CLIP variant the step lowers with
    orig = clip_mod.clip_loss_local_rows
    if loss_fn_name == "gathered":
        def both(x_local, y_local, temp, axis_name, reduction="mean",
                 top_ks=None):
            loss = clip_mod.clip_loss_local_rows_gathered(
                x_local, y_local, temp, axis_name, reduction=reduction)
            if top_ks is None:
                return loss
            # metrics identical in both variants; reuse the production ones
            import jax as _jax
            b_local = x_local.shape[0]
            idx = _jax.lax.axis_index(axis_name)
            n = _jax.lax.psum(1, axis_name)
            xl = clip_mod._normalize(x_local.reshape(b_local, -1))
            yl = clip_mod._normalize(y_local.reshape(b_local, -1))
            y_all = _jax.lax.all_gather(yl, axis_name, tiled=True)
            logits = (xl @ y_all.T) * jnp.exp(temp)
            tgt = idx * b_local + jnp.arange(b_local)
            hits = clip_mod._local_row_topk_hits(logits, tgt, top_ks)
            metrics = {k: _jax.lax.psum(v, axis_name) / (b_local * n)
                       for k, v in hits.items()}
            return loss, metrics
        clip_mod.clip_loss_local_rows = both
    try:
        step = make_train_step(model, opt, LossConfig(kind="clip"),
                               CollateConfig(baseline_len_samp=60,
                                             clamp_lim=20.0),
                               donate=False, mesh=mesh)
        # make_train_step returns a wrapper; reach the jitted callable by
        # lowering through a jit of the wrapper itself
        import jax as _jax
        lowered = _jax.jit(lambda st, x, y, s: step(st, x, y, s)) \
            .lower(state, X, Y, subs)
        return lowered.compile().as_text()
    finally:
        clip_mod.clip_loss_local_rows = orig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--small", action="store_true",
                    help="small model dims (fast CI-style run)")
    args = ap.parse_args()
    dims = dict(C=16, F=32, seq_len=96, D1=16, D2=24, K=4, S=2) \
        if args.small else {}

    rows = {}
    for variant in ("production", "gathered"):
        hlo = lower_sharded_step(args.batch, variant, **dims)
        rows[variant] = collective_bytes(hlo)
    prod, gath = rows["production"], rows["gathered"]
    import jax

    print(json.dumps({
        "batch": args.batch,
        "devices": len(jax.devices()),
        "production": prod,
        "both_gather_variant": gath,
        "all_gather_ratio": round(
            prod["bytes"]["all-gather"] / max(gath["bytes"]["all-gather"], 1),
            3),
    }))


if __name__ == "__main__":
    main()
