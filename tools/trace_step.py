"""Op-level device trace of the fused Gwilliams train step on the real TPU.

Runs the production fused gather+collate+train step (``make_fused_speech_step``)
for a window of steps under ``jax.profiler.trace`` and parses the resulting
``*.trace.json.gz`` into a per-op device-time table (the relay rig supports
op-level tracing even though wall-clocks are noisy — see CLAUDE.md).

Prints:
* total device time per step (averaged over the traced steps),
* top ops by device time with their HLO name + source line,
* a category rollup (convolution / fusion / custom-call / copy / ...).

Run:  python tools/trace_step.py --batch 256 --dtype bf16 [--scale full]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_trace(trace_dir):
    """Return the list of XLA-op events from the TPU device lane."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[0], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    # pid of the TPU device process, tid of its "XLA Ops" lane
    tpu_pids = {e["pid"] for e in events
                if e.get("name") == "process_name"
                and "/device:TPU" in e.get("args", {}).get("name", "")}
    op_tids = {(e["pid"], e["tid"]) for e in events
               if e.get("name") == "thread_name"
               and e["pid"] in tpu_pids
               and "XLA Ops" in e.get("args", {}).get("name", "")}
    return [e for e in events
            if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids]


def categorize(name, long_name):
    s = long_name or name
    if "custom-call" in s or name.startswith("tpu_custom_call"):
        return "custom-call (pallas)"
    for key in ("convolution", "dot", "fusion", "copy", "transpose",
                "reduce", "scatter", "gather", "select", "dynamic"):
        if name.startswith(key) or f"{key}." in name or f"{key}:" in name:
            return key
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="bf16")
    ap.add_argument("--scale", choices=["full", "small"], default="small")
    ap.add_argument("--steps", type=int, default=10,
                    help="steps inside the trace window")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--out", default=None, help="optional JSON dump path")
    ap.add_argument("--cached-stats", action="store_true",
                    help="trace the cache_collate_stats=true step variant")
    ap.add_argument("--gelu-tanh", action="store_true",
                    help="trace with tanh-approximate GELU (PARITY dev. 17)")
    args = ap.parse_args()

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import optax

    from bench import _make_synthetic_packed
    from meg_decoding_tpu.data.layout import (
        normalize_locations,
        synthetic_cap_locations,
    )
    from meg_decoding_tpu.models.brain_encoder import BrainEncoder
    from meg_decoding_tpu.train.scan_loop import make_fused_speech_step
    from meg_decoding_tpu.train.state import create_train_state
    from meg_decoding_tpu.train.steps import (
        CollateConfig,
        LossConfig,
    )

    B, C, F = args.batch, 208, 1024
    D1, D2, K = 270, 320, 32
    if args.scale == "full":
        S, n_sessions, rec_sec, words = 27, 2, 392.0, 2000
    else:
        S, n_sessions, rec_sec, words = 2, 2, 120.0, 120
    packed = _make_synthetic_packed(C=C, F=F, rate=120, rec_sec=rec_sec,
                                    words_per_task=words, n_subjects=S,
                                    n_sessions=n_sessions, seq_len_sec=3)
    seq_len = packed.seq_len
    dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    loc = normalize_locations(synthetic_cap_locations(C))
    model = BrainEncoder(loc=loc, num_subjects=S, D1=D1, D2=D2, F=F, K=K,
                         seq2seq=True, dtype=dtype,
                         gelu_approximate=args.gelu_tanh)
    optimizer = optax.adam(3e-4)
    example = (jnp.zeros((B, C, seq_len)), jnp.zeros((B, F, seq_len)),
               jnp.zeros((B,), jnp.int32))
    state = create_train_state(model, optimizer, example, jax.random.PRNGKey(0))
    fused = make_fused_speech_step(
        model, optimizer, LossConfig(kind="clip"),
        CollateConfig(baseline_len_samp=60, clamp_lim=20.0), packed,
        cache_collate_stats=args.cached_stats)
    rng = np.random.RandomState(0)

    def step(state, i):
        idx = rng.randint(0, len(packed), B)
        return fused(state, idx, jax.random.PRNGKey(i))

    # compile + warmup
    state, m = step(state, 0)
    float(m["loss"])
    for i in range(3):
        state, m = step(state, 1 + i)
    float(m["loss"])

    trace_dir = tempfile.mkdtemp(prefix="jtrace_")
    with jax.profiler.trace(trace_dir):
        for i in range(args.steps):
            state, m = step(state, 100 + i)
        float(m["loss"])

    ops = parse_trace(trace_dir)
    per_op = collections.defaultdict(float)
    meta = {}
    total_us = 0.0
    for e in ops:
        a = e.get("args", {})
        key = e["name"]
        per_op[key] += e.get("dur", 0.0)
        total_us += e.get("dur", 0.0)
        if key not in meta:
            meta[key] = {
                "long_name": a.get("long_name", ""),
                "source": a.get("source", ""),
            }

    n = args.steps
    rows = sorted(per_op.items(), key=lambda kv: -kv[1])
    cat = collections.defaultdict(float)
    for name, us in per_op.items():
        cat[categorize(name, meta[name]["long_name"])] += us

    print(f"\ndevice time: {total_us / n / 1e3:.3f} ms/step "
          f"({len(per_op)} distinct ops, {len(ops)} events, {n} steps)")
    print(f"\n{'ms/step':>9}  {'%':>5}  op  [source]")
    for name, us in rows[:args.top]:
        src = meta[name]["source"]
        ln = meta[name]["long_name"]
        desc = ln[:110] if ln else name
        print(f"{us / n / 1e3:9.3f}  {100 * us / total_us:5.1f}  {name}"
              f"\n{'':17}{desc}" + (f"\n{'':17}[{src}]" if src else ""))
    print("\ncategory rollup (ms/step):")
    for k, us in sorted(cat.items(), key=lambda kv: -kv[1]):
        print(f"  {us / n / 1e3:9.3f}  {100 * us / total_us:5.1f}%  {k}")

    if args.out:
        with open(args.out, "w") as f:
            json.dump({
                "batch": B, "dtype": args.dtype, "scale": args.scale,
                "steps": n,
                "device_ms_per_step": total_us / n / 1e3,
                "ops": [{"name": k, "ms_per_step": v / n / 1e3, **meta[k]}
                        for k, v in rows],
            }, f, indent=1)
        print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
