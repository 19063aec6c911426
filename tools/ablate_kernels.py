"""On-chip A/B of the round-3 Pallas kernels inside the REAL fused step.

Builds fused gather+train-step variants differing only in
(bn_impl ∈ {pallas, xla}) × (quantile_impl ∈ {pallas, sort}) and times them
with INTERLEAVED windows (variant order re-visited each window) so shared-
chip load drift cancels out of the comparison — a sequential best-of-N per
variant would attribute chip weather to the kernels (CLAUDE.md).

    python tools/ablate_kernels.py [--dtype bf16] [--steps 20] [--windows 6]

Prints one JSON line: ms/step per variant (best window) + pairwise deltas.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="bf16")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--windows", type=int, default=6)
    ap.add_argument("--scale", choices=["full", "small"], default="small")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--bn", default="pallas,xla",
                    help="comma list of bn impls (pallas|xla|mxu)")
    ap.add_argument("--quant", default="pallas,sort",
                    help="comma list of quantile impls (pallas|sort)")
    ap.add_argument("--cache", default="0",
                    help="comma list of cache_collate_stats flags (0|1)")
    ap.add_argument("--clip", default="factored",
                    help="comma list of clip impls (factored|normalized)")
    ap.add_argument("--gelu", default="exact",
                    help="comma list of gelu impls (exact|tanh|erf_poly)")
    ap.add_argument("--zdtype", default="f32",
                    help="comma list of Z emit dtypes (f32|bf16)")
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
    from meg_decoding_tpu.train.steps import CollateConfig, LossConfig

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
    optimizer = optax.adam(3e-4)
    rng = np.random.RandomState(0)

    def build(bn_impl, quantile_impl, cache_stats=False,
              clip_impl="factored", gelu="exact", zdtype="f32"):
        model = BrainEncoder(loc=loc, num_subjects=S, D1=D1, D2=D2, F=F, K=K,
                             seq2seq=True, dtype=dtype, bn_impl=bn_impl,
                             gelu_impl={"exact": "erf"}.get(gelu, gelu),
                             emit_f32=(zdtype == "f32"))
        example = (jnp.zeros((B, C, seq_len)), jnp.zeros((B, F, seq_len)),
                   jnp.zeros((B,), jnp.int32))
        state = create_train_state(model, optimizer, example,
                                   jax.random.PRNGKey(0))
        cc = CollateConfig(baseline_len_samp=60, clamp_lim=20.0,
                           quantile_impl=quantile_impl)
        loss_cfg = LossConfig(kind="clip", clip_impl=clip_impl)
        fused = make_fused_speech_step(model, optimizer, loss_cfg, cc, packed,
                                       cache_collate_stats=cache_stats)
        return fused, state

    variants = {}
    for bn in args.bn.split(","):
        for q in args.quant.split(","):
            for c in args.cache.split(","):
                for cl in args.clip.split(","):
                    for g in args.gelu.split(","):
                        for zd in args.zdtype.split(","):
                            name = (f"bn_{bn}+q_{q}"
                                    + ("+cached" if int(c) else "")
                                    + (f"+clip_{cl}" if cl != "normalized"
                                       else "")
                                    + (f"+gelu_{g}" if g != "exact" else "")
                                    + (f"+z_{zd}" if zd != "f32" else ""))
                            variants[name] = build(
                                bn, q, cache_stats=bool(int(c)),
                                clip_impl=cl, gelu=g, zdtype=zd)

    # compile + warm every variant first
    for name, (fused, state) in variants.items():
        t0 = time.time()
        state, m = fused(state, rng.randint(0, len(packed), B),
                         jax.random.PRNGKey(1))
        float(m["loss"])
        variants[name] = (fused, state)
        print(f"compiled {name} in {time.time()-t0:.1f}s", file=sys.stderr)

    best = {name: float("inf") for name in variants}
    for w in range(args.windows):
        for name in variants:  # interleaved: every variant, every window
            fused, state = variants[name]
            t0 = time.time()
            for i in range(args.steps):
                state, m = fused(state, rng.randint(0, len(packed), B),
                                 jax.random.PRNGKey(100 + w * args.steps + i))
            float(m["loss"])
            variants[name] = (fused, state)
            best[name] = min(best[name], (time.time() - t0) / args.steps)

    out = {"dtype": args.dtype, "scale": args.scale,
           **{k: round(v * 1e3, 3) for k, v in best.items()}}
    base_name = "bn_xla+q_sort"
    if base_name in best:
        base = best[base_name]
        for k, v in best.items():
            if k != base_name:
                out[f"delta_ms_{k}"] = round((v - base) * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
