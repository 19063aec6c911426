"""Serving-path latency benchmark: AOT-compiled flagship forward on TPU.

The reference has no serving story (inference = ``examples/inference.py``
batch dumps).  For production serving the relevant numbers are per-request
latency at small batch and saturated throughput at large batch, with the
model compiled ahead of time (``jax.jit(...).lower().compile()``) so the
first request never pays tracing/compilation.

Run: ``python examples/serving_benchmark.py [--batches 1,8,64]``
Prints one JSON line per batch size: {batch, p50_ms, p90_ms, samples_per_sec}.
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
    ap.add_argument("--batches", default="1,8,64")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--seq2seq", action="store_true",
                    help="seq2seq head (speech); default mean-pooled (GOD-style)")
    ap.add_argument("--artifact", default=None,
                    help="also time a deployed jax.export artifact dir "
                         "(serving/export.py) at the same batch sizes — "
                         "shows the deployment path costs nothing over jit")
    args = ap.parse_args()

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from meg_decoding_tpu.data.layout import (
        normalize_locations,
        synthetic_cap_locations,
    )
    from meg_decoding_tpu.models.brain_encoder import BrainEncoder

    C, T, F = 208, 360, 1024
    num_subjects = 27
    rng = np.random.RandomState(0)
    served = None
    if args.artifact:
        from meg_decoding_tpu.serving import load_artifact

        served = load_artifact(args.artifact)
        C = served.meta["input"]["X"][1]
        T = served.meta["input"]["X"][2]
        num_subjects = int(served.meta.get("num_subjects", 1))
    else:
        loc = normalize_locations(synthetic_cap_locations(C))
        model = BrainEncoder(loc=loc, num_subjects=num_subjects, D1=270,
                             D2=320, F=F, K=32, seq2seq=args.seq2seq)
        X1 = jnp.asarray(rng.randn(1, C, T), jnp.float32)
        subs1 = jnp.zeros((1,), jnp.int32)
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "spatial": jax.random.PRNGKey(1)}, X1, subs1)

        # params are a jit ARGUMENT — closing over them would bake ~40 MB of
        # weights into the HLO shipped through the remote-compile relay (the
        # CLAUDE.md "Broken pipe"/HTTP 413 failure mode)
        def forward(v, X, subs):
            return model.apply(v, X, subs, train=False)

    def time_calls(call, warm_args):
        np.asarray(call(*warm_args)[:1, :1])  # warmup/compile
        lat = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = call(*warm_args)
            # force completion with a ONE-element readback (serving = sync
            # reply): slicing on device first keeps the host transfer tiny —
            # np.asarray(out) would pull the whole (B, F[, T]) output through
            # the relay and time the transfer, not the model
            np.asarray(out[:1, :1])
            lat.append(time.perf_counter() - t0)
        return np.array(lat) * 1e3

    for B in [int(b) for b in args.batches.split(",")]:
        X = jnp.asarray(rng.randn(B, C, T), jnp.float32)
        subs = jnp.asarray(rng.randint(0, num_subjects, B), jnp.int32)
        row = {"batch": B}
        if served is None:
            # AOT: trace + lower + compile before the first request
            compiled = jax.jit(forward).lower(variables, X, subs).compile()
            lat_ms = time_calls(lambda x, s: compiled(variables, x, s),
                                (X, subs))
        else:
            lat_ms = time_calls(served, (X, subs))
            row["source"] = "artifact"
        # shared-chip relay: report percentiles over many one-request windows
        row.update({
            "p50_ms": round(float(np.percentile(lat_ms, 50)), 3),
            "p90_ms": round(float(np.percentile(lat_ms, 90)), 3),
            "best_ms": round(float(lat_ms.min()), 3),
            "samples_per_sec_at_p50": round(
                B / float(np.percentile(lat_ms, 50)) * 1e3, 1),
        })
        print(json.dumps(row))


if __name__ == "__main__":
    main()
