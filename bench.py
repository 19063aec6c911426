"""Benchmark: flagship training throughput on the attached TPU chip.

Metric: train samples/sec/chip on the full BrainEncoder training step at
Gwilliams2022 scale (B=64, 208 ch, 360 samples, F=1024 — the reference's
``configs/config.yaml``), including the on-device collate chain (baseline
correction + robust scaling + clamp) that the reference runs on host CPU via
sklearn per batch.

``vs_baseline`` compares against the PyTorch reference-equivalent training
step measured on this host's CPU (tools/baseline_torch.py →
tools/baseline_measured.json; the reference repo itself commits no
throughput numbers — BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np


def main():
    import jax

    try:  # persistent compile cache: first compile via the remote-compile
        # relay is slow (~minutes); later runs hit this cache
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import optax

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

    B, C, T, F, S = 64, 208, 360, 1024, 27
    loc = normalize_locations(synthetic_cap_locations(C))
    model = BrainEncoder(loc=loc, num_subjects=S, D1=270, D2=320, F=F, K=32)

    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.randn(B, C, T), dtype=jnp.float32)
    Y = jnp.asarray(rng.randn(B, F), dtype=jnp.float32)
    subs = jnp.asarray(rng.randint(0, S, B))

    optimizer = optax.adam(3e-4)
    state = create_train_state(model, optimizer, (X, Y, subs), jax.random.PRNGKey(0))
    train_step = make_train_step(
        model, optimizer, LossConfig(kind="clip"),
        CollateConfig(baseline_len_samp=60, clamp_lim=20.0), donate=True,
    )

    # compile + warmup (float() readback: block_until_ready does not
    # reliably block through the axon relay)
    state, metrics = train_step(state, X, Y, subs)
    float(metrics["loss"])
    for _ in range(3):
        state, metrics = train_step(state, X, Y, subs)
    float(metrics["loss"])

    # The attached chip is shared through a relay and run-to-run interference
    # is large; time several windows and report the best (interference only
    # ever slows a window down, so max is the least-biased estimate).
    n_steps, n_windows = 20, 5
    best_dt = float("inf")
    for _ in range(n_windows):
        t0 = time.time()
        for _ in range(n_steps):
            state, metrics = train_step(state, X, Y, subs)
        float(metrics["loss"])  # forces completion of the whole step chain
        best_dt = min(best_dt, time.time() - t0)
    sps = B * n_steps / best_dt

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "tools", "baseline_measured.json")
    vs = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)["torch_cpu_train_samples_per_sec"]
        vs = sps / base

    print(json.dumps({
        "metric": "train_samples_per_sec_per_chip",
        "value": round(sps, 2),
        "unit": "samples/sec",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
