"""Ablation profile of the flagship Gwilliams train step on the real TPU.

Times progressively larger slices of the fused pipeline as separate jitted
programs so their deltas locate the cost (op-level jax.profiler traces are
not reliably available through the remote-compile relay):

  gather            — Pallas window gather alone
  collate           — gather + baseline/robust-scale/clamp
  forward           — + BrainEncoder forward (train=False, no BN update)
  fwd_loss          — + CLIP loss (value only, no grad)
  full_nometrics    — full train step minus retrieval metrics
  full              — the production fused step (grad + Adam + metrics)

Each variant is timed over multiple windows, best window reported (shared
chip — see CLAUDE.md).  Prints one JSON line with ms per variant plus
deltas.  Run:  python tools/profile_step.py [--scale small] [--steps 20]
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
    ap.add_argument("--scale", choices=["full", "small"], default="small",
                    help="dataset scale (model compute is identical; small "
                         "keeps HBM free for the extra ablation programs)")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
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
    from meg_decoding_tpu.data.gwilliams import _gather_batch
    from meg_decoding_tpu.data.layout import (
        normalize_locations,
        synthetic_cap_locations,
    )
    from meg_decoding_tpu.models.brain_encoder import BrainEncoder
    from meg_decoding_tpu.objectives.clip import clip_loss
    from meg_decoding_tpu.ops.scaling import collate_preprocess
    from meg_decoding_tpu.train.scan_loop import make_fused_speech_step
    from meg_decoding_tpu.train.state import create_train_state
    from meg_decoding_tpu.train.steps import CollateConfig, LossConfig

    B, C, F = 64, 208, 1024
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
                         seq2seq=True, dtype=dtype)
    optimizer = optax.adam(3e-4)
    example = (jnp.zeros((B, C, seq_len)), jnp.zeros((B, F, seq_len)),
               jnp.zeros((B,), jnp.int32))
    state = create_train_state(model, optimizer, example, jax.random.PRNGKey(0))
    loss_cfg = LossConfig(kind="clip")
    collate_cfg = CollateConfig(baseline_len_samp=60, clamp_lim=20.0)
    seg_table_np = packed.segment_table()  # passed as a jit ARG below
    n_sessions_total = int(packed.recordings.shape[0])
    rng = np.random.RandomState(0)

    data = (seg_table_np, packed.recordings, packed.y_stream,
            packed.meg_onsets, packed.speech_onsets, packed.session_subject)

    @jax.jit
    def gather_only(idx, key, seg_table, recordings, y_stream, meg_onsets,
                    speech_onsets, session_subject):
        rows = seg_table[idx]
        sess = jax.random.randint(key, (idx.shape[0],), 0, n_sessions_total)
        return _gather_batch(recordings, y_stream, meg_onsets, speech_onsets,
                             session_subject, rows[:, 0], rows[:, 1], sess,
                             seq_len)

    @jax.jit
    def collate_only(idx, key, *d):
        X, Y, subs = gather_only(idx, key, *d)
        return collate_preprocess(X, collate_cfg.baseline_len_samp,
                                  collate_cfg.clamp_lim, collate_cfg.clamp), Y, subs

    @jax.jit
    def forward_only(params, batch_stats, idx, key, *d):
        X, Y, subs = collate_only(idx, key, *d)
        variables = {"params": params["model"], "batch_stats": batch_stats}
        Z = model.apply(variables, X, subs, train=False)
        return Z.sum()

    @jax.jit
    def fwd_loss(params, batch_stats, idx, key, *d):
        X, Y, subs = collate_only(idx, key, *d)
        variables = {"params": params["model"], "batch_stats": batch_stats}
        Z = model.apply(variables, X, subs, train=False)
        return clip_loss(Y, Z, params["loss"]["temp"])

    opt_update = optimizer.update

    @jax.jit
    def full_nometrics(state, idx, key, *d):
        X, Y, subs = gather_only(idx, key, *d)
        X = collate_preprocess(X, collate_cfg.baseline_len_samp,
                               collate_cfg.clamp_lim, collate_cfg.clamp)
        kkey, skey, dkey = jax.random.split(state.key, 3)

        def loss_fn(params):
            variables = {"params": params["model"],
                         "batch_stats": state.batch_stats}
            Z, upd = model.apply(variables, X, subs, train=True,
                                 rngs={"spatial": skey, "dropout": dkey},
                                 mutable=["batch_stats"])
            return clip_loss(Y, Z, params["loss"]["temp"]), upd["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = opt_update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, opt_state=opt_state,
                             batch_stats=bs, key=kkey), loss

    fused = make_fused_speech_step(model, optimizer, loss_cfg, collate_cfg,
                                   packed)

    def time_all(variants, n_steps, n_windows):
        """``variants``: {name: (run, readback)} where ``run(i)`` dispatches
        one step and returns its device output and ``readback(out)`` forces
        completion.  Two relay gotchas shape this:

        * read back only ONCE per window — a per-step host readback through
          the remote relay adds ~30 ms of round-trip latency per step;
        * interleave the variants' windows round-robin — the chip is shared
          and its load drifts on second timescales, so timing variant A's
          windows minutes before variant B's would bake the drift into the
          A−B deltas this tool exists to measure."""
        for run, readback in variants.values():  # compile + warmup
            readback(run(0))
            for i in range(1, 4):
                out = run(i)
            readback(out)
        best = {name: float("inf") for name in variants}
        for w in range(n_windows):
            for name, (run, readback) in variants.items():
                t0 = time.time()
                for i in range(n_steps):
                    out = run(100 + w * n_steps + i)
                readback(out)  # one sync for the whole dispatched chain
                best[name] = min(best[name], time.time() - t0)
        return {f"{name}_ms": v / n_steps * 1000.0
                for name, v in best.items()}

    def mk_idx(i):
        # host numpy, NOT a device array: run_full would otherwise pull it
        # back with np.asarray every timed step — a synchronous D2H round
        # trip through the relay inside the timing window
        return rng.randint(0, len(packed), B)

    scalar = float
    first_elem = lambda out: float(out[0][0, 0, 0])

    st = [state]

    def run_nometrics(i):
        s, loss = full_nometrics(st[0], mk_idx(i), jax.random.PRNGKey(i), *data)
        st[0] = s
        return loss

    # the fused step DONATES its state argument — hand it a private copy so
    # the other variants' `state` buffers stay alive across interleaving
    st2 = [jax.tree_util.tree_map(jnp.copy, state)]

    def run_full(i):
        s, m = fused(st2[0], mk_idx(i), jax.random.PRNGKey(i))
        st2[0] = s
        return m["loss"]

    variants = {
        "gather": (lambda i: gather_only(mk_idx(i), jax.random.PRNGKey(i),
                                         *data), first_elem),
        "collate": (lambda i: collate_only(mk_idx(i), jax.random.PRNGKey(i),
                                           *data), first_elem),
        "forward": (lambda i: forward_only(state.params, state.batch_stats,
                                           mk_idx(i), jax.random.PRNGKey(i),
                                           *data), scalar),
        "fwd_loss": (lambda i: fwd_loss(state.params, state.batch_stats,
                                        mk_idx(i), jax.random.PRNGKey(i),
                                        *data), scalar),
        "full_nometrics": (run_nometrics, scalar),
        "full": (run_full, scalar),
    }
    results = time_all(variants, args.steps, args.windows)

    results = {k: round(v, 3) for k, v in results.items()}
    results["deltas_ms"] = {
        "collate": round(results["collate_ms"] - results["gather_ms"], 3),
        "forward": round(results["forward_ms"] - results["collate_ms"], 3),
        "loss": round(results["fwd_loss_ms"] - results["forward_ms"], 3),
        "backward_update": round(
            results["full_nometrics_ms"] - results["fwd_loss_ms"], 3),
        "metrics": round(results["full_ms"] - results["full_nometrics_ms"], 3),
    }
    results["dtype"] = args.dtype
    print(json.dumps(results))


if __name__ == "__main__":
    main()
