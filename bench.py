"""Benchmark: flagship Gwilliams2022 training throughput on the attached TPU.

Times the REAL training pipeline, end to end on device: random
subject-session pairing + 3 s window gather out of HBM-resident continuous
recordings (Pallas DMA kernel), on-device collate (baseline correction +
robust scaling + clamp), seq2seq BrainEncoder (D1=270, D2=320, F=1024, K=32,
208 ch × 360 samples — the reference's ``configs/config.yaml``), CLIP loss
over the flattened (B, F·T) embeddings, backward, Adam update, retrieval
metrics.  B = 64 like the reference.

``vs_baseline`` compares against the PyTorch reference-equivalent training
step measured on this host's CPU (tools/baseline_torch.py →
tools/baseline_measured.json; the reference repo commits no throughput
numbers — BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np


def _make_synthetic_packed(C, F, rate, rec_sec, words_per_task, n_subjects,
                           n_sessions, seq_len_sec):
    """Synthetic packed Gwilliams dataset at full scale (no file I/O)."""
    import jax.numpy as jnp

    from meg_decoding_tpu.data.gwilliams import GwilliamsPacked
    from meg_decoding_tpu.ops.pallas.window_gather import pad_time_for_gather

    rng = np.random.RandomState(0)
    T = int(rec_sec * rate)
    seq_len = int(seq_len_sec * rate)
    Tp = pad_time_for_gather(T, seq_len)
    n_sess_total = n_subjects * n_sessions
    recordings = rng.randn(n_sess_total, 4, C, Tp).astype(np.float32)
    y_stream = rng.randn(4, F, Tp).astype(np.float32)
    onsets = np.sort(
        rng.randint(0, T - seq_len, size=(4, words_per_task))).astype(np.int32)
    meg_onsets = np.broadcast_to(onsets[None], (n_sess_total, 4, words_per_task))
    session_subject = np.repeat(np.arange(n_subjects), n_sessions)
    return GwilliamsPacked(
        recordings=jnp.asarray(recordings),
        y_stream=jnp.asarray(y_stream),
        meg_onsets=jnp.asarray(np.ascontiguousarray(meg_onsets)),
        speech_onsets=jnp.asarray(onsets),
        n_words=np.full(4, words_per_task),
        session_subject=jnp.asarray(session_subject),
        seq_len=seq_len,
        num_subjects=n_subjects,
    )


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

    import optax

    from meg_decoding_tpu.data.gwilliams import gather_speech_batch
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

    B, C, F, S = 64, 208, 1024, 2
    packed = _make_synthetic_packed(C=C, F=F, rate=120, rec_sec=120.0,
                                    words_per_task=120, n_subjects=S,
                                    n_sessions=2, seq_len_sec=3)
    loc = normalize_locations(synthetic_cap_locations(C))
    model = BrainEncoder(loc=loc, num_subjects=S, D1=270, D2=320, F=F, K=32,
                         seq2seq=True)
    optimizer = optax.adam(3e-4)
    rng = np.random.RandomState(0)

    def batch(i):
        idx = rng.randint(0, len(packed), B)
        X, Y, subs, _ = gather_speech_batch(packed, idx, jax.random.PRNGKey(i))
        return X, Y, subs

    state = create_train_state(model, optimizer, batch(0), jax.random.PRNGKey(0))
    train_step = make_train_step(
        model, optimizer, LossConfig(kind="clip"),
        CollateConfig(baseline_len_samp=60, clamp_lim=20.0), donate=True,
    )

    # compile + warmup (float() readback: block_until_ready does not
    # reliably block through the axon relay)
    state, metrics = train_step(state, *batch(1))
    float(metrics["loss"])
    for i in range(3):
        state, metrics = train_step(state, *batch(2 + i))
    float(metrics["loss"])

    # The attached chip is shared through a relay and run-to-run interference
    # is large; time several windows and report the best (interference only
    # ever slows a window down).
    n_steps, n_windows = 20, 5
    best_dt = float("inf")
    for w in range(n_windows):
        t0 = time.time()
        for i in range(n_steps):
            state, metrics = train_step(state, *batch(100 + w * n_steps + i))
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
        "metric": "gwilliams_train_samples_per_sec_per_chip",
        "value": round(sps, 2),
        "unit": "samples/sec",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
