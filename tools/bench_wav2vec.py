"""wav2vec2 stimulus-embedding throughput on the attached TPU.

The reference embeds stimulus audio on CPU/GPU inside its preprocessing
fan-out (``gwilliams2022.py:328-388``, wav2vec2-large-xlsr-53 forward over
~4×~6.6 min of audio).  Here the Flax forward runs jitted on the TPU
(``features/wav2vec.py``, fixed-shape chunks).  Weights are randomly
initialized (zero-egress image) — identical architecture and FLOPs, so the
throughput number is honest.

Prints ONE JSON line {audio_seconds_per_second, chunk_sec, ...}.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from meg_decoding_tpu.features.wav2vec import embed_last4_avg, load_wav2vec

    # full xlsr-53 architecture: 24 layers, H=1024 (random init, same FLOPs)
    model, params = load_wav2vec(backend="random", num_hidden_layers=24)
    rng = np.random.RandomState(0)
    audio_sec = 60.0
    wav = (rng.randn(int(16000 * audio_sec)) * 0.1).astype(np.float32)

    embed_last4_avg(model, params, wav, chunk_sec=20.0)  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        emb = embed_last4_avg(model, params, wav, chunk_sec=20.0)
        best = min(best, time.time() - t0)
    print(json.dumps({
        "metric": "wav2vec_audio_seconds_per_second",
        "value": round(audio_sec / best, 1),
        "unit": "audio_sec/sec",
        "chunk_sec": 20.0,
        "emb_shape": list(emb.shape),
        "sec_for_60s_audio": round(best, 3),
    }))


if __name__ == "__main__":
    main()
