"""wav2vec2 speech embeddings (Flax, TPU-ready).

Reference: ``meg_decoding/utils/wav2vec_util.py`` — loads HF
``facebook/wav2vec2-large-xlsr-53`` and averages the last four hidden layers
(``getW2VLastFourLayersAvg``, :14-32) → (1024, T'); the alternative
``feature_extractor`` path yields 512-d conv features
(``brennan2018.py:187-189``).

Differences by design:
* Runs as a jitted Flax forward on the accelerator (the reference runs torch
  on CPU/GPU outside the training process).
* The reference splits the waveform into 10 equal chunks and embeds each
  independently (``wav2vec_util.py:22-24``, a FIXME'd boundary artifact).  We
  use overlapping chunks and keep only each chunk's interior, avoiding the
  boundary artifact (deviation documented per SURVEY §7 hard-part 5).
* Zero-egress images have no HF weights: ``backend='random'`` initializes the
  same architecture with random params (correct shapes/rates for pipeline
  tests and benchmarks); ``backend='hf'`` loads real weights when cached or
  reachable.  Precomputed-embedding .npy files are always accepted upstream.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["load_wav2vec", "embed_last4_avg", "embed_features", "w2v_output_rate"]

_W2V_FRAME_RATE = 16000 / 320  # conv stack stride 320 → 49.99 Hz


def w2v_output_rate() -> float:
    return _W2V_FRAME_RATE


def load_wav2vec(model_name: str = "facebook/wav2vec2-large-xlsr-53",
                 backend: str = "auto", num_hidden_layers: int = 24):
    """Return (flax module, params).  backend: 'hf' | 'random' | 'auto'.

    ``num_hidden_layers`` only affects the random backend (tests use a
    shallow model; frame rate and last-4 semantics are depth-independent).
    """
    from transformers import FlaxWav2Vec2Model, Wav2Vec2Config

    if backend in ("hf", "auto"):
        try:
            model = FlaxWav2Vec2Model.from_pretrained(model_name)
            return model, model.params
        except Exception as e:
            if backend == "hf":
                raise
            print(f"[wav2vec] weights unavailable ({type(e).__name__}); "
                  "using randomly initialized model (backend='random')")
    # random init with the architecture of the named model (offline-safe)
    cfg = Wav2Vec2Config(
        hidden_size=1024, num_hidden_layers=num_hidden_layers,
        num_attention_heads=16, intermediate_size=4096,
        do_stable_layer_norm=True, feat_extract_norm="layer",
    )
    model = FlaxWav2Vec2Model(cfg, seed=0)
    return model, model.params


def _forward_hidden(model, params, wav_chunk: jnp.ndarray):
    """All hidden states for one (1, T) waveform chunk (eager, one-off)."""
    out = model(wav_chunk[None, :], params=params, output_hidden_states=True,
                train=False)
    return out.hidden_states  # tuple of (1, T', H)


from collections import OrderedDict

_FWD_CACHE: OrderedDict = OrderedDict()
_FWD_CACHE_MAX = 2  # the jit closure pins its model (+ executables), so
# GC-based eviction can never fire; a small LRU bounds the pinning instead


def _jitted_last4(model):
    """Per-model cached jitted chunk forward: a fresh ``jax.jit`` wrapper
    re-traces the 24-layer model on every call (~1.5 s of pure Python), so
    the wrapper must outlive the call.  The closure necessarily holds the
    model, so the cache is a small LRU — sweeping over many models pins at
    most ``_FWD_CACHE_MAX`` of them instead of growing without bound."""
    key = id(model)
    fn = _FWD_CACHE.get(key)
    if fn is None:
        fn = jax.jit(lambda p, w, m: jnp.mean(jnp.stack(
            model(w[None], attention_mask=m[None], params=p,
                  output_hidden_states=True, train=False).hidden_states[-4:]),
            axis=0)[0])
        _FWD_CACHE[key] = fn
        while len(_FWD_CACHE) > _FWD_CACHE_MAX:
            _FWD_CACHE.popitem(last=False)
    else:
        _FWD_CACHE.move_to_end(key)
    return fn


def _num_frames(config, n_samples: int) -> int:
    """Conv-stack output length for ``n_samples`` input samples."""
    n = n_samples
    for k, s in zip(config.conv_kernel, config.conv_stride):
        n = (n - k) // s + 1
    return n


def embed_last4_avg(model, params, waveform: np.ndarray,
                    chunk_sec: float = 20.0, overlap_sec: float = 1.0,
                    sample_rate: int = 16000) -> np.ndarray:
    """Average of the last four hidden layers over the full waveform → (H, T').

    Overlap-chunked to bound memory; interiors are stitched so chunk
    boundaries don't imprint (unlike reference ``wav2vec_util.py:22-24``).

    TPU-first: every chunk goes through ONE jitted fixed-shape forward (the
    final short chunk is zero-padded and attention-masked, with only its
    valid conv frames emitted) — one compile per chunk size, not an eager
    op-by-op dispatch per chunk.  ``params`` is a jit ARGUMENT: closing over
    ~1.2 GB of weights would bake them into the HLO (see CLAUDE.md).
    """
    waveform = np.asarray(waveform, dtype=np.float32).reshape(-1)
    stride = int(np.prod(model.config.conv_stride))  # 320 for wav2vec2
    chunk = (int(chunk_sec * sample_rate) // stride) * stride
    T = len(waveform)
    if T <= chunk:
        hs = _forward_hidden(model, params, jnp.asarray(waveform))
        emb = jnp.mean(jnp.stack(hs[-4:]), axis=0)[0]  # (T', H)
        return np.asarray(emb.T)

    fwd = _jitted_last4(model)
    frame_pos = jnp.arange(chunk)

    # Chunk starts are stride-aligned so frame i of a chunk at sample s is
    # global frame s//stride + i; interiors are stitched seamlessly.
    ov_frames = max(int(round(overlap_sec * sample_rate / stride)), 1)
    n_chunk_frames = _num_frames(model.config, chunk)
    if n_chunk_frames <= 2 * ov_frames:
        raise ValueError(
            f"chunk_sec={chunk_sec} yields {n_chunk_frames} frames but "
            f"overlap_sec={overlap_sec} consumes 2×{ov_frames}; the chunk "
            "window would walk backwards and never finish — increase "
            "chunk_sec or decrease overlap_sec")
    pieces = []
    pos = 0  # next global frame index to emit
    start = 0
    while True:
        end = min(start + chunk, T)
        buf = np.zeros(chunk, np.float32)
        buf[: end - start] = waveform[start:end]
        mask = (frame_pos < (end - start)).astype(jnp.int32)
        # stays on device: per-chunk host readback of the (n, H) embedding
        # costs ~125 ms over this rig's relay vs ~44 ms of compute
        emb = fwd(params, jnp.asarray(buf), mask)  # (n_chunk, H)
        n_valid = (n_chunk_frames if end - start == chunk
                   else _num_frames(model.config, end - start))
        g0 = start // stride
        lo = pos - g0
        hi = n_valid if end == T else n_valid - ov_frames
        pieces.append(emb[lo:hi])
        pos = g0 + hi
        if end == T:
            break
        start += (n_valid - 2 * ov_frames) * stride
    return np.asarray(jnp.concatenate(pieces, axis=0).T)  # (H, T')


def embed_features(model, params, waveform: np.ndarray) -> np.ndarray:
    """Conv feature-extractor path → (512, T') (brennan2018.py:187-189)."""
    waveform = np.asarray(waveform, dtype=np.float32).reshape(-1)
    out = model.module.apply(
        {"params": params}, jnp.asarray(waveform)[None, :],
        method=lambda m, w: m.feature_extractor(w),
    )
    return np.asarray(out[0].T)
