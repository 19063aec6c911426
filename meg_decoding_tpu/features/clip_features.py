"""CLIP image features (Flax, TPU-ready).

Reference: ``examples/create_imagenet_features.py:16-52`` — CLIP ViT-B/32
``encode_image`` over GOD / ImageNet-val images, saved as the .npy/.pkl
galleries consumed by the GOD losses (``loss.py:149-166``) and the
distractor evaluation.

Offline-safe like wav2vec: ``backend='hf'`` loads real weights when
available; ``backend='random'`` builds the same ViT-B/32 architecture with
random params (correct 512-d output for pipeline tests).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = ["load_clip", "encode_images", "preprocess_images"]

_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def load_clip(model_name: str = "openai/clip-vit-base-patch32",
              backend: str = "auto"):
    from transformers import CLIPConfig, FlaxCLIPModel

    if backend in ("hf", "auto"):
        try:
            model = FlaxCLIPModel.from_pretrained(model_name)
            return model, model.params
        except Exception as e:
            if backend == "hf":
                raise
            print(f"[clip] weights unavailable ({type(e).__name__}); "
                  "using randomly initialized ViT-B/32 (backend='random')")
    cfg = CLIPConfig()  # defaults = ViT-B/32, 512-d projection
    model = FlaxCLIPModel(cfg, seed=0)
    return model, model.params


def preprocess_images(images: np.ndarray) -> np.ndarray:
    """uint8 (N, H, W, 3) → CLIP-normalized float (N, 224, 224, 3).

    CLIP's official preprocessing: resize the SHORTEST side to 224
    (bicubic), then center-crop 224×224 — a straight resize would squash
    non-square images and skew features vs reference-built galleries."""
    import jax.image

    x = jnp.asarray(images, jnp.float32) / 255.0
    N, H, W = x.shape[0], x.shape[1], x.shape[2]
    if (H, W) != (224, 224):
        scale = 224.0 / min(H, W)
        nh, nw = int(round(H * scale)), int(round(W * scale))
        x = jax.image.resize(x, (N, nh, nw, 3), method="bicubic")
        top, left = (nh - 224) // 2, (nw - 224) // 2
        x = x[:, top:top + 224, left:left + 224, :]
    x = (x - _CLIP_MEAN) / _CLIP_STD
    return np.asarray(x)


def encode_images(model, params, images: np.ndarray,
                  batch_size: int = 64) -> np.ndarray:
    """Normalized images (N, 224, 224, 3) → (N, 512) image features."""
    feats = []
    for i in range(0, len(images), batch_size):
        batch = jnp.asarray(images[i : i + batch_size])
        pixel_values = jnp.transpose(batch, (0, 3, 1, 2))  # NCHW for CLIP
        out = model.get_image_features(pixel_values=pixel_values, params=params)
        feats.append(np.asarray(out))
    return np.concatenate(feats, axis=0)
