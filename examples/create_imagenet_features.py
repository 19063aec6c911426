"""Build CLIP image-feature galleries (GOD / ImageNet-val distractors).

Reference: ``examples/create_imagenet_features.py:16-52`` — CLIP ViT-B/32
image features over an image directory, saved to .npy for the GOD losses
(``image_features_train.npy`` 1200×512, ``image_features.npy`` 50×512) and
the ImageNet-val distractor gallery.

    python examples/create_imagenet_features.py <image_dir> <out.npy>
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meg_decoding_tpu.features.clip_features import (
    encode_images,
    load_clip,
    preprocess_images,
)


def load_image_dir(image_dir: str) -> np.ndarray:
    from matplotlib.image import imread

    paths = sorted(
        os.path.join(image_dir, f) for f in os.listdir(image_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
    )
    assert paths, f"no images under {image_dir}"
    imgs = []
    for p in paths:
        im = imread(p)
        if im.dtype.kind == "f":
            im = (im * 255).astype(np.uint8)
        if im.ndim == 2:
            im = np.stack([im] * 3, -1)
        imgs.append(im[..., :3])
    # per-image CLIP-style geometry BEFORE stacking (ragged sizes): resize
    # the SHORTEST side to 224 then center-crop — a straight 224×224 resize
    # would squash non-square images and skew the features vs
    # reference-built galleries (features/clip_features.py:preprocess_images
    # would then see 224×224 and have nothing left to fix)
    import jax.image
    import jax.numpy as jnp

    out = []
    for im in imgs:
        H, W = im.shape[:2]
        scale = 224.0 / min(H, W)
        nh, nw = int(round(H * scale)), int(round(W * scale))
        x = jax.image.resize(jnp.asarray(im, jnp.float32)[None],
                             (1, nh, nw, 3), method="bicubic")
        top, left = (nh - 224) // 2, (nw - 224) // 2
        x = jnp.clip(x[0, top:top + 224, left:left + 224, :], 0, 255)
        out.append(np.asarray(x, np.uint8))
    return np.stack(out)


def main():
    image_dir, out_path = sys.argv[1], sys.argv[2]
    backend = sys.argv[3] if len(sys.argv) > 3 else "auto"
    images = load_image_dir(image_dir)
    model, params = load_clip(backend=backend)
    feats = encode_images(model, params, preprocess_images(images))
    np.save(out_path, feats)
    print(f"saved {feats.shape} features to {out_path}")


if __name__ == "__main__":
    main()
