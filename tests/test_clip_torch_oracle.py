"""Independent torch oracle for the Flax CLIP image-feature path.

The reference builds its GOD / ImageNet-val galleries with HF's **torch**
CLIP (``examples/create_imagenet_features.py:16-52``); our production path
(``features/clip_features.py``) runs HF's Flax port.  Same certification
pattern as ``tests/test_wav2vec_torch_oracle.py``: transplant identical
weights with HF's own converter and require the image features to agree —
a divergent vision tower would silently skew every zero-shot/distractor
evaluation against reference-built galleries.

torch is test-only (CLAUDE.md oracle-test pattern).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from transformers import (
    CLIPConfig,
    CLIPModel,
    CLIPTextConfig,
    CLIPVisionConfig,
    FlaxCLIPModel,
)
from transformers.modeling_flax_pytorch_utils import (
    load_flax_weights_in_pytorch_model,
)

from meg_decoding_tpu.features.clip_features import (
    encode_images,
    preprocess_images,
)


def _tiny_clip_cfg():
    return CLIPConfig.from_text_vision_configs(
        CLIPTextConfig(hidden_size=16, intermediate_size=32,
                       num_hidden_layers=2, num_attention_heads=2,
                       max_position_embeddings=16, vocab_size=99),
        CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                         num_hidden_layers=3, num_attention_heads=2,
                         image_size=224, patch_size=32),
        projection_dim=24,
    )


def _paired_models(cfg, seed=9):
    flax_model = FlaxCLIPModel(cfg, seed=seed)
    pt_model = CLIPModel(cfg)
    pt_model = load_flax_weights_in_pytorch_model(pt_model, flax_model.params)
    pt_model.eval()
    return flax_model, pt_model


class TestCLIPTorchOracle:
    def test_image_features_match_torch(self):
        """encode_images (the gallery builder's forward) vs torch
        get_image_features on identical preprocessed pixels."""
        cfg = _tiny_clip_cfg()
        flax_model, pt_model = _paired_models(cfg)
        rng = np.random.RandomState(0)
        imgs = rng.randint(0, 256, (5, 224, 224, 3)).astype(np.uint8)
        pixels = preprocess_images(imgs)

        got = encode_images(flax_model, flax_model.params, pixels,
                            batch_size=3)  # exercises the batching loop too
        with torch.no_grad():
            want = pt_model.get_image_features(
                pixel_values=torch.from_numpy(
                    pixels.transpose(0, 3, 1, 2)).float()).numpy()
        assert got.shape == want.shape == (5, cfg.projection_dim)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_preprocess_matches_reference_normalization(self):
        """The committed CLIP mean/std and the shortest-side-resize +
        center-crop convention on a non-square image: output must be
        224×224 with the official channel statistics applied."""
        rng = np.random.RandomState(1)
        imgs = rng.randint(0, 256, (2, 300, 260, 3)).astype(np.uint8)
        x = preprocess_images(imgs)
        assert x.shape == (2, 224, 224, 3)
        # invert the normalization: values must land back in [0, 1]
        mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
        std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
        un = x * std + mean
        assert un.min() > -0.2 and un.max() < 1.2  # bicubic may ring slightly
