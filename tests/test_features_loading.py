"""Real-weights loading branch of features/wav2vec.py and
features/clip_features.py (VERDICT r2 weak #7).

The zero-egress image can't reach the HF hub, but ``from_pretrained``
accepts a LOCAL directory — so a tiny HF-format checkpoint written to disk
exercises the exact production code path (config resolution + weight
load + flax param conversion), offline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_wav2vec_ckpt(path: str):
    from transformers import FlaxWav2Vec2Model, Wav2Vec2Config

    cfg = Wav2Vec2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, do_stable_layer_norm=True,
        feat_extract_norm="layer",
        conv_dim=(8, 8), conv_kernel=(3, 3), conv_stride=(2, 2),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        vocab_size=16,
    )
    model = FlaxWav2Vec2Model(cfg, seed=7)
    model.save_pretrained(path)
    return model


def _tiny_clip_ckpt(path: str):
    from transformers import (
        CLIPConfig,
        CLIPTextConfig,
        CLIPVisionConfig,
        FlaxCLIPModel,
    )

    cfg = CLIPConfig.from_text_vision_configs(
        CLIPTextConfig(hidden_size=16, intermediate_size=32,
                       num_hidden_layers=2, num_attention_heads=2,
                       max_position_embeddings=16, vocab_size=99),
        CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                         num_hidden_layers=2, num_attention_heads=2,
                         image_size=32, patch_size=16),
        projection_dim=8,
    )
    model = FlaxCLIPModel(cfg, seed=7)
    model.save_pretrained(path)
    return model


def _tree_allclose(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)


class TestWav2VecHFLoading:
    def test_hf_backend_loads_saved_weights(self, tmp_path):
        from meg_decoding_tpu.features.wav2vec import load_wav2vec

        saved = _tiny_wav2vec_ckpt(str(tmp_path / "w2v"))
        model, params = load_wav2vec(str(tmp_path / "w2v"), backend="hf")
        _tree_allclose(params, saved.params)  # real weights, not a re-init

    def test_loaded_model_embeds_audio(self, tmp_path):
        """End to end through the production embedding path with the loaded
        checkpoint: chunked last-4-layer averaging on a short waveform."""
        from meg_decoding_tpu.features.wav2vec import (
            embed_last4_avg,
            load_wav2vec,
        )

        _tiny_wav2vec_ckpt(str(tmp_path / "w2v"))
        model, params = load_wav2vec(str(tmp_path / "w2v"), backend="hf")
        wav = np.sin(np.linspace(0, 100, 4000)).astype(np.float32)
        emb = np.asarray(embed_last4_avg(model, params, wav))
        assert emb.shape[0] == 32  # hidden_size of the tiny config
        assert emb.shape[1] > 0 and np.all(np.isfinite(emb))

    def test_auto_prefers_weights_and_falls_back(self, tmp_path, capsys):
        from meg_decoding_tpu.features.wav2vec import load_wav2vec

        saved = _tiny_wav2vec_ckpt(str(tmp_path / "w2v"))
        _, params = load_wav2vec(str(tmp_path / "w2v"), backend="auto")
        _tree_allclose(params, saved.params)
        # missing checkpoint: auto falls back to random, hf raises
        _, _ = load_wav2vec(str(tmp_path / "nope"), backend="auto",
                            num_hidden_layers=1)
        assert "randomly initialized" in capsys.readouterr().out
        with pytest.raises(Exception):
            load_wav2vec(str(tmp_path / "nope"), backend="hf")


class TestCLIPHFLoading:
    def test_hf_backend_loads_saved_weights(self, tmp_path):
        from meg_decoding_tpu.features.clip_features import load_clip

        saved = _tiny_clip_ckpt(str(tmp_path / "clip"))
        model, params = load_clip(str(tmp_path / "clip"), backend="hf")
        _tree_allclose(params, saved.params)

    def test_loaded_model_encodes_images(self, tmp_path):
        from meg_decoding_tpu.features.clip_features import (
            encode_images,
            load_clip,
        )

        _tiny_clip_ckpt(str(tmp_path / "clip"))
        model, params = load_clip(str(tmp_path / "clip"), backend="hf")
        imgs = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
        feats = np.asarray(encode_images(model, params, imgs))
        assert feats.shape == (2, 8)  # tiny projection_dim
        assert np.all(np.isfinite(feats))
