"""Serving-artifact export (serving/export.py + cli/export_model.py).

The artifact must be a drop-in for the evaluator's forward: same math as
``model.apply(..., train=False)`` behind the collate chain, batch-
polymorphic, lowered for tpu AND cpu, with weights as call-time arguments
(not program constants)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meg_decoding_tpu.data.layout import (
    normalize_locations,
    synthetic_cap_locations,
)
from meg_decoding_tpu.models.brain_encoder import BrainEncoder
from meg_decoding_tpu.ops.scaling import collate_preprocess
from meg_decoding_tpu.serving.export import load_artifact, save_artifact
from meg_decoding_tpu.train.steps import CollateConfig

C, T, F = 12, 40, 16


@pytest.fixture(scope="module")
def tiny_encoder():
    loc = normalize_locations(synthetic_cap_locations(C))
    model = BrainEncoder(loc=loc, num_subjects=3, D1=8, D2=12, F=F, K=4,
                         seq2seq=False)
    rng = np.random.RandomState(0)
    X1 = jnp.asarray(rng.randn(2, C, T), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "spatial": jax.random.PRNGKey(1)},
                           X1, jnp.zeros((2,), jnp.int32))
    return model, variables


class TestArtifactRoundtrip:
    def test_matches_eval_forward_any_batch(self, tiny_encoder, tmp_path):
        model, variables = tiny_encoder
        collate = CollateConfig(baseline_len_samp=5, clamp_lim=20.0)
        out = save_artifact(str(tmp_path / "art"), model,
                            {"model": variables["params"]},
                            variables.get("batch_stats", {}),
                            C, T, collate)
        served = load_artifact(out)
        assert served.platforms == ("tpu", "cpu")

        rng = np.random.RandomState(1)
        for B in (1, 4, 7):  # batch-polymorphic: odd sizes too
            X = rng.randn(B, C, T).astype(np.float32)
            subs = rng.randint(0, 3, B).astype(np.int32)
            Z = served(X, subs)
            Xc = collate_preprocess(jnp.asarray(X), 5, 20.0, True)
            ref = model.apply(variables, Xc, jnp.asarray(subs), train=False)
            np.testing.assert_allclose(np.asarray(Z), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5)

    def test_weights_are_arguments_not_constants(self, tiny_encoder, tmp_path):
        """Perturbing the loaded weights must change the output — proving
        the program closed over nothing (a constants-baked program would
        ignore the weights file entirely)."""
        model, variables = tiny_encoder
        out = save_artifact(str(tmp_path / "art"), model,
                            {"model": variables["params"]},
                            variables.get("batch_stats", {}), C, T, None)
        served = load_artifact(out)
        rng = np.random.RandomState(2)
        X = rng.randn(2, C, T).astype(np.float32)
        subs = np.zeros(2, np.int32)
        z0 = np.asarray(served(X, subs))
        served.variables = jax.tree_util.tree_map(lambda a: a * 1.5,
                                                  served.variables)
        z1 = np.asarray(served(X, subs))
        assert not np.allclose(z0, z1)

    def test_meta_describes_inputs(self, tiny_encoder, tmp_path):
        model, variables = tiny_encoder
        out = save_artifact(str(tmp_path / "art"), model,
                            {"model": variables["params"]},
                            variables.get("batch_stats", {}), C, T,
                            CollateConfig(baseline_len_samp=5, clamp_lim=8.0))
        import json

        meta = json.load(open(os.path.join(out, "meta.json")))
        assert meta["input"]["X"] == [None, C, T]
        assert meta["collate"]["clamp_lim"] == 8.0
        assert set(meta["platforms"]) == {"tpu", "cpu"}


class TestExportCLI:
    def test_export_from_trained_god_checkpoint(self, tmp_path):
        """Train the tiny GOD fixture, export via the CLI entry, and check
        the artifact reproduces the evaluator's embeddings."""
        from tests.fixtures import make_god_fixture
        from meg_decoding_tpu.cli.train_god import run as train_run
        from meg_decoding_tpu.cli.export_model import run as export_run

        root = str(tmp_path / "god")
        cfg = make_god_fixture(root, subjects=("sbj01", "sbj02"))
        save_root = os.path.join(root, "out")
        for k, v in dict(save_root=save_root, training_mode="split",
                         use_sampler=True, batch_size=16, updates=4,
                         epochs=1, test_size=16, lr=1e-3,
                         lr_scheduler="none", reduction="mean",
                         init_temperature=5.1, model="linear", F=16,
                         scp=True, num_subjects=2, seed=0).items():
            cfg.set_dotted(k, v)
        train_run(cfg)
        out_dir = export_run(cfg)
        served = load_artifact(out_dir)
        assert served.meta["dataset"] == "GOD"

        # oracle: the evaluator's forward on the same checkpoint
        from meg_decoding_tpu.cli.evaluate_god import _build, predict
        from meg_decoding_tpu.train.checkpoint import CheckpointManager
        from meg_decoding_tpu.train.schedules import make_optimizer
        from meg_decoding_tpu.train.state import create_train_state

        source, val, model = _build(cfg)
        example = source.gather(np.arange(8))
        abstract = create_train_state(model, make_optimizer(cfg, 4),
                                      example[:3], jax.random.PRNGKey(0))
        state, _ = CheckpointManager(os.path.join(save_root, "ckpt")) \
            .load_best_or_last(abstract)
        ref = predict(cfg, model, state, val, batch_size=8)

        X, _, subs = val.gather(np.arange(8))[:3]
        Z = np.asarray(served(np.asarray(X), np.asarray(subs)))
        np.testing.assert_allclose(Z, np.asarray(ref[:8]), rtol=2e-5,
                                   atol=2e-5)

    def test_export_from_trained_speech_checkpoint(self, tmp_path):
        """The speech branch: Gwilliams seq2seq checkpoint → artifact whose
        program carries the collate chain and the (B, F, T) head."""
        from tests.fixtures import make_gwilliams_cache
        from meg_decoding_tpu.cli.train_speech import run as train_run
        from meg_decoding_tpu.cli.export_model import run as export_run

        cfg = make_gwilliams_cache(str(tmp_path / "cache"))
        save_root = str(tmp_path / "out")
        for k, v in dict(save_root=save_root, model="brain_encoder", D1=8,
                         D2=12, F=16, K=4, d_drop=0.1, seq2seq=True,
                         batch_size=16, updates=2, epochs=1,
                         use_sampler=True, test_size=16, lr=1e-3,
                         lr_scheduler="none", init_temperature=5.1,
                         seed=0).items():
            setattr(cfg, k, v)
        cfg.set_dotted("loss.kind", "clip")
        train_run(cfg)
        served = load_artifact(export_run(cfg))
        assert served.meta["dataset"] == "Gwilliams2022"
        assert served.meta["collate"]["enabled"] is True

        rng = np.random.RandomState(3)
        nC = served.meta["input"]["X"][1]
        seq = served.meta["input"]["X"][2]
        Z = np.asarray(served(rng.randn(3, nC, seq).astype(np.float32),
                              np.zeros(3, np.int32)))
        assert Z.shape == (3, 16, seq) and np.isfinite(Z).all()
