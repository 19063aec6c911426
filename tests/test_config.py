"""Config system tests: the Hydra-compatible subset (core/config.py).

The reference composes all entry points through Hydra (``train.py:28``,
``train_wowandb_cv.py:360-363``); this module guards the same user-facing
semantics — defaults-list resolution (incl. ``_self_`` ordering and
``{group: name}`` entries), ``${a.b}`` interpolation, dotted CLI overrides —
and that the SHIPPED reference-shaped YAMLs under ``configs/`` stay loadable.
"""

import os

import pytest
import yaml

from meg_decoding_tpu.core.config import Config, compose, merge, to_dict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write(path, data):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(data, f)


class TestCompose:
    def test_defaults_list_and_self_ordering(self, tmp_path):
        d = str(tmp_path)
        _write(f"{d}/base.yaml", {"lr": 1e-3, "epochs": 10, "name": "base"})
        # _self_ AFTER the default → the main file wins
        _write(f"{d}/main.yaml",
               {"defaults": ["base", "_self_"], "name": "main"})
        cfg = compose(d, "main")
        assert cfg.name == "main" and cfg.lr == 1e-3 and cfg.epochs == 10
        # _self_ BEFORE the default → the default wins (Hydra semantics)
        _write(f"{d}/main2.yaml",
               {"defaults": ["_self_", "base"], "name": "main2"})
        cfg2 = compose(d, "main2")
        assert cfg2.name == "base"

    def test_group_name_entry_and_nested_defaults(self, tmp_path):
        d = str(tmp_path)
        _write(f"{d}/subjects/sbj01.yaml",
               {"subject_name": "sbj01", "fs": 1000})
        _write(f"{d}/main.yaml",
               {"defaults": [{"subjects": "sbj01"}, "_self_"], "model": "eegnet"})
        cfg = compose(d, "main")
        assert cfg.subject_name == "sbj01" and cfg.fs == 1000
        assert cfg.model == "eegnet"

    def test_interpolation_preserves_types(self, tmp_path):
        d = str(tmp_path)
        _write(f"{d}/c.yaml", {
            "rate": 120,
            "window": {"len_sec": 3},
            "samples": "${rate}",                    # whole-string → int
            "run_name": "rate-${rate}-w${window.len_sec}",  # embedded → str
        })
        cfg = compose(d, "c")
        assert cfg.samples == 120 and isinstance(cfg.samples, int)
        assert cfg.run_name == "rate-120-w3"

    def test_dotted_overrides_parse_yaml_values(self, tmp_path):
        d = str(tmp_path)
        _write(f"{d}/c.yaml", {"lr": 1e-3, "loss": {"kind": "clip"}})
        cfg = compose(d, "c", overrides=[
            "lr=0.01", "loss.kind=mse", "+new.flag=true", "epochs=20"])
        assert cfg.lr == 0.01 and isinstance(cfg.lr, float)
        assert cfg.loss.kind == "mse"
        assert cfg.new.flag is True
        assert cfg.epochs == 20

    def test_bad_override_raises(self, tmp_path):
        d = str(tmp_path)
        _write(f"{d}/c.yaml", {"a": 1})
        with pytest.raises(ValueError):
            compose(d, "c", overrides=["not-an-override"])


class TestShippedConfigs:
    """The repo's configs/ stay drop-in loadable (reference key shapes)."""

    @pytest.mark.parametrize("name", ["config", "config_GOD"])
    def test_loads_and_has_reference_keys(self, name):
        cfg = compose(os.path.join(REPO, "configs"), name)
        assert "preprocs" in cfg and "brain_resample_rate" in cfg.preprocs
        assert "batch_size" in cfg and "epochs" in cfg

    def test_throughput_preset_composes(self):
        """The promoted perf recipe ships as a preset layered over the
        reference-faithful config.yaml (RESULTS.md round 4)."""
        cfg = compose(os.path.join(REPO, "configs"), "throughput")
        assert cfg.compute_dtype == "bfloat16"
        assert cfg.batch_size == 256
        assert cfg.cache_collate_stats is True
        assert cfg.gelu_approximate is True
        # everything else inherits the reference-faithful base
        assert "preprocs" in cfg and "brain_resample_rate" in cfg.preprocs
        assert cfg.loss.kind == "clip"

    def test_throughput_exact_preset_composes(self):
        """The zero-deviation perf recipe (round 5): bf16 + cached stats +
        the few-ulp-exact polynomial erf GELU; gelu_approximate stays off
        so the resolved impl is erf_poly, not tanh."""
        cfg = compose(os.path.join(REPO, "configs"), "throughput_exact")
        assert cfg.compute_dtype == "bfloat16"
        assert cfg.batch_size == 256
        assert cfg.cache_collate_stats is True
        assert cfg.gelu_impl == "erf_poly"
        assert cfg.gelu_approximate is False

        from meg_decoding_tpu.ops.gelu import resolve_impl

        assert resolve_impl(cfg.gelu_impl, cfg.gelu_approximate) == "erf_poly"
        assert "preprocs" in cfg and cfg.loss.kind == "clip"

    def test_subject_manifest_composes(self):
        cfg = compose(os.path.join(REPO, "configs"), "config_GOD",
                      overrides=["batch_size=8"])
        assert cfg.batch_size == 8

    def test_all_shipped_subject_manifests_compose(self):
        """sbj01-03 manifests (reference configs_bu0501/subjects/ parity):
        each composes into config_GOD and carries the full session lists."""
        for name, n_train in (("sbj01", 1), ("sbj02", 12), ("sbj03", 12)):
            cfg = compose(os.path.join(REPO, "configs", "subjects"), name)
            sub = getattr(cfg.subjects, name)
            assert sub.fs == 1000
            assert len(sub.train.mat) == n_train
            assert len(sub.train.mat) == len(sub.train.labels) \
                == len(sub.train.trigger) == len(sub.train.rest)
            assert len(sub.val.mat) == len(sub.val.labels)

    def test_pattern_manifests_compose_multi_subject(self, tmp_path):
        """Pattern composition manifests (reference
        configs_bu0501/subjects/pattern_*.yaml — the multi-subject GOD
        mechanism): an experiment config pulls subjects/pattern_small and
        gets BOTH subjects' reduced manifests deep-merged under
        ``subjects:``, exactly like the reference's
        pattern_small -> sbj01_small + sbj02_small chain."""
        import shutil

        cdir = tmp_path / "configs"
        shutil.copytree(os.path.join(REPO, "configs"), cdir)
        (cdir / "exp_small.yaml").write_text(
            "defaults:\n"
            "  - subjects/pattern_small\n"
            "  - _self_\n"
            "model: eegnet\n")
        cfg = compose(str(cdir), "exp_small")
        assert sorted(cfg.subjects.keys()) == ["sbj01", "sbj02"]
        # the _small variants carry session SUBSETS of the full manifests
        assert len(cfg.subjects.sbj02.train.mat) == 1
        assert cfg.subjects.sbj01.fs == 1000
        assert cfg.model == "eegnet"

        (cdir / "exp_a.yaml").write_text(
            "defaults:\n"
            "  - subjects/patternA\n"
            "  - _self_\n")
        cfg3 = compose(str(cdir), "exp_a")
        assert sorted(cfg3.subjects.keys()) == ["sbj01", "sbj02", "sbj03"]
        assert len(cfg3.subjects.sbj03.train.mat) == 12

        for pat, subs in (("pattern_sbj01", ["sbj01"]),
                          ("pattern_mini", ["sbj01"])):
            (cdir / "exp_p.yaml").write_text(
                f"defaults:\n  - subjects/{pat}\n  - _self_\n")
            got = compose(str(cdir), "exp_p")
            assert sorted(got.subjects.keys()) == subs


class TestMergeAndRoundtrip:
    def test_deep_merge_override_wins(self):
        a = Config({"x": 1, "sub": {"a": 1, "b": 2}})
        b = Config({"sub": {"b": 3, "c": 4}, "y": 9})
        m = merge(a, b)
        assert to_dict(m) == {"x": 1, "sub": {"a": 1, "b": 3, "c": 4}, "y": 9}
        # merge must not mutate its inputs
        assert to_dict(a) == {"x": 1, "sub": {"a": 1, "b": 2}}

    def test_to_dict_roundtrip(self):
        d = {"a": [1, {"b": 2}], "c": {"d": None}}
        assert to_dict(Config(d)) == d
