"""Guard the driver's benchmark deliverable: ``bench.py --tiny`` must
execute every bench row end to end (the real training pipeline at tiny
dims) and print one valid JSON line.  Marked slow (~2-3 min on the 1-core
CPU host)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_tiny_emits_all_rows():
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--tiny",
         "--steps", "2", "--windows", "2"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1200)
    assert p.returncode == 0, p.stderr[-3000:]
    row = json.loads(p.stdout.strip().splitlines()[-1])
    assert row["metric"] == "gwilliams_train_samples_per_sec_per_chip"
    assert row["value"] > 0 and "error" not in row
    # tiny mode uses B2=16, so the batch-scaling rows are b16_* (full-scale
    # runs produce b256_/b512_/b1024_ via --big-batches)
    for key in ["scan_epoch_samples_per_sec", "bf16_samples_per_sec",
                "scan_epoch_promoted_samples_per_sec",
                "b16_bf16_samples_per_sec",
                "b16_bf16_cached_stats_samples_per_sec",
                "b16_bf16_cached_stats_gelu_tanh_samples_per_sec",
                "collate_stats_sweep_sec", "eval_ms_per_pool",
                "sentence_split_full_scale_ok", "vs_baseline_1thread"]:
        assert key in row, key
    assert row["scale"] == "tiny"


def test_bench_fails_bounded_when_device_unreachable():
    """When device init cannot succeed, bench must fail FAST with an error
    JSON instead of hanging at attach (observed multi-hour relay outages —
    the guard probes init in a deadlined subprocess).  A nonexistent
    platform makes the probe fail deterministically regardless of the real
    tunnel's state."""
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="",
               JAX_PLATFORMS="nonexistent_backend")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--tiny",
         "--device-timeout", "60"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=240)
    assert p.returncode == 1, (p.returncode, p.stdout, p.stderr[-500:])
    row = json.loads(p.stdout.strip().splitlines()[-1])
    assert "error" in row and row["value"] == 0.0


def test_capacity_precheck_skips_doomed_rows():
    """VERDICT r4 #5: the big-batch rows that cannot fit beside the
    HBM-resident dataset must be SKIPPED by the capacity pre-check, not
    attempted and recorded as error strings.  At full scale (9.34 GB
    dataset): f32 B=512 and both B=1024 rows exceed the 13.5 GB budget;
    B=256 and the capacity-marginal bf16 B=512 still attempt (the shared
    chip makes that zone non-deterministic — a runtime denial classifies
    as 'oom_at_runtime')."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(REPO, "bench.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    resident = 9.34 + 0.3
    budget = 13.5

    def est(bx, db):
        return resident + m._estimate_step_hbm_gb(bx, 208, 360, 270, 320,
                                                  1024, db)

    assert est(256, 4) <= budget      # the measurement-critical rows...
    assert est(256, 2) <= budget      # ...must never be pre-skipped
    assert est(512, 2) <= budget      # marginal: attempt under the guard
    assert est(512, 4) > budget       # round-4 error rows: pre-skipped
    assert est(1024, 2) > budget
    assert est(1024, 4) > budget

    assert m._oom_skip_reason(
        RuntimeError("RESOURCE_EXHAUSTED: out of memory")) == "oom_at_runtime"
    assert m._oom_skip_reason(RuntimeError("Broken pipe")) is None
