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
