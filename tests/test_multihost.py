"""Multi-host (multi-process) data-parallel training over gloo CPU
collectives: REAL processes under one global mesh — 2×1 (pure multi-host)
and 2×4 devices (the pod topology: gloo "DCN" between processes, in-process
mesh "ICI" within), checked against a single-controller 8-device run.

Upgrades SURVEY §2.11's multi-host row from "code only" to exercised: the
``distributed:`` config block drives ``jax.distributed.initialize`` in each
process, the batch is process-sharded, the sharded CLIP loss all-gathers and
psums ACROSS processes, and both controllers end with the identical
replicated loss — the same single-controller-per-host pattern a TPU pod
uses over DCN.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(nproc: int, dpp: int):
    """Spawn ``nproc`` workers with ``dpp`` virtual CPU devices each; return
    each controller's replicated loss."""
    port = _free_port()
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO,
               XLA_FLAGS=f"--xla_force_host_platform_device_count={dpp}")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nproc), str(port), str(dpp)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)
    losses = []
    for out in outs:
        m = re.search(r"MULTIHOST_RESULT pid=(\d) loss=([-\d.]+)", out)
        assert m, out
        losses.append(float(m.group(2)))
    return losses


@pytest.mark.slow
def test_two_process_train_step_identical_loss():
    losses = _run_workers(nproc=2, dpp=1)
    # replicated result: bitwise identical across both controllers
    assert losses[0] == losses[1]


@pytest.mark.slow
def test_two_process_four_device_pod_topology():
    """The actual pod topology (VERDICT r3 weak #5): 2 processes × 4 devices
    — collectives cross BOTH the gloo process boundary ("DCN") and the
    in-process device mesh ("ICI") in one sharded fused step.  The loss must
    be identical across controllers AND match a single-controller run of the
    same 8-device global batch (process count must not change the math)."""
    pod = _run_workers(nproc=2, dpp=4)
    assert pod[0] == pod[1]
    single = _run_workers(nproc=1, dpp=8)
    assert len(single) == 1
    # gloo cross-process reduction order may differ from the in-process one:
    # equality to float-reduction tolerance, not bitwise
    assert abs(pod[0] - single[0]) <= 1e-6 * max(1.0, abs(single[0]))
