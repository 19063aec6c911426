"""Multi-host (multi-process) data-parallel training over gloo CPU
collectives: two REAL processes, one device each, one global mesh.

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


@pytest.mark.slow
def test_two_process_train_step_identical_loss():
    port = _free_port()
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO)
    # each process gets ONE cpu device (no virtual-device flag)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(2)
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
    # replicated result: bitwise identical across both controllers
    assert losses[0] == losses[1]
