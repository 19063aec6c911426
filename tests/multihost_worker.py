"""Worker for tests/test_multihost.py: one process of an N-process
data-parallel training job over gloo CPU collectives, with an optional
number of (virtual) devices per process.

Exercises the REAL multi-host code path (SURVEY §2.11/§5.8):
``maybe_distributed_init`` → global mesh over every process's devices →
batch sharded across processes AND their local devices → jitted train step
with the explicit sharded CLIP loss (all-gather + psum across processes
over gloo "DCN", across local devices in-process "ICI") → identical
replicated result everywhere.

Run as: python multihost_worker.py <process_id> <num_processes> <port>
        [devices_per_process]

``num_processes == 1`` skips distributed init — the single-controller
reference run the pod result must match.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    dpp = int(sys.argv[4]) if len(sys.argv) > 4 else 1  # devices per process

    from meg_decoding_tpu.core.config import Config
    from meg_decoding_tpu.parallel.dp import maybe_distributed_init

    if nproc > 1:
        cfg = Config({"distributed": {
            "coordinator_address": f"127.0.0.1:{port}",
            "num_processes": nproc,
            "process_id": pid,
        }})
        maybe_distributed_init(cfg)

    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == nproc
    assert jax.local_device_count() == dpp  # XLA_FLAGS set by the parent
    n_dev = nproc * dpp
    assert jax.device_count() == n_dev

    from meg_decoding_tpu.core.mesh import make_mesh, replicated
    from meg_decoding_tpu.data.layout import (
        normalize_locations,
        synthetic_cap_locations,
    )
    from meg_decoding_tpu.models.brain_encoder import BrainEncoder
    from meg_decoding_tpu.train.state import create_train_state
    from meg_decoding_tpu.train.steps import (
        CollateConfig,
        LossConfig,
        make_train_step,
    )

    mesh = make_mesh(n_data=n_dev)
    B, C, T, F = 2 * n_dev, 8, 24, 16
    model = BrainEncoder(loc=normalize_locations(synthetic_cap_locations(C)),
                         num_subjects=2, D1=8, D2=12, F=F, K=4)
    rng = np.random.RandomState(0)  # same data on every process
    X = rng.randn(B, C, T).astype(np.float32)
    Y = rng.randn(B, F).astype(np.float32)
    subs = rng.randint(0, 2, B)

    opt = optax.adam(1e-3)
    b_proc = B // nproc
    state = create_train_state(
        model, opt, (jnp.asarray(X[:b_proc]), jnp.asarray(Y[:b_proc]),
                     jnp.asarray(subs[:b_proc])), jax.random.PRNGKey(0))
    state = jax.device_put(state, replicated(mesh))

    def shard(arr):
        sharding = NamedSharding(mesh, P("data", *([None] * (arr.ndim - 1))))
        local = arr[pid * b_proc:(pid + 1) * b_proc]
        return jax.make_array_from_process_local_data(sharding, local)

    step = make_train_step(model, opt, LossConfig(kind="clip"),
                           CollateConfig(baseline_len_samp=4, clamp_lim=20.0),
                           donate=False, mesh=mesh)
    state, metrics = step(state, shard(X), shard(Y), shard(subs))
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    assert int(state.step) == 1
    # the replicated loss must be bitwise identical on every process — print
    # it for the parent to compare
    print(f"MULTIHOST_RESULT pid={pid} loss={loss:.9f}", flush=True)


if __name__ == "__main__":
    main()
