"""Data-parallel execution setup for the trainers.

The reference trains on exactly one CUDA device (``constants.py:4``); here
multi-chip is first-class (SURVEY §2.11/§5.8): a 1-D ``data`` mesh, params
replicated, batch sharded along its leading axis, XLA inserting the psum
gradient reduction over ICI inside the jitted train step.  Multi-host uses
the same code path after ``jax.distributed.initialize`` (``distributed:``
config block).
"""

from __future__ import annotations

import jax

from meg_decoding_tpu.core.mesh import make_mesh, replicated, shard_batch

__all__ = ["maybe_distributed_init", "setup_data_parallel"]


def maybe_distributed_init(cfg) -> None:
    """Multi-host bootstrap: call ``jax.distributed.initialize`` when the
    config carries a ``distributed:`` block (coordinator_address,
    num_processes, process_id).

    On TPU pods the collectives ride ICI/DCN natively; on CPU backends
    (tests, tests/test_multihost.py) cross-process collectives need the gloo
    implementation, selected before initialize."""
    dist = cfg.get("distributed") if hasattr(cfg, "get") else None
    if not dist:
        return
    import os

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_cpu_collectives_implementation",
                          str(dist.get("cpu_collectives", "gloo")))
    jax.distributed.initialize(
        coordinator_address=dist["coordinator_address"],
        num_processes=int(dist["num_processes"]),
        process_id=int(dist["process_id"]),
    )


def setup_data_parallel(cfg):
    """Returns (mesh | None, shard_fn | None, replicate_fn).

    Engages when >1 device is visible and ``cfg.data_parallel`` isn't False.
    ``shard_fn`` device-puts a batch tuple with its leading axis sharded;
    ``replicate_fn`` replicates the train state across the mesh.
    """
    n = len(jax.devices())
    enabled = bool(cfg.get("data_parallel", True)) if hasattr(cfg, "get") else True
    if n <= 1 or not enabled:
        return None, None, lambda state: state

    mesh = make_mesh(n_data=n)

    def shard_fn(batch):
        return shard_batch(mesh, batch)

    def replicate_fn(state):
        return jax.device_put(state, replicated(mesh))

    return mesh, shard_fn, replicate_fn
