"""Device-mesh and sharding helpers.

The reference trains on exactly one CUDA device (``constants.py:4`` in the
reference repo) with no collectives of any kind.  Here multi-device execution
is first-class: a 1-D ``data`` mesh for batch sharding (extensible with a
``model`` axis for tensor parallelism later), params replicated, batch
sharded, gradients reduced by XLA ``psum`` over ICI.  Multi-host runs reuse
the same code path after ``jax.distributed.initialize``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch", "local_batch_size"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a ('data', 'model') mesh. Default: all devices on the data axis."""
    devs = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devs) // n_model
    if n_data * n_model > len(devs):
        raise ValueError(f"mesh {n_data}x{n_model} needs more than {len(devs)} devices")
    grid = np.array(devs[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading (batch) axis over the data axis; rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put every leaf of a batch pytree with its batch axis sharded."""

    def _put(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x)))

    return jax.tree_util.tree_map(_put, batch)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by data axis {n}")
    return global_batch // n
