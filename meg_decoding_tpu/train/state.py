"""Training state: params (encoder + loss temperature), batch stats,
optimizer state, step counter, PRNG key — one pytree, orbax-checkpointable.

The reference saves only ``model.state_dict()`` (``train.py:274``) — no
optimizer/step state, so no true resume (SURVEY §5.4).  Here the full state
checkpoints and resumes exactly.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

__all__ = ["TrainState", "create_train_state"]


@flax.struct.dataclass
class TrainState:
    params: Any            # {'model': ..., 'loss': {'temp': ...}}
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    key: jax.Array


def create_train_state(model, optimizer, example_batch, init_key,
                       init_temperature: float = 5.1) -> TrainState:
    """Initialize params/batch_stats from an example batch and wrap with the
    optimizer state.  The loss temperature is a trained parameter optimized
    jointly with the encoder (reference ``train.py:158-162``)."""
    X, _, subject_idxs = example_batch[:3]
    params_key, spatial_key, state_key = jax.random.split(init_key, 3)
    variables = model.init(
        {"params": params_key, "spatial": spatial_key, "dropout": spatial_key},
        X, subject_idxs,
    )
    params = {
        "model": variables["params"],
        "loss": {"temp": jnp.asarray(float(init_temperature))},
    }
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
        key=state_key,
    )
