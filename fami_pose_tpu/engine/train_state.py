"""Train state: params + BN stats + optimizer state + step, as one pytree.

The TPU analog of the reference's ``{begin_epoch, state_dict, optimizer}``
checkpoint payload (``engine/defaults/checkpoints.py:45-67``): everything the
training loop mutates lives in this immutable struct, threaded through the
jitted train step and donated for in-place buffer reuse.
"""

from typing import Any

import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
            opt_state=new_opt_state,
        )


def create_train_state(model, tx, rng, example_inputs, train: bool = False):
    """Initialize model variables and optimizer state."""
    variables = model.init(rng, *example_inputs, train=train)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
