"""Train state: params + batch_stats + optimizer state as one pytree."""

from __future__ import annotations

from typing import Any

import jax
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def create_train_state(cfg, model, optimizer, rng, sample_batch,
                       mesh=None) -> TrainState:
    """Initialize variables + optimizer state, jitted, on the mesh.

    The whole creation is one jitted program: eager per-op dispatch is
    pathologically slow on this stack (remote-compiled TPU backend), and
    ``out_shardings`` pins the state to the training mesh's devices
    (which may differ from jax's default backend — e.g. a virtual CPU
    mesh while the default is a single TPU).
    """

    def init_fn(r, xyz, mask, features):
        variables = model.init(r, xyz, mask, features, train=False)
        return TrainState.create(
            apply_fn=model.apply,
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            tx=optimizer,
        )

    if mesh is not None:
        from closerlook3d_tpu.parallel.mesh import replicated_sharding
        init_fn = jax.jit(init_fn,
                          out_shardings=replicated_sharding(mesh))
    else:
        init_fn = jax.jit(init_fn)
    return init_fn(rng, sample_batch["xyz"], sample_batch["mask"],
                   sample_batch["features"])


def param_count(state: TrainState) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(state.params))


def param_bytes(state: TrainState) -> int:
    return sum(p.size * p.dtype.itemsize
               for p in jax.tree_util.tree_leaves(state.params))
