"""Device mesh + sharding helpers (the NCCL/DDP replacement).

The reference scales with torch DDP over NCCL: one process per GPU,
dataset sharded by DistributedSampler, gradient all-reduce in backward
(SURVEY.md §2.5). The TPU-native equivalent is GSPMD: a
``jax.sharding.Mesh`` with a ``data`` axis (and an optional ``model``
axis for wide layers), the global batch sharded over ``data``, and jit
inserting the gradient all-reduce over ICI automatically. BatchNorm
reductions become global (sync-BN) for free.

Multi-host: build the mesh over ``jax.devices()`` (all processes) and
feed per-host shards via ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data_parallel: int = -1, model_parallel: int = 1,
              devices=None) -> Mesh:
    """2-D ('data', 'model') mesh; data_parallel=-1 uses all devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data_parallel == -1:
        data_parallel = n // model_parallel
    assert data_parallel * model_parallel == n, (
        f"{data_parallel} x {model_parallel} != {n} devices")
    arr = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over 'data', everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a host batch with the leading dim sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
