"""Device mesh + sharding helpers (the NCCL/DDP replacement).

The reference scales with torch DDP over NCCL: one process per GPU,
dataset sharded by DistributedSampler, gradient all-reduce in backward
(SURVEY.md §2.5). The TPU-native equivalent is GSPMD: a
``jax.sharding.Mesh`` with a ``data`` axis (and an optional ``model``
axis for wide layers), the global batch sharded over ``data``, and jit
inserting the gradient all-reduce over ICI automatically. BatchNorm
reductions become global (sync-BN) for free.

Multi-host: ``maybe_initialize_distributed()`` (called by the CLIs)
runs ``jax.distributed.initialize`` when cluster envs are present; the
mesh is then built over ``jax.devices()`` (all processes), each process
feeds its own per-host batch shard, and ``shard_batch`` assembles the
global array via ``jax.make_array_from_process_local_data`` — the
DistributedSampler + DDP equivalent (SURVEY.md §2.5). BatchIterator
takes (process_index, process_count) to shard the sample order.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# any of these present => we are one process of a multi-process job
_CLUSTER_ENVS = (
    "JAX_COORDINATOR_ADDRESS",     # explicit jax.distributed env config
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",  # multi-slice TPU launcher
)


def maybe_initialize_distributed() -> bool:
    """Multi-host init (the torch.distributed.launch analogue).

    Call BEFORE any backend use. No-op (returns False) on single-host
    runs — when none of the cluster envs are set. With them set,
    ``jax.distributed.initialize()`` picks coordinator/process-id/count
    from the environment (or the TPU pod metadata) exactly like the
    reference's ``dist.init_process_group('nccl')`` picks them from the
    launcher (SURVEY.md §3.1).
    """
    if not any(os.environ.get(e) for e in _CLUSTER_ENVS):
        return False
    jax.distributed.initialize()
    return True


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
    """Device-put a host batch with the leading dim sharded over 'data'.

    Single-process: a plain sharded device_put. Multi-process: each
    process passes its LOCAL batch (1/process_count of the global batch,
    produced by its sharded BatchIterator) and the global array is
    assembled across hosts — per-process global-batch construction never
    materializes on any one host.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
