"""Host-side cross-process reductions for evaluation metrics.

Training is multi-host-correct by GSPMD (jit inserts the gradient
all-reduce); evaluation meters/confusions are accumulated in host numpy,
so with ``process_count > 1`` each process sees only its shard — the
reference's DDP eval scripts hit the same issue and ``dist.all_reduce``
their meters (SURVEY.md §5 "Distributed communication backend"). These
helpers are that all_reduce: numpy in, numpy out, no-op single-process.

Every function is a COLLECTIVE: with process_count > 1 all processes
must call it the same number of times with equal-rank values.
"""

from __future__ import annotations

import jax
import numpy as np


def _allgather(x: np.ndarray) -> np.ndarray:
    """[P, ...] stack of x across processes (collective)."""
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(np.asarray(x)))


def all_processes_sum(tree):
    """Element-wise sum of a numpy pytree across processes.

    Scalars stay scalars; arrays keep their shape (must match across
    processes). Single-process: identity.
    """
    if jax.process_count() == 1:
        return tree

    def _sum(x):
        arr = np.asarray(x)
        out = _allgather(arr).sum(axis=0)
        return out.item() if arr.ndim == 0 else out

    return jax.tree_util.tree_map(_sum, tree)


def all_processes_min(x: float) -> float:
    """Global minimum of a per-process scalar (collective; identity
    single-process). Used for lockstep loop bounds — e.g. the S3DIS
    voting loop must run the same number of rounds on every process
    because each round calls a collective forward."""
    if jax.process_count() == 1:
        return x
    return float(_allgather(np.asarray(x, np.float64)).min())


def process_local_rows(x) -> np.ndarray:
    """The process-LOCAL leading-axis rows of a batch-sharded jax.Array.

    With process_count > 1 a batch-sharded global array spans
    non-addressable devices, so ``jax.device_get(x)`` raises; each
    process may only read the rows that live on its own devices — which
    are exactly the rows it contributed via
    make_array_from_process_local_data (parallel/mesh.py::shard_batch
    keeps process p's samples on process p's devices), so they line up
    1:1 with the host-side local batch. Shards are ordered by their
    global row offset; replicated/single-process arrays come back whole
    (identical to device_get).
    """
    shards = sorted(x.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    rows = []
    seen = set()
    for s in shards:  # drop replicas: one copy per distinct row range
        # only the batch axis may be sharded; trailing axes must be whole
        assert all(sl.start in (None, 0) and sl.stop in (None, n)
                   for sl, n in zip(s.index[1:], x.shape[1:])), s.index
        k = (s.index[0].start or 0, s.index[0].stop)
        if k in seen:
            continue
        seen.add(k)
        rows.append(np.asarray(s.data))
    return np.concatenate(rows, axis=0)


def all_processes_concat(x: np.ndarray) -> np.ndarray:
    """Concatenate per-process [n_p, ...] arrays along axis 0.

    n_p may differ per process (ragged): lengths are allgathered first,
    shards are padded to the max, gathered, and unpadded in process
    order. Single-process: identity.
    """
    x = np.asarray(x)
    if jax.process_count() == 1:
        return x
    lens = _allgather(np.asarray([x.shape[0]], np.int32))[:, 0]
    m = int(lens.max())
    pad = np.zeros((m - x.shape[0],) + x.shape[1:], x.dtype)
    gathered = _allgather(np.concatenate([x, pad], axis=0))
    return np.concatenate(
        [gathered[p, :int(lens[p])] for p in range(len(lens))], axis=0)
