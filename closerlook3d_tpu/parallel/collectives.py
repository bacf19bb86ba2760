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
