"""Tracing / profiling harness (SURVEY.md §5 "Tracing / profiling").

The reference has nothing beyond per-iteration AverageMeters; on TPU the
right tools are XPlane traces (TensorBoard profile plugin) and compiled
cost analysis. Three entry points:

* ``trace(logdir)`` — context manager around jax.profiler start/stop;
  view with ``tensorboard --logdir`` (profile plugin) or xprof.
* ``timeit(fn, *args)`` — fetch-synchronized steady-state timing. On
  remote-execution stacks ``block_until_ready`` can return before the
  device finishes; only a host fetch truly synchronizes, so we fetch one
  leaf each sync point (same convention as bench.py).
* ``cost_analysis(fn, *args)`` — XLA's FLOPs / bytes-accessed estimate
  for a jitted callable, for roofline sanity checks.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XPlane trace of the enclosed block into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _fetch_sync(tree) -> None:
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(jax.device_get(leaves[0])).ravel()[:1]


def timeit(fn: Callable, *args, iters: int = 10, warmup: int = 2,
           **kwargs) -> Dict[str, float]:
    """Steady-state wall time of ``fn(*args)`` with host-fetch syncing.

    Returns {"mean_ms", "best_ms", "iters"}. The function is called with
    identical arguments; for stacks that replay content-identical
    programs, perturb inputs between calls yourself.
    """
    for _ in range(warmup):
        _fetch_sync(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _fetch_sync(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return {"mean_ms": float(np.mean(times) * 1e3),
            "best_ms": float(np.min(times) * 1e3),
            "iters": iters}


def cost_analysis(fn: Callable, *args, **kwargs) -> Dict[str, Any]:
    """XLA cost analysis (flops, bytes accessed) of jit(fn) at args."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns a per-device list
        costs = costs[0] if costs else {}
    return dict(costs or {})
