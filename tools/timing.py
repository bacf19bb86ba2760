"""Shared fetch-synchronized timing helper for the micro tools.

Two execution-stack hazards (same ones bench.py documents):
  * jax.block_until_ready can return before remote execution finishes —
    only a HOST FETCH truly synchronizes;
  * the stack replays recorded results for content-identical programs,
    so timing the SAME arguments `iters` times measures a cache, not
    the hardware (round-5 finding: micro_bq/bq A/B numbers swung 100x
    on repeat calls).
bench_ms therefore perturbs the first floating-point argument by a
distinct epsilon per iteration (distinct content, one compile) and
fetches a scalar from the last output to synchronize.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _variants(args, iters):
    """`iters` argument tuples with distinct content, same shapes."""
    import jax.numpy as jnp

    out = []
    for i in range(iters):
        new = list(args)
        for j, a in enumerate(new):
            if hasattr(a, "dtype") and jnp.issubdtype(
                    a.dtype, jnp.floating):
                new[j] = a + jnp.asarray(1e-6 * (i + 1), a.dtype)
                break
        out.append(tuple(new))
    return out


def _fetch(out):
    """Host-fetch one scalar from the first array leaf (true sync)."""
    import jax
    import numpy as np

    leaves = jax.tree_util.tree_leaves(out)
    for leaf in leaves:
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))
            return
    jax.block_until_ready(out)


def bench_ms(fn, args=(), iters: int = 20) -> float:
    """Mean wall ms per call over `iters` pipelined distinct-content
    calls (see module doc for why distinct + fetch-synced)."""
    variants = _variants(args, iters)
    out = fn(*variants[0])
    _fetch(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*variants[i])
    _fetch(out)
    return (time.perf_counter() - t0) / iters * 1e3
