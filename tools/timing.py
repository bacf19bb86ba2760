"""Shared fetch-synchronized timing helper for the micro tools.

jax.block_until_ready can return before remote execution finishes on
this execution stack; block once after the loop and rely on dispatch
pipelining, exactly like bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_ms(fn, args=(), iters: int = 20) -> float:
    """Mean wall ms per call of fn(*args) over `iters` pipelined calls."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3
