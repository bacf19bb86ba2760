"""Microbenchmark the chunked ball query at seg bench shapes.

Usage: python tools/micro_bq.py [stage] [dense]
Also times a no-candidate radius (pure grid/flag overhead) and a
no-pruning run (flags all-on) to attribute cost.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.timing import bench_ms


def run_all():
    """Time every ball query the seg (S3DIS-shape) step issues — the
    9 (nq, ns, radius, K) tuples of the 5-stage plan — with the SAME
    dispatch the model uses (ops.neighbors.ball_query). One invocation
    gives the full per-stage attribution of the ~13 ms bq phase.

    Approximation (ADVICE r4): strided stages are modeled as
    Morton-sort prefixes (``full[:, :ns]``) — spatially localized
    corners at full density — rather than the FPS/grid-subsampled
    stages the model computes, so per-stage neighbor densities can
    diverge from production. Compare the printed ``mean nbrs`` against
    the production values before trusting a per-stage split; the TOTAL
    tracks the profile's bq phase because the (nq, ns, radius, K)
    tuples and dispatch are exact."""
    from closerlook3d_tpu.data.spatial_host import morton_sort_batch
    from closerlook3d_tpu.ops.neighbors import ball_query

    b = 4
    # (nq, ns, radius, k): stage-0 self, then per stage strided + self
    # (configs/s3dis stage_plan at 15360 points; see models/backbone.py)
    shapes = [
        (15360, 15360, 0.1, 26),
        (4096, 15360, 0.2, 26), (4096, 4096, 0.2, 31),
        (1152, 4096, 0.4, 31), (1152, 1152, 0.4, 38),
        (304, 1152, 0.8, 38), (304, 304, 0.8, 41),
        (88, 304, 1.6, 41), (88, 88, 1.6, 39),
    ]
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-2, 2, size=(b, 15360, 3)).astype(np.float32)
    sb = morton_sort_batch({"xyz": xyz, "mask": np.ones((b, 15360), bool)})
    full = jnp.asarray(sb["xyz"])
    total = 0.0
    for nq, ns, radius, k in shapes:
        s = full[:, :ns]
        q = s[:, :nq]
        f = jax.jit(lambda q, s, radius=radius, k=k:
                    ball_query(q, s, radius, k))
        _, mask = f(q, s)
        ms = bench_ms(f, (q, s), iters=30)
        total += ms
        print(f"bq {nq:>6} x {ns:>6} r={radius:<4} k={k}: {ms:7.3f} ms  "
              f"(mean nbrs {float(jnp.sum(mask)) / (b * nq):.1f})")
    print(f"total: {total:.3f} ms")


def main():
    from closerlook3d_tpu.data.spatial_host import morton_sort_batch
    from closerlook3d_tpu.ops.pallas.neighbors import (
        ball_query_pallas_chunked)

    if len(sys.argv) > 1 and sys.argv[1] == "all":
        return run_all()
    stage = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    b = 4
    if stage == 0:
        nq = ns = 15360
        k, radius = 26, 0.1
    else:
        nq, ns = 4096, 15360
        k, radius = 26, 0.2
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-2, 2, size=(b, ns, 3)).astype(np.float32)
    sb = morton_sort_batch({"xyz": xyz, "mask": np.ones((b, ns), bool)})
    sxyz = jnp.asarray(sb["xyz"])
    qxyz = sxyz[:, :nq] if nq < ns else sxyz

    f = jax.jit(lambda q, s: ball_query_pallas_chunked(q, s, radius, k))
    idx, mask = f(qxyz, sxyz)
    print("mean neighbors:", float(jnp.sum(mask)) / (b * nq))
    print(f"bq: {bench_ms(f, (qxyz, sxyz), iters=30):.3f} ms")

    f0 = jax.jit(lambda q, s: ball_query_pallas_chunked(q, s, 1e-4, k))
    print(f"bq tiny-radius (grid+flag overhead): {bench_ms(f0, (qxyz, sxyz), iters=30):.3f} ms")

    fbig = jax.jit(lambda q, s: ball_query_pallas_chunked(q, s, 0.4, k))
    idx, mask = fbig(qxyz, sxyz)
    print("0.4-radius mean neighbors:", float(jnp.sum(mask)) / (b * nq))
    print(f"bq r=0.4 (denser): {bench_ms(fbig, (qxyz, sxyz), iters=30):.3f} ms")


if __name__ == "__main__":
    main()
