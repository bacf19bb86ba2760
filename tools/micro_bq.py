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


def main():
    from closerlook3d_tpu.data.spatial_host import morton_sort_batch
    from closerlook3d_tpu.ops.pallas.neighbors import (
        ball_query_pallas_chunked)

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
