"""Microbenchmark pwmlp_minmax_stats (fwd + bwd) at production shapes.

Usage: python tools/micro_pwstats.py [stage]
Stage shapes mirror the seg bench (B=4): stage 0 = 15360 pts / C=72,
stage 1 = 4096 / 144.  Prints fwd and fwd+bwd wall ms (fetch-synced).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.timing import bench_ms as bench


def main():
    from closerlook3d_tpu.ops.pallas.gather_reduce import pwmlp_minmax_stats

    stage = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    dense = len(sys.argv) > 2 and sys.argv[2] == "dense"
    b = 4
    if stage == 0:
        nq = ns = 15360
        c, k = 72, 26
        radius = 0.1
    else:
        nq = ns = 4096
        c, k = 144, 31
        radius = 0.2
    rng = np.random.default_rng(0)
    # bench geometry: uniform [-2,2]^3 (sparse, ~1-2 in radius);
    # "dense" squeezes the box to surface-like occupancy (~2/3 of K)
    side = 2.0 if not dense else (2.0 * (ns * 4.19 * radius**3
                                         / (0.66 * k) / 64) ** (1 / 3))
    xyz = rng.uniform(-side, side, size=(b, ns, 3)).astype(np.float32)
    # morton sort for realistic chunk locality
    from closerlook3d_tpu.data.spatial_host import morton_sort_batch
    sb = morton_sort_batch({"xyz": xyz, "mask": np.ones((b, ns), bool)})
    xyz = jnp.asarray(sb["xyz"])
    from closerlook3d_tpu.ops.pallas.neighbors import ball_query_pallas_chunked
    idx, mask = ball_query_pallas_chunked(xyz, xyz, radius, k)
    idx, mask = jax.block_until_ready((idx, mask))
    print("mean neighbors:", float(jnp.sum(mask)) / (b * nq))

    g = jnp.asarray(rng.normal(size=(b, ns, c)), jnp.bfloat16)
    gsq = (g.astype(jnp.float32) ** 2).astype(jnp.bfloat16)

    fwd = jax.jit(pwmlp_minmax_stats)
    ms = bench(fwd, (g, gsq, idx, mask))
    print(f"fwd: {ms:.3f} ms")

    def loss(g, gsq):
        outs = pwmlp_minmax_stats(g, gsq, idx, mask)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    gr = jax.jit(jax.grad(loss, argnums=(0, 1)))
    ms = bench(gr, (g, gsq))
    print(f"fwd+bwd: {ms:.3f} ms")


if __name__ == "__main__":
    main()
