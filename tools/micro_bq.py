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
    """Time every ball query the seg (S3DIS-shape) step issues with the
    PRODUCTION stage geometry — the stage clouds come from the same
    compute_geometry pass the model runs (grid subsampling included),
    not Morton-prefix approximations (whose density diverges from the
    real stages: the round-4 prefix version over-counted mid stages by
    up to 10x — ADVICE r4) — and with the same dispatch the model uses
    (ops.neighbors.ball_query). One invocation gives the per-stage
    attribution of the seg step's bq phase."""
    import bench
    from closerlook3d_tpu.models.backbone import compute_geometry
    from closerlook3d_tpu.ops.neighbors import ball_query
    from closerlook3d_tpu.utils.config import stage_plan

    cfg = bench._cell_cfg("seg", "pospool")
    plan = stage_plan(cfg)
    rng = np.random.default_rng(0)
    hb = bench._make_host_batch(cfg, rng)
    xyz, pmask = jnp.asarray(hb["xyz"]), jnp.asarray(hb["mask"])
    g = jax.jit(lambda x, m: compute_geometry(cfg, x, m))(xyz, pmask)
    b = xyz.shape[0]

    radii = plan["radii"]
    ks = plan["nsamples"]
    cells = [("s0 self", g["xyz_0"], g["xyz_0"], g["mask_0"], g["mask_0"],
              radii[0], ks[0])]
    nstage = len(ks)
    for i in range(1, nstage):
        # same tuples compute_geometry issues: strided uses the finer
        # stage's radius doubled and its slot count
        cells.append((f"s{i} strided", g[f"xyz_{i}"], g[f"xyz_{i-1}"],
                      g[f"mask_{i}"], g[f"mask_{i-1}"],
                      radii[i - 1] * 2.0, ks[i - 1]))
        cells.append((f"s{i} self", g[f"xyz_{i}"], g[f"xyz_{i}"],
                      g[f"mask_{i}"], g[f"mask_{i}"], radii[i], ks[i]))
    total = 0.0
    for name, q, s, qm, sm, radius, k in cells:
        f = jax.jit(lambda q, s, qm=qm, sm=sm, radius=radius, k=k:
                    ball_query(q, s, radius, k, query_mask=qm,
                               support_mask=sm))
        _, mask = f(q, s)
        ms = bench_ms(f, (q, s), iters=30)
        total += ms
        nq, ns = q.shape[1], s.shape[1]
        print(f"{name:<11} bq {nq:>6} x {ns:>6} r={radius:<4} k={k}: "
              f"{ms:7.3f} ms  (mean nbrs "
              f"{float(jnp.sum(mask)) / float(jnp.sum(qm)):.1f})",
              flush=True)
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
