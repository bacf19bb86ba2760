"""Microbenchmark the fused pseudo-grid kernel at seg bench shapes.

Usage: python tools/micro_pg.py [stage]
Times fwd and fwd+bwd, plus influence-mode variants (constant drops the
sqrt; gaussian swaps it for exp) to attribute the VPU influence cost.
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
    import bench
    from closerlook3d_tpu.models.aggregation import (
        kernel_point_layout, _typical_spacing)
    from closerlook3d_tpu.models.backbone import compute_geometry
    from closerlook3d_tpu.ops.pallas.pseudo_grid import pseudo_grid_fused
    from closerlook3d_tpu.utils.config import stage_plan

    stage = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    cfg = bench._cell_cfg("seg", "pseudo_grid")
    plan = stage_plan(cfg)
    width = cfg.width
    from tools.pg_geom import load_stage_geom
    qxyz, sxyz, idx, mask = load_stage_geom(stage)
    if stage == 0:
        c, radius = width // 2, plan["radii"][0]
    else:
        c = width * (2 ** (stage - 1))
        radius = plan["radii"][stage - 1] * 2.0
    b, nq, k = idx.shape
    ns = sxyz.shape[1]
    rng = np.random.default_rng(1)
    kpn = int(cfg.pseudo_grid.num_kernel_points)
    print(f"b={b} nq={nq} ns={ns} c={c} k={k} kpn={kpn} radius={radius}")
    print("mean neighbors:", float(jnp.sum(mask)) / (b * nq))
    feats = jnp.asarray(
        rng.normal(size=(b, ns, c)).astype(np.float32)).astype(jnp.bfloat16)
    kp_np = kernel_point_layout(kpn, cfg.pseudo_grid.fixed_kernel_points)
    kp = jnp.asarray(kp_np, jnp.float32)
    extent = float(cfg.pseudo_grid.KP_extent * _typical_spacing(kp_np))

    for mode in ("linear", "constant", "gaussian"):
        f = jax.jit(lambda q, s, ft, i, m, mode=mode: pseudo_grid_fused(
            q, s, ft, i, m, kp, radius, extent, mode))
        fwd = bench_ms(f, (qxyz, sxyz, feats, idx, mask), iters=20)

        def loss(ft, mode=mode):
            return jnp.sum(pseudo_grid_fused(
                qxyz, sxyz, ft, idx, mask, kp, radius, extent,
                mode).astype(jnp.float32))

        g = jax.jit(jax.grad(loss))
        bwd = bench_ms(g, (feats,), iters=20)
        print(f"{mode:9s}: fwd {fwd:7.3f} ms   fwd+bwd {bwd:7.3f} ms")


if __name__ == "__main__":
    main()
