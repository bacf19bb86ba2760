"""One-compile-per-setting tile/chunk sweep of the pseudo-grid kernel.

Usage: CL3D_AGG_TILE=… CL3D_NS_CHUNK=… python tools/sweep_pg_tile.py
(reads the env itself so each setting is a fresh process — the
constants are bound at import time).
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
    from closerlook3d_tpu.models.aggregation import kernel_point_layout
    from closerlook3d_tpu.ops.pallas.pseudo_grid import pseudo_grid_fused

    from tools.pg_geom import load_stage_geom
    qxyz, sxyz, idx, mask = load_stage_geom(0)
    b, nq, k = idx.shape
    ns = sxyz.shape[1]
    c, radius, extent = 72, 0.1, 0.12
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((b, ns, c)), jnp.bfloat16)
    kp = jnp.asarray(kernel_point_layout(15), jnp.float32)

    fwd = jax.jit(lambda f: pseudo_grid_fused(
        qxyz, sxyz, f, idx, mask, kp, radius, extent, "linear"))
    ms_f = bench_ms(fwd, (feats,))

    def loss(f):
        return jnp.sum(pseudo_grid_fused(
            qxyz, sxyz, f, idx, mask, kp, radius, extent,
            "linear").astype(jnp.float32))
    fb = jax.jit(jax.grad(loss))
    ms_fb = bench_ms(fb, (feats,))
    print(f"tile={os.environ.get('CL3D_AGG_TILE', '128')} "
          f"cs={os.environ.get('CL3D_NS_CHUNK', '128')}: "
          f"fwd {ms_f:7.3f} ms   grad {ms_fb:7.3f} ms")


if __name__ == "__main__":
    main()
