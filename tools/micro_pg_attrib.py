"""Attribute the fused pseudo-grid kernel's time at seg stage-0 shapes.

Sweeps kpn (kernel points) and k (neighbor slots) independently to find
which loop dominates: the chunk gather matmuls (scale with occupancy),
the slot-space combine (scales with kpn * occupancy), or the output
write (scales with kpn). Usage: python tools/micro_pg_attrib.py
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
    occ = float(jnp.sum(mask)) / (b * nq)
    print(f"b={b} nq={nq} ns={ns} c={c} k={k} mean_occ={occ:.2f}")

    for kpn in (3, 7, 15):
        kp = jnp.asarray(kernel_point_layout(kpn), jnp.float32)
        fn = jax.jit(lambda f, kp=kp: pseudo_grid_fused(
            qxyz, sxyz, f, idx, mask, kp, radius, extent, "linear"))
        ms = bench_ms(fn, (feats,))
        print(f"kpn={kpn:3d}: fwd {ms:7.3f} ms")

    # k sweep: truncate neighbor slots (keeps occupancy pattern)
    kp = jnp.asarray(kernel_point_layout(15), jnp.float32)
    for kk in (4, 8, 16, 26):
        fn = jax.jit(lambda f, kk=kk: pseudo_grid_fused(
            qxyz, sxyz, f, idx[:, :, :kk], mask[:, :, :kk], kp,
            radius, extent, "linear"))
        ms = bench_ms(fn, (feats,))
        print(f"k={kk:3d}  : fwd {ms:7.3f} ms")


if __name__ == "__main__":
    main()
