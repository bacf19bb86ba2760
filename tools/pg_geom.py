"""Shared seg-stage geometry for the pseudo-grid micro tools.

One-command reproducibility from a clean checkout (VERDICT r4 weak #6):
tools/micro_pg_attrib.py and tools/sweep_pg_tile.py used to hard-read
/tmp/micro_pg_geom_0.npz and fail unless tools/micro_pg.py had run in
the same boot. This helper generates the geometry (same path the model
uses: bench seg config -> compute_geometry) and caches it in /tmp.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_stage_geom(stage: int = 0):
    """(qxyz, sxyz, idx, mask) jnp arrays for one seg-bench stage."""
    import jax
    import jax.numpy as jnp

    import bench
    from closerlook3d_tpu.models.backbone import compute_geometry

    cache = f"/tmp/micro_pg_geom_{stage}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        return (jnp.asarray(z["qxyz"]), jnp.asarray(z["sxyz"]),
                jnp.asarray(z["idx"]), jnp.asarray(z["mask"]))
    cfg = bench._cell_cfg("seg", "pseudo_grid")
    rng = np.random.default_rng(0)
    hb = bench._make_host_batch(cfg, rng)
    xyz, pmask = jnp.asarray(hb["xyz"]), jnp.asarray(hb["mask"])
    g = jax.jit(lambda x, m: compute_geometry(cfg, x, m))(xyz, pmask)
    if stage == 0:
        qxyz = sxyz = g["xyz_0"]
        idx, mask = g["idx_0"], g["nmask_0"]
    else:
        qxyz, sxyz = g[f"xyz_{stage}"], g[f"xyz_{stage - 1}"]
        idx, mask = g[f"sidx_{stage}"], g[f"smask_{stage}"]
    np.savez(cache, qxyz=np.asarray(qxyz), sxyz=np.asarray(sxyz),
             idx=np.asarray(idx), mask=np.asarray(mask))
    return qxyz, sxyz, idx, mask
