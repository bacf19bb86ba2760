"""Point downsampling: furthest point sampling and masked grid subsampling.

Parity targets (SURVEY.md §2.3):
  N1 furthest_point_sample — the reference's PointNet++-lineage FPS CUDA
     kernel: greedy max-min-distance selection, seeded at the first point.
  N5 grid_subsample — the reference's masked grid subsampling: voxel-grid
     barycenters (KPConv lineage), fixed output size + mask on TPU.

TPU design notes:
  * FPS is inherently sequential in npoint; the jnp version is a
    ``lax.fori_loop`` carrying the running min-distance vector (one VPU
    pass over N per step). Fine for shape tasks (N<=4096).
  * grid_subsample is sort + segment-mean over int32 voxel keys — fixed
    output shape ``[B, max_out]`` with a validity mask, fully jittable.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("npoint",))
def furthest_point_sample(
    xyz: jax.Array,
    npoint: int,
    mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Greedy furthest point sampling.

    Args:
      xyz:    [B, N, 3] float.
      npoint: number of points to select (static).
      mask:   [B, N] bool; invalid points are never selected unless a
        cloud has fewer than npoint valid points (then the earliest valid
        selections repeat and sample_mask marks the excess slots False).

    Returns:
      idx [B, npoint] int32, sample_mask [B, npoint] bool.
    """
    from closerlook3d_tpu.ops.dispatch import prefer_pallas
    if prefer_pallas():
        from closerlook3d_tpu.ops.pallas.sampling import (
            furthest_point_sample_pallas)
        return furthest_point_sample_pallas(xyz, npoint, mask)

    b, n, _ = xyz.shape
    x = xyz.astype(jnp.float32)
    if mask is None:
        valid = jnp.ones((b, n), dtype=bool)
    else:
        valid = mask
    # invalid points carry mindist -1 forever => never argmax'd while any
    # unvisited valid point (mindist > 0) remains.
    mindist = jnp.where(valid, jnp.float32(1e10), jnp.float32(-1.0))
    first = jnp.argmax(valid, axis=1).astype(jnp.int32)  # first valid point

    def body(i, carry):
        mindist, cur, out = carry
        out = out.at[:, i].set(cur)
        sel = jnp.take_along_axis(x, cur[:, None, None], axis=1)  # [B,1,3]
        d = jnp.sum((x - sel) ** 2, axis=-1)  # [B, N]
        mindist = jnp.minimum(mindist, d)
        cur = jnp.argmax(mindist, axis=1).astype(jnp.int32)
        return mindist, cur, out

    out = jnp.zeros((b, npoint), dtype=jnp.int32)
    _, _, out = jax.lax.fori_loop(0, npoint, body, (mindist, first, out))

    nvalid = jnp.sum(valid, axis=1)  # [B]
    slot = jnp.arange(npoint, dtype=jnp.int32)[None, :]
    sample_mask = slot < nvalid[:, None]
    return out, sample_mask


@functools.partial(jax.jit, static_argnames=("cell_size", "max_out"))
def grid_subsample(
    xyz: jax.Array,
    cell_size: float,
    max_out: int,
    mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Voxel-grid barycenter subsampling with fixed output size.

    Each occupied voxel of side ``cell_size`` contributes the barycenter
    of its points. Voxels are emitted in voxel-key order; clouds with more
    than ``max_out`` occupied voxels drop the highest-keyed voxels (rare
    when max_out is sized from the dataset), clouds with fewer pad with
    mask=False.

    Args:
      xyz:  [B, N, 3].
      cell_size: voxel edge length (static).
      max_out:   output point budget M (static).
      mask: [B, N] bool.

    Returns:
      sub_xyz [B, M, 3] float32, sub_mask [B, M] bool.
    """
    b, n, _ = xyz.shape
    x = xyz.astype(jnp.float32)
    if mask is None:
        valid = jnp.ones((b, n), dtype=bool)
    else:
        valid = mask

    big = jnp.float32(1e10)
    mins = jnp.min(jnp.where(valid[..., None], x, big), axis=1, keepdims=True)
    cells = jnp.floor((x - mins) / jnp.float32(cell_size)).astype(jnp.int32)
    # 1024 cells per axis keeps the composite key within int32 (2^30).
    cells = jnp.clip(cells, 0, 1023)
    # Morton-interleaved voxel ids: the same unique key per voxel as a
    # raster id, but emitting barycenters in Z-order keeps downsampled
    # stages spatially sorted for the chunk-skipping kernels (ops/spatial).
    from closerlook3d_tpu.ops.spatial import morton_code
    key = morton_code(cells)
    sentinel = jnp.int32(2**30)
    key = jnp.where(valid, key, sentinel)  # invalid points sort last

    order = jnp.argsort(key, axis=1)
    ksort = jnp.take_along_axis(key, order, axis=1)
    xsort = jnp.take_along_axis(x, order[..., None], axis=1)
    vsort = ksort < sentinel

    newflag = jnp.concatenate(
        [
            jnp.ones((b, 1), dtype=jnp.int32),
            (ksort[:, 1:] != ksort[:, :-1]).astype(jnp.int32),
        ],
        axis=1,
    )
    seg = jnp.cumsum(newflag, axis=1) - 1  # [B, N] voxel rank per point
    seg = jnp.where(vsort, seg, max_out)  # invalid -> overflow bucket
    seg = jnp.minimum(seg, max_out)  # voxels beyond budget -> overflow

    w = vsort.astype(jnp.float32)
    # segment-sum into M+1 buckets (last = overflow, discarded)
    sums = jnp.zeros((b, max_out + 1, 3), jnp.float32)
    counts = jnp.zeros((b, max_out + 1), jnp.float32)
    bidx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, n))
    sums = sums.at[bidx, seg].add(xsort * w[..., None])
    counts = counts.at[bidx, seg].add(w)

    sums, counts = sums[:, :max_out], counts[:, :max_out]
    sub_mask = counts > 0
    sub_xyz = sums / jnp.maximum(counts, 1.0)[..., None]
    return sub_xyz, sub_mask
