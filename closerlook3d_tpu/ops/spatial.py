"""Spatial ordering utilities (Morton / Z-order curves).

The reference never orders points (CUDA gathers are latency-hidden by
massive parallelism; reference: pytorch/pt_custom_ops gather kernels).
On TPU the fused aggregation kernels process queries in lane tiles and
the support set in sublane chunks; when both are sorted along a
space-filling curve, each query tile's neighbors collapse into one or
two support chunks and the kernels skip the rest (see
ops/pallas/aggregation._chunk_flags). Sorting is therefore purely a
performance device here — every op is mask-correct for ANY ordering.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

#: bits per axis for Morton quantization: 3*10 = 30 bits fits int32.
MORTON_BITS = 10
_SENTINEL = jnp.int32(2**30)  # sorts after every valid 30-bit code


def _part1by2(x: jax.Array) -> jax.Array:
    """Spread the low 10 bits of x so consecutive bits are 3 apart."""
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_code(cells: jax.Array) -> jax.Array:
    """Interleave [..., 3] int32 cell coords (< 1024) into Z-order codes."""
    cx = _part1by2(cells[..., 0])
    cy = _part1by2(cells[..., 1])
    cz = _part1by2(cells[..., 2])
    return cx | (cy << 1) | (cz << 2)


def morton_keys(xyz: jax.Array, mask: Optional[jax.Array] = None
                ) -> jax.Array:
    """Z-order key per point, normalized to each cloud's bounding box.

    Invalid points get a sentinel key that sorts after all valid ones.
    """
    x = xyz.astype(jnp.float32)
    if mask is None:
        mask = jnp.ones(x.shape[:-1], dtype=bool)
    big = jnp.float32(1e10)
    m = mask[..., None]
    mins = jnp.min(jnp.where(m, x, big), axis=-2, keepdims=True)
    maxs = jnp.max(jnp.where(m, x, -big), axis=-2, keepdims=True)
    scale = jnp.float32(2**MORTON_BITS - 1) / jnp.maximum(
        jnp.max(maxs - mins, axis=-1, keepdims=True), 1e-9)
    cells = jnp.clip((x - mins) * scale, 0, 2**MORTON_BITS - 1).astype(
        jnp.int32)
    return jnp.where(mask, morton_code(cells), _SENTINEL)


def morton_sort(xyz: jax.Array, mask: Optional[jax.Array] = None
                ) -> Tuple[jax.Array, jax.Array]:
    """Permutation sorting each cloud along the Z-order curve.

    Returns (perm, inv_perm), both [B, N] int32, with invalid points
    moved to the end. ``x_sorted = take_along_axis(x, perm, 1)`` and
    ``x = take_along_axis(x_sorted, inv_perm, 1)``.
    """
    keys = morton_keys(xyz, mask)
    perm = jnp.argsort(keys, axis=-1).astype(jnp.int32)
    inv = jnp.argsort(perm, axis=-1).astype(jnp.int32)
    return perm, inv


def apply_permutation(x: jax.Array, perm: jax.Array) -> jax.Array:
    """Gather rows of [B, N, ...] (or [B, N]) by a [B, N] permutation."""
    if x.ndim == 2:
        return jnp.take_along_axis(x, perm, axis=1)
    idx = perm.reshape(*perm.shape, *([1] * (x.ndim - 2)))
    return jnp.take_along_axis(x, idx, axis=1)
