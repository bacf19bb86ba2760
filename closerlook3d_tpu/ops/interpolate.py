"""Decoder upsampling: nearest-neighbor and inverse-distance 3-NN interpolation.

Parity targets (SURVEY.md §2.3 N3/N6): the reference's masked nearest
query and three_nn/three_interpolate CUDA kernels — propagate features
from a coarse point set to a finer one by inverse-distance-weighted kNN.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from closerlook3d_tpu.ops.grouping import group_features
from closerlook3d_tpu.ops.neighbors import knn

_BIG = 1e9  # matches the invalid-support bias in neighbors.knn (1e10 > _BIG)


@functools.partial(jax.jit, static_argnames=("k",))
def three_interpolate(
    query_xyz: jax.Array,
    support_xyz: jax.Array,
    support_features: jax.Array,
    support_mask: Optional[jax.Array] = None,
    k: int = 3,
) -> jax.Array:
    """Inverse-distance-weighted k-NN feature propagation.

    Args:
      query_xyz:        [B, Nq, 3] fine points.
      support_xyz:      [B, Ns, 3] coarse points.
      support_features: [B, Ns, C].
      support_mask:     [B, Ns] bool.
      k: neighbors to blend (3 = reference's three_interpolate).

    Returns:
      [B, Nq, C] features at the query points.
    """
    idx, d2 = knn(query_xyz, support_xyz, k, support_mask=support_mask)
    valid = d2 < _BIG  # slots backed by real support points
    w = 1.0 / jnp.maximum(d2, 1e-10)
    w = jnp.where(valid, w, 0.0)
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-10)
    neigh = group_features(support_features, idx)  # [B, Nq, k, C]
    return jnp.sum(neigh * w[..., None].astype(neigh.dtype), axis=-2)


@jax.jit
def nearest_upsample(
    query_xyz: jax.Array,
    support_xyz: jax.Array,
    support_features: jax.Array,
    support_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Copy each query point's nearest support feature (masked 1-NN)."""
    idx, _ = knn(query_xyz, support_xyz, 1, support_mask=support_mask)
    return group_features(support_features, idx)[:, :, 0, :]
