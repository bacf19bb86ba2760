"""Grouping (neighbor gather) and masked reductions.

Parity: the reference's ``group_points`` CUDA kernel (SURVEY.md §2.3 N4)
gathers ``[B, N, K]`` neighbor features. Here the gather is a jnp
``take_along_axis`` the XLA TPU backend fuses into downstream elementwise
work; the fully fused gather->encode->reduce path lives in
``closerlook3d_tpu.ops.pallas.aggregation``.

Masked-reduction conventions (SURVEY.md §7 "hard part 3"):
  * max: invalid slots -> -inf; queries with zero valid neighbors -> 0.
  * avg: sum of valid / max(count, 1).
  * sum: sum of valid.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def group_features(features: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather neighbor features.

    Args:
      features: [B, Ns, C].
      idx:      [B, Nq, K] int32 indices into Ns.

    Returns:
      [B, Nq, K, C].
    """
    b, nq, k = idx.shape
    flat = idx.reshape(b, nq * k)
    out = jnp.take_along_axis(features, flat[..., None], axis=1)
    return out.reshape(b, nq, k, features.shape[-1])


def group_xyz(xyz: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather neighbor coordinates: [B, Nq, K, 3]."""
    return group_features(xyz, idx)


def masked_max(
    values: jax.Array, mask: Optional[jax.Array], axis: int = -2
) -> jax.Array:
    """Max over the neighbor axis; empty neighborhoods produce 0."""
    if mask is None:
        return jnp.max(values, axis=axis)
    m = jnp.expand_dims(mask, -1)
    filled = jnp.where(m, values, jnp.float32(-jnp.inf).astype(values.dtype))
    out = jnp.max(filled, axis=axis)
    any_valid = jnp.any(mask, axis=-1, keepdims=True)
    return jnp.where(any_valid, out, jnp.zeros_like(out))


def masked_sum(
    values: jax.Array, mask: Optional[jax.Array], axis: int = -2
) -> jax.Array:
    if mask is None:
        return jnp.sum(values, axis=axis)
    m = jnp.expand_dims(mask, -1).astype(values.dtype)
    return jnp.sum(values * m, axis=axis)


def masked_avg(
    values: jax.Array, mask: Optional[jax.Array], axis: int = -2
) -> jax.Array:
    if mask is None:
        return jnp.mean(values, axis=axis)
    total = masked_sum(values, mask, axis=axis)
    count = jnp.sum(mask, axis=-1, keepdims=True).astype(values.dtype)
    return total / jnp.maximum(count, 1.0)


def neighborhood_max(
    features: jax.Array, idx: jax.Array, mask: Optional[jax.Array]
) -> jax.Array:
    """Fused gather + masked max over a neighborhood: [B, Nq, C].

    The jnp path materializes the [B, Nq, K, C] gather; the Pallas
    kernel (ops/pallas/gather_reduce.neighborhood_max) keeps the
    reduction in VMEM via one wide one-hot matmul per support chunk.
    v5e: the kernel wins at S3DIS scale (seg step 106 -> 92 ms) but
    XLA's gather is ~1 ms better at ModelNet40 scale, so `auto`
    dispatches by support size. Override via CL3D_MAX_IMPL=jnp|pallas.
    """
    import os
    from closerlook3d_tpu.ops.dispatch import prefer_pallas
    impl = os.environ.get("CL3D_MAX_IMPL", "auto")
    use_pallas = (impl == "pallas"
                  or (impl == "auto" and features.shape[1] >= 2048))
    if use_pallas and prefer_pallas():
        from closerlook3d_tpu.ops.pallas.gather_reduce import (
            neighborhood_max as neighborhood_max_pallas)
        if mask is None:
            mask = jnp.ones(idx.shape, bool)
        return neighborhood_max_pallas(features, idx, mask)
    return masked_max(group_features(features, idx), mask)
