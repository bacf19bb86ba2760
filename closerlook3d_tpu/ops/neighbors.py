"""Neighbor search: radius (ball) query and kNN over padded point clouds.

Behavioral parity target (SURVEY.md §2.3 N2/N3): the reference's
``masked_ordered_ball_query`` CUDA kernel — for each query point, up to
``nsample`` neighbors within ``radius``, **sorted by ascending distance**,
padded with the nearest neighbor's index, with a boolean validity mask.

TPU design: fixed-shape ``[B, Nq, K]`` outputs; the distance matrix is
computed as ``|q|^2 + |s|^2 - 2 q.s`` so the cross term rides the MXU;
optional chunking over queries bounds the ``[B, Tq, Ns]`` intermediate so
S3DIS-scale clouds (~15k pts) never materialize ``Nq x Ns`` in HBM at once.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e10)


def pairwise_dist2(
    query_xyz: jax.Array, support_xyz: jax.Array
) -> jax.Array:
    """Squared euclidean distances ``[B, Nq, Ns]`` between point sets.

    Direct outer-difference form Σ_d (q_d - s_d)^2, which is what the
    reference CUDA kernels compute per pair and what the Pallas kernels
    compute on the VPU. The expanded |q|^2 + |s|^2 - 2 q.s form loses
    ~5 bits to cancellation at |Δ| ≪ |q| and mis-orders near-ties
    relative to the kernels (observed at S3DIS scale: pairs 6e-7 apart
    in a 4 m room swap rank). Accumulated per coordinate so the eager
    peak stays at 2x [B, Nq, Ns] (a fused [B, Nq, Ns, 3] form would
    transiently hold 4x that outside jit); under jit XLA fuses either
    way.
    """
    q = query_xyz.astype(jnp.float32)
    s = support_xyz.astype(jnp.float32)
    d2 = None
    for d in range(3):
        diff = q[..., :, None, d] - s[..., None, :, d]  # [B, Nq, Ns]
        d2 = diff * diff if d2 is None else d2 + diff * diff
    return d2


def _topk_neighbors(
    d2: jax.Array, nsample: int
) -> Tuple[jax.Array, jax.Array]:
    """k smallest entries along the last axis: (dist2 [..,K], idx [..,K]).

    When the support set is smaller than nsample (deep stages of small
    clouds), extra slots repeat the nearest index at +BIG distance so the
    radius test downstream masks them out.
    """
    k = min(nsample, d2.shape[-1])
    neg, idx = jax.lax.top_k(-d2, k)
    d2k, idx = -neg, idx.astype(jnp.int32)
    if k < nsample:
        pad = nsample - k
        d2k = jnp.concatenate(
            [d2k, jnp.full((*d2k.shape[:-1], pad), _BIG, d2k.dtype)], -1)
        idx = jnp.concatenate(
            [idx, jnp.repeat(idx[..., :1], pad, axis=-1)], -1)
    return d2k, idx


def _ball_query_block(
    query_xyz: jax.Array,
    support_xyz: jax.Array,
    support_invalid_bias: Optional[jax.Array],
    radius: float,
    nsample: int,
) -> Tuple[jax.Array, jax.Array]:
    d2 = pairwise_dist2(query_xyz, support_xyz)
    if support_invalid_bias is not None:
        d2 = d2 + support_invalid_bias[:, None, :]
    d2k, idx = _topk_neighbors(d2, nsample)
    valid = d2k <= jnp.float32(radius) * jnp.float32(radius)
    # Pad invalid slots with the nearest neighbor's index so gathers stay
    # in-bounds and order-sensitive consumers see the reference's
    # shadow-point convention (nearest valid point repeated).
    idx = jnp.where(valid, idx, idx[..., :1])
    return idx, valid


@functools.partial(
    jax.jit, static_argnames=("radius", "nsample", "chunk_size")
)
def ball_query(
    query_xyz: jax.Array,
    support_xyz: jax.Array,
    radius: float,
    nsample: int,
    query_mask: Optional[jax.Array] = None,
    support_mask: Optional[jax.Array] = None,
    chunk_size: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Masked ordered ball query over padded batches.

    Args:
      query_xyz:   [B, Nq, 3] float.
      support_xyz: [B, Ns, 3] float.
      radius:      search radius (static).
      nsample:     max neighbors K (static).
      query_mask:  [B, Nq] bool, True = real point.
      support_mask:[B, Ns] bool.
      chunk_size:  if given and it divides Nq, queries are processed in
        chunks of this size (bounds the [B, chunk, Ns] intermediate).

    Returns:
      idx  [B, Nq, K] int32 — ascending-distance neighbor indices into the
           support set; invalid slots hold the nearest neighbor's index.
      mask [B, Nq, K] bool — True where the slot is a real in-radius
           neighbor of a real query point.
    """
    from closerlook3d_tpu.ops.dispatch import prefer_pallas
    if prefer_pallas():
        import os
        from closerlook3d_tpu.ops.pallas.neighbors import (
            ball_query_pallas, ball_query_pallas_chunked)
        # Large supports: bbox-pruned chunk-skipping kernel (exact for
        # in-radius neighbors; fast when inputs are Morton-sorted).
        chunked = os.environ.get("CL3D_BQ_CHUNKED", "auto")
        ns = support_xyz.shape[1]
        if chunked == "1" or (chunked == "auto" and ns >= 1024):
            return ball_query_pallas_chunked(
                query_xyz, support_xyz, radius, nsample,
                query_mask=query_mask, support_mask=support_mask)
        return ball_query_pallas(query_xyz, support_xyz, radius, nsample,
                                 query_mask=query_mask,
                                 support_mask=support_mask)

    bias = None
    if support_mask is not None:
        bias = jnp.where(support_mask, 0.0, _BIG).astype(jnp.float32)

    b, nq, _ = query_xyz.shape
    if chunk_size is not None and nq % chunk_size == 0 and nq > chunk_size:
        nchunk = nq // chunk_size
        qc = query_xyz.reshape(b, nchunk, chunk_size, 3)

        def do_chunk(q):
            return _ball_query_block(q, support_xyz, bias, radius, nsample)

        # scan over chunks: keeps one [B, chunk, Ns] buffer live at a time.
        idx, valid = jax.lax.map(do_chunk, jnp.swapaxes(qc, 0, 1))
        idx = jnp.swapaxes(idx, 0, 1).reshape(b, nq, nsample)
        valid = jnp.swapaxes(valid, 0, 1).reshape(b, nq, nsample)
    else:
        idx, valid = _ball_query_block(
            query_xyz, support_xyz, bias, radius, nsample
        )

    if query_mask is not None:
        valid = valid & query_mask[..., None]
    return idx, valid


@functools.partial(jax.jit, static_argnames=("k",))
def knn(
    query_xyz: jax.Array,
    support_xyz: jax.Array,
    k: int,
    support_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """k nearest neighbors: (idx [B,Nq,k] int32, dist2 [B,Nq,k]).

    Invalid support points (mask False) are pushed to +BIG distance, so
    they are only returned when a cloud has fewer than k valid points.
    """
    from closerlook3d_tpu.ops.dispatch import prefer_pallas
    if prefer_pallas():
        from closerlook3d_tpu.ops.pallas.neighbors import (
            knn1_pallas_chunked, knn_pallas)
        # decoder 1-NN at scale: bbox-pruned chunk skipping (exact; the
        # min-over-chunks farthest-box distance bounds the 1-NN)
        if k == 1 and support_xyz.shape[1] >= 1024:
            return knn1_pallas_chunked(query_xyz, support_xyz,
                                       support_mask=support_mask)
        return knn_pallas(query_xyz, support_xyz, k,
                          support_mask=support_mask)

    d2 = pairwise_dist2(query_xyz, support_xyz)
    if support_mask is not None:
        d2 = d2 + jnp.where(support_mask, 0.0, _BIG)[:, None, :]
    d2k, idx = _topk_neighbors(d2, k)
    return idx, d2k
