"""Pallas ball-query kernel (masked ordered radius search).

Parity: the reference's masked_ordered_ball_query CUDA kernel (N2) and
the jnp reference in ops/neighbors.py — k nearest within radius,
ascending by distance, shadow-padded with the nearest index.

Design: per query tile, the [T, Ns] squared-distance matrix is computed
on the MXU (cross-term matmul at HIGHEST precision) and stays in VMEM;
K min-extraction passes emit (index, validity) pairs into lane-one-hot
accumulators (no dynamic stores). The XLA top_k path materializes
[B, Nq, Ns] through HBM and sorts it — this kernel never leaves VMEM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from closerlook3d_tpu.ops.pallas.aggregation import (
    _interpret,
    _pad_queries,
    _tile_for,
)

_HI = jax.lax.Precision.HIGHEST
_BIG = 1e10


def _bq_kernel(qxyz_ref, sxyzt_ref, qmask_ref, smask_ref, idx_ref,
               nmask_ref, *, k: int, ns: int, radius: float):
    t = qxyz_ref.shape[1]
    q = qxyz_ref[0]  # [T, 3] f32
    st = sxyzt_ref[0]  # [3, Ns] f32
    # d2 = |q|^2 + |s|^2 - 2 q.s  (cross term on the MXU)
    q2 = jnp.sum(q * q, axis=1, keepdims=True)  # [T, 1]
    s2 = jnp.sum(st * st, axis=0, keepdims=True)  # [1, Ns]
    cross = jax.lax.dot_general(
        q, st, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI)  # [T, Ns]
    d2 = jnp.maximum(q2 + s2 - 2.0 * cross, 0.0)
    d2 = d2 + jnp.where(smask_ref[0], 0.0, _BIG)  # [1, Ns] broadcast

    iota_ns = jax.lax.broadcasted_iota(jnp.int32, (t, ns), 1)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (t, k), 1)
    r2 = radius * radius
    qvalid = qmask_ref[0]  # [T, 1] bool

    def body(kk, carry):
        d2, out_idx, out_valid = carry
        dmin = jnp.min(d2, axis=1, keepdims=True)  # [T, 1]
        # first (lowest-index) argmin, as the jnp top_k tiebreak
        cand = jnp.where(d2 == dmin, iota_ns, ns)
        cur = jnp.min(cand, axis=1, keepdims=True)  # [T, 1] int32
        ok = ((dmin <= r2) & qvalid).astype(jnp.int32)  # [T, 1]
        sel_k = (iota_k == kk).astype(jnp.int32)
        out_idx = out_idx + cur * sel_k
        out_valid = out_valid + ok * sel_k  # int32 carry: bool carries
        d2 = jnp.where(iota_ns == cur, _BIG, d2)  # fail scf legalization
        return d2, out_idx, out_valid

    # fori_loop (not unrolled): Mosaic keeps every unrolled iteration's
    # [T, Ns] temporaries live on the VMEM stack otherwise
    d2, out_idx, out_valid = jax.lax.fori_loop(
        0, k, body,
        (d2, jnp.zeros((t, k), jnp.int32), jnp.zeros((t, k), jnp.int32)))
    out_valid = out_valid != 0
    # shadow-pad invalid slots with the nearest neighbor's index (slot 0)
    first = out_idx[:, 0:1]
    out_idx = jnp.where(out_valid, out_idx, first)
    idx_ref[0] = out_idx
    nmask_ref[0] = out_valid


@functools.partial(jax.jit, static_argnames=("radius", "nsample"))
def ball_query_pallas(query_xyz, support_xyz, radius: float, nsample: int,
                      query_mask=None, support_mask=None
                      ) -> Tuple[jax.Array, jax.Array]:
    """Drop-in for ops.neighbors.ball_query (same semantics/outputs)."""
    b, nq, _ = query_xyz.shape
    ns = support_xyz.shape[1]
    if query_mask is None:
        query_mask = jnp.ones((b, nq), bool)
    if support_mask is None:
        support_mask = jnp.ones((b, ns), bool)
    tile = _tile_for(nq, ns)
    qp, nq0 = _pad_queries(query_xyz.astype(jnp.float32), tile)
    qmp, _ = _pad_queries(query_mask[..., None], tile)
    ntile = qp.shape[1] // tile
    sxt = jnp.swapaxes(support_xyz.astype(jnp.float32), 1, 2)  # [B, 3, Ns]
    smp = support_mask[:, None, :]  # [B, 1, Ns]

    kern = functools.partial(_bq_kernel, k=nsample, ns=ns,
                             radius=float(radius))
    idx, nmask = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[
            pl.BlockSpec((1, tile, 3), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, ns), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ns), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, nsample), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, nsample), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, qp.shape[1], nsample), jnp.int32),
            jax.ShapeDtypeStruct((b, qp.shape[1], nsample), jnp.bool_),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(qp, sxt, qmp, smp)
    return idx[:, :nq0], nmask[:, :nq0]


def _knn_kernel(qxyz_ref, sxyzt_ref, smask_ref, idx_ref, d2_ref,
                *, k: int, ns: int):
    t = qxyz_ref.shape[1]
    q = qxyz_ref[0]
    st = sxyzt_ref[0]
    q2 = jnp.sum(q * q, axis=1, keepdims=True)
    s2 = jnp.sum(st * st, axis=0, keepdims=True)
    cross = jax.lax.dot_general(
        q, st, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI)
    d2 = jnp.maximum(q2 + s2 - 2.0 * cross, 0.0)
    d2 = d2 + jnp.where(smask_ref[0], 0.0, _BIG)

    iota_ns = jax.lax.broadcasted_iota(jnp.int32, (t, ns), 1)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (t, k), 1)
    def body(kk, carry):
        d2, out_idx, out_d2 = carry
        dmin = jnp.min(d2, axis=1, keepdims=True)
        cand = jnp.where(d2 == dmin, iota_ns, ns)
        cur = jnp.min(cand, axis=1, keepdims=True)
        sel_k = (iota_k == kk)
        out_idx = out_idx + cur * sel_k.astype(jnp.int32)
        out_d2 = out_d2 + dmin * sel_k.astype(jnp.float32)
        d2 = jnp.where(iota_ns == cur, _BIG, d2)
        return d2, out_idx, out_d2

    d2, out_idx, out_d2 = jax.lax.fori_loop(
        0, k, body,
        (d2, jnp.zeros((t, k), jnp.int32), jnp.zeros((t, k), jnp.float32)))
    idx_ref[0] = out_idx
    d2_ref[0] = out_d2


@functools.partial(jax.jit, static_argnames=("k",))
def knn_pallas(query_xyz, support_xyz, k: int, support_mask=None
               ) -> Tuple[jax.Array, jax.Array]:
    """Drop-in for ops.neighbors.knn: (idx, dist2), ascending.

    Never materializes [B, Nq, Ns] in HBM — the decoder's 1-NN/3-NN at
    S3DIS scale (15k x 4k) would otherwise allocate gigabytes.
    """
    b, nq, _ = query_xyz.shape
    ns = support_xyz.shape[1]
    if support_mask is None:
        support_mask = jnp.ones((b, ns), bool)
    tile = _tile_for(nq, ns)
    qp, nq0 = _pad_queries(query_xyz.astype(jnp.float32), tile)
    ntile = qp.shape[1] // tile
    sxt = jnp.swapaxes(support_xyz.astype(jnp.float32), 1, 2)
    smp = support_mask[:, None, :]

    kern = functools.partial(_knn_kernel, k=k, ns=ns)
    idx, d2 = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[
            pl.BlockSpec((1, tile, 3), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, ns), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ns), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, k), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, k), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, qp.shape[1], k), jnp.int32),
            jax.ShapeDtypeStruct((b, qp.shape[1], k), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(qp, sxt, smp)
    return idx[:, :nq0], d2[:, :nq0]
