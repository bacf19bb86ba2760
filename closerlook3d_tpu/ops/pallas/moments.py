"""Fused neighborhood moments kernel.

Computes, for every query point over its masked padded neighborhood,
the zeroth and first geometric moments of neighbor features:

    out[t] = [ R_k(f_j),  R_k(dp_x f_j),  R_k(dp_y f_j),  R_k(dp_z f_j) ]

(R = masked sum or avg, dp = (p_j - p_i)/radius) — a [B, Nq, 4C] tensor
with NO [B,N,K,C] materialization. Everything factorizes through the
masked multi-hot matrix M[t,s] (see aggregation.py):

    R(f)        = M       @ f
    R(dp_d f)   = (M ⊙ Δ_d) @ f

Consumers:
  * adaptive_weight with a single linear FC on dp (the paper's default):
      y = avg_k((W dp + b) ⊙ f) = Σ_d W[:,d] ⊙ R(dp_d f)/cnt + b ⊙ R(f)/cnt
  * point-wise MLP masked-BN statistics (sums of G and G² over slots)
  * any operator linear in dp.

Backward: d f = Σ_d (M ⊙ Δ_d)ᵀ @ dy_d + Mᵀ @ dy_0 — same matmuls
transposed, accumulated over query tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from closerlook3d_tpu.ops.pallas.aggregation import (
    _interpret,
    _multi_hot,
    _pad_queries,
    _tile_for,
)

_HI = jax.lax.Precision.HIGHEST


def _fwd_kernel(qxyz_ref, sxyzt_ref, feats_ref, idx_ref, mask_ref, out_ref,
                *, k: int, ns: int, channels: int, radius: float,
                reduction: str):
    t = qxyz_ref.shape[1]
    m = _multi_hot(idx_ref, mask_ref, t, k, ns)  # [T, Ns]
    feats = feats_ref[0].astype(jnp.float32)
    inv_r = 1.0 / radius

    mats = [m]
    for d in range(3):
        delta = (sxyzt_ref[0][d:d + 1, :] - qxyz_ref[0][:, d:d + 1]) * inv_r
        mats.append(m * delta)
    outs = [jax.lax.dot_general(
        w, feats, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI) for w in mats]
    acc = jnp.concatenate(outs, axis=-1)  # [T, 4C]
    if reduction == "avg":
        cnt = jnp.sum(m, axis=1, keepdims=True)
        acc = acc / jnp.maximum(cnt, 1.0)
    out_ref[0] = acc.astype(out_ref.dtype)


def _bwd_kernel(qxyz_ref, sxyzt_ref, idx_ref, mask_ref, dy_ref, dfeats_ref,
                *, k: int, ns: int, channels: int, radius: float,
                reduction: str):
    tile = pl.program_id(1)
    t = qxyz_ref.shape[1]
    m = _multi_hot(idx_ref, mask_ref, t, k, ns)
    inv_r = 1.0 / radius

    dy = dy_ref[0].astype(jnp.float32)  # [T, 4C]
    if reduction == "avg":
        cnt = jnp.sum(m, axis=1, keepdims=True)
        dy = dy / jnp.maximum(cnt, 1.0)

    df = jnp.zeros((ns, channels), jnp.float32)
    for d in range(4):
        if d == 0:
            w = m
        else:
            delta = (sxyzt_ref[0][d - 1:d, :]
                     - qxyz_ref[0][:, d - 1:d]) * inv_r
            w = m * delta
        df = df + jax.lax.dot_general(
            w, dy[:, d * channels:(d + 1) * channels],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)

    @pl.when(tile == 0)
    def _():
        dfeats_ref[0] = jnp.zeros_like(dfeats_ref[0])

    dfeats_ref[0] += df.astype(dfeats_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def neighborhood_moments(query_xyz, support_xyz, features, idx, mask,
                         radius: float, reduction: str = "avg"):
    """[B, Nq, 4C]: masked [R(f), R(dp_x f), R(dp_y f), R(dp_z f)].

    reduction: avg|sum. Differentiable in features.
    """
    return _call(query_xyz, support_xyz, features, idx, mask, radius,
                 reduction)


def _call(query_xyz, support_xyz, features, idx, mask, radius, reduction):
    b, nq, _ = query_xyz.shape
    ns, c = features.shape[1], features.shape[2]
    k = idx.shape[2]
    tile = _tile_for(nq, ns)
    qp, nq0 = _pad_queries(query_xyz, tile)
    ip, _ = _pad_queries(idx, tile)
    mp, _ = _pad_queries(mask, tile)
    ntile = qp.shape[1] // tile
    sx = jnp.swapaxes(support_xyz, 1, 2)  # [B, 3, Ns]

    kern = functools.partial(
        _fwd_kernel, k=k, ns=ns, channels=c, radius=float(radius),
        reduction=reduction)
    out = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[
            pl.BlockSpec((1, tile, 3), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, ns), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ns, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, k), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, k), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, 4 * c), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, qp.shape[1], 4 * c),
                                       features.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=_interpret(),
    )(qp, sx, features, ip, mp)
    return out[:, :nq0]


def _fwd(query_xyz, support_xyz, features, idx, mask, radius, reduction):
    out = _call(query_xyz, support_xyz, features, idx, mask, radius,
                reduction)
    return out, (query_xyz, support_xyz, features, idx, mask)


def _bwd(radius, reduction, res, dy):
    query_xyz, support_xyz, features, idx, mask = res
    b = query_xyz.shape[0]
    ns, c = features.shape[1], features.shape[2]
    k = idx.shape[2]
    tile = _tile_for(query_xyz.shape[1], ns)
    qp, _ = _pad_queries(query_xyz, tile)
    ip, _ = _pad_queries(idx, tile)
    mp, _ = _pad_queries(mask, tile)
    dyp, _ = _pad_queries(dy, tile)
    ntile = qp.shape[1] // tile
    sx = jnp.swapaxes(support_xyz, 1, 2)

    kern = functools.partial(
        _bwd_kernel, k=k, ns=ns, channels=c, radius=float(radius),
        reduction=reduction)
    dfeats = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[
            pl.BlockSpec((1, tile, 3), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, ns), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, k), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, k), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 4 * c), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ns, c), lambda bi, ti: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ns, c), features.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=_interpret(),
    )(qp, sx, ip, mp, dyp)
    return (jnp.zeros_like(query_xyz), jnp.zeros_like(support_xyz),
            dfeats, None, None)


neighborhood_moments.defvjp(_fwd, _bwd)
