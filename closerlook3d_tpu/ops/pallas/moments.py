"""Fused neighborhood moments kernel (transposed layout, see aggregation.py).

Computes, for every query point over its masked padded neighborhood,
the zeroth and first geometric moments of neighbor features:

    out[t] = [ R_k(f_j),  R_k(dp_x f_j),  R_k(dp_y f_j),  R_k(dp_z f_j) ]

(R = masked sum or avg, dp = (p_j - p_i)/radius) — a [B, Nq, 4C] tensor
with NO [B,N,K,C] materialization. Everything factorizes through the
transposed masked multi-hot matrix M_T[s,t]:

    R(f)_T      = fᵀ "via" M_T          (dot contracting Ns)
    R(dp_d f)_T = fᵀ via (M_T ⊙ Δ_d)

Consumers: adaptive_weight with a single linear FC on dp (the paper's
default), point-wise MLP masked-BN statistics, any operator linear in dp.

Backward: d f = Σ_d (M_T ⊙ Δ_d) @ dy_dᵀ + M_T @ dy_0ᵀ — the same
matmuls transposed, accumulated over query tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from closerlook3d_tpu.ops.pallas.aggregation import (
    _NS_CHUNK,
    _chunk_lists,
    _hi_slot,
    _common_specs,
    _lists_spec,
    _interpret,
    _multi_hot_chunk,
    _pad_queries,
    _pad_support,
    _prep_tq,
    _tile_chunked,
)

_HI = jax.lax.Precision.HIGHEST


def _fwd_kernel(qxyzT_ref, sxyz_ref, feats_ref, idxT_ref, maskT_ref,
                flags_ref, out_ref, acc_ref, cnt_ref, *, k: int, ns: int,
                channels: int, radius: float, reduction: str):
    t = qxyzT_ref.shape[2]
    cs = min(ns, _NS_CHUNK)
    inv_r = 1.0 / radius
    qT = qxyzT_ref[0]
    trow = pl.program_id(1) % 8
    hi = _hi_slot(maskT_ref, k, t)  # hoisted: tile-invariant
    acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
    # valid-neighbor count == mask row-sum (chunk-independent)
    cnt_ref[...] = jnp.sum(maskT_ref[0].astype(jnp.float32), axis=0,
                           keepdims=True)

    def chunk_body(j, _):
        ci = flags_ref[0, trow, j]  # packed active-chunk list

        start = ci * cs
        m = _multi_hot_chunk(idxT_ref, maskT_ref, k, cs, t, start,
                             hi)
        sx = sxyz_ref[0, pl.ds(start, cs), :]
        fch = feats_ref[0, pl.ds(start, cs), :]
        # bf16 features: single-pass bf16 MXU matmuls (d=0's pure
        # multi-hot is exact; delta weights quantize like any bf16
        # operand); f32 features keep full precision.
        fprec = (_HI if fch.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
        outs = []
        for d in range(4):
            if d == 0:
                w = m
            else:
                delta = (sx[:, d - 1:d] - qT[d - 1:d, :]) * inv_r
                w = m * delta
            outs.append(jax.lax.dot_general(
                fch, w.astype(fch.dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=fprec))
        acc_ref[...] = acc_ref[...] + jnp.concatenate(outs, axis=0)
        return 0

    jax.lax.fori_loop(0, flags_ref[0, trow, ns // cs], chunk_body, 0)
    acc = acc_ref[...]
    if reduction == "avg":
        acc = acc / jnp.maximum(cnt_ref[...], 1.0)
    out_ref[0] = acc.astype(out_ref.dtype)


def _bwd_kernel(qxyzT_ref, sxyz_ref, idxT_ref, maskT_ref, dyT_ref,
                flags_ref, dfeats_ref, cnt_ref, *, k: int, ns: int,
                channels: int, radius: float, reduction: str):
    tile = pl.program_id(1)
    t = qxyzT_ref.shape[2]
    cs = min(ns, _NS_CHUNK)
    inv_r = 1.0 / radius
    qT = qxyzT_ref[0]
    trow = tile % 8
    hi = _hi_slot(maskT_ref, k, t)  # hoisted: tile-invariant

    @pl.when(tile == 0)
    def _():
        dfeats_ref[0] = jnp.zeros_like(dfeats_ref[0])

    dy0 = dyT_ref[0]  # [4C, T]
    dprec = (_HI if dy0.dtype == jnp.float32
             else jax.lax.Precision.DEFAULT)
    if reduction == "avg":
        # valid-neighbor count == mask row-sum (chunk-independent)
        cnt = jnp.sum(maskT_ref[0].astype(jnp.float32), axis=0,
                      keepdims=True)
        dy0 = (dy0.astype(jnp.float32)
               / jnp.maximum(cnt, 1.0)).astype(dy0.dtype)
        del cnt_ref

    def chunk_body(j, _):
        ci = flags_ref[0, trow, j]  # packed active-chunk list

        start = ci * cs
        m = _multi_hot_chunk(idxT_ref, maskT_ref, k, cs, t, start,
                             hi)
        sx = sxyz_ref[0, pl.ds(start, cs), :]
        df = jnp.zeros((cs, channels), jnp.float32)
        for d in range(4):
            if d == 0:
                w = m
            else:
                delta = (sx[:, d - 1:d] - qT[d - 1:d, :]) * inv_r
                w = m * delta
            df = df + jax.lax.dot_general(
                w.astype(dy0.dtype),
                dy0[d * channels:(d + 1) * channels, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=dprec)
        dfeats_ref[0, pl.ds(start, cs), :] += df.astype(dfeats_ref.dtype)
        return 0

    jax.lax.fori_loop(0, flags_ref[0, trow, ns // cs], chunk_body, 0)


def neighborhood_moments(query_xyz, support_xyz, features, idx, mask,
                         radius, reduction: str):
    from closerlook3d_tpu.ops.pallas.aggregation import _fold_batch
    b, nq, k = idx.shape
    ns, c = features.shape[1], features.shape[2]
    if _fold_batch(nq, b):
        off = (jnp.arange(b, dtype=idx.dtype) * ns)[:, None, None]
        out = _moments_vjp(
            query_xyz.reshape(1, b * nq, 3),
            support_xyz.reshape(1, b * ns, 3),
            features.reshape(1, b * ns, c),
            (idx + off).reshape(1, b * nq, k),
            mask.reshape(1, b * nq, k), radius, reduction)
        return out.reshape(b, nq, -1)
    return _moments_vjp(query_xyz, support_xyz, features, idx, mask,
                        radius, reduction)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _moments_vjp(query_xyz, support_xyz, features, idx, mask,
                         radius: float, reduction: str = "avg"):
    """[B, Nq, 4C]: masked [R(f), R(dp_x f), R(dp_y f), R(dp_z f)].

    reduction: avg|sum. Differentiable in features.
    """
    return _call(query_xyz, support_xyz, features, idx, mask, radius,
                 reduction)


def _call(query_xyz, support_xyz, features, idx, mask, radius, reduction):
    b, nq, _ = query_xyz.shape
    support_xyz, features, _ = _pad_support(support_xyz, features)
    ns, c = features.shape[1], features.shape[2]
    k = idx.shape[2]
    tile = _tile_chunked(nq)
    qT, iT, mT, nq0, nqp = _prep_tq(query_xyz, idx, mask, tile)
    ntile = nqp // tile
    cs = min(ns, _NS_CHUNK)

    kern = functools.partial(
        _fwd_kernel, k=k, ns=ns, channels=c, radius=float(radius),
        reduction=reduction)
    qspec, sspec, fspec, ispec, _ = _common_specs(tile, ns, c, k)
    oTspec = pl.BlockSpec((1, 4 * c, tile), lambda bi, ti: (bi, 0, ti),
                          memory_space=pltpu.VMEM)
    outT = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[qspec, sspec, fspec, ispec, ispec, _lists_spec(ns // cs)],
        out_specs=oTspec,
        out_shape=jax.ShapeDtypeStruct((b, 4 * c, nqp), features.dtype),
        scratch_shapes=[pltpu.VMEM((4 * c, tile), jnp.float32),
                        pltpu.VMEM((1, tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(qT, support_xyz.astype(jnp.float32), features, iT, mT,
      _chunk_lists(idx, mask, tile, cs, ns // cs))
    return jnp.swapaxes(outT, 1, 2)[:, :nq0]


def _fwd(query_xyz, support_xyz, features, idx, mask, radius, reduction):
    out = _call(query_xyz, support_xyz, features, idx, mask, radius,
                reduction)
    return out, (query_xyz, support_xyz, features, idx, mask)


def _bwd(radius, reduction, res, dy):
    query_xyz, support_xyz, features, idx, mask = res
    b = query_xyz.shape[0]
    ns0 = features.shape[1]
    support_xyz, features, _ = _pad_support(support_xyz, features)
    ns, c = features.shape[1], features.shape[2]
    k = idx.shape[2]
    tile = _tile_chunked(query_xyz.shape[1])
    qT, iT, mT, _, nqp = _prep_tq(query_xyz, idx, mask, tile)
    dyp, _ = _pad_queries(dy, tile)
    dyT = jnp.swapaxes(dyp, 1, 2)  # [B, 4C, Nqp]
    ntile = nqp // tile
    cs = min(ns, _NS_CHUNK)

    kern = functools.partial(
        _bwd_kernel, k=k, ns=ns, channels=c, radius=float(radius),
        reduction=reduction)
    qspec, sspec, fspec, ispec, _ = _common_specs(tile, ns, c, k)
    dyspec = pl.BlockSpec((1, 4 * c, tile), lambda bi, ti: (bi, 0, ti),
                          memory_space=pltpu.VMEM)
    dfeats = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[qspec, sspec, ispec, ispec, dyspec,
                  _lists_spec(ns // cs)],
        out_specs=fspec,
        out_shape=jax.ShapeDtypeStruct((b, ns, c), features.dtype),
        scratch_shapes=[pltpu.VMEM((1, tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(qT, support_xyz.astype(jnp.float32), iT, mT, dyT,
      _chunk_lists(idx, mask, tile, cs, ns // cs))
    return (jnp.zeros_like(query_xyz),
            jnp.zeros((b, ns0, 3), query_xyz.dtype),
            dfeats[:, :ns0], None, None)


_moments_vjp.defvjp(_fwd, _bwd)
