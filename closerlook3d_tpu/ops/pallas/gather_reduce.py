"""Fused gather-reduce kernels for the factorized point-wise MLP.

The paper's best point-wise MLP config (dp_fi_df, one FC, max pool)
factors exactly: the FC splits by input rows into support-side and
query-side projections,

    h[t, k] = G[idx[t,k]] - D[t]
    G = f @ (W_fi + W_df) + sxyz @ W_dp / r
    D = f_nearest @ W_df + qxyz @ W_dp / r

so the per-neighbor matmul collapses to per-point matmuls (K x fewer
FLOPs) and the only irregular work left is a gather + subtract + reduce:

* ``neighborhood_sum``      — Σ_k masked G[idx] (a single multi-hot
  matmul; feeds the analytic masked-BN statistics);
* ``gather_sub_minmax``     — masked max AND min of h over the slots
  (both, so the BN affine — whose scale may be negative — plus ReLU can
  be applied OUTSIDE the kernel through monotonicity).

Both have custom VJPs (transposed multi-hot / argmax-routed matmuls).
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
_BIG = 3e38  # python float: jnp constants may not be closure-captured in kernels


# --------------------------------------------------------------------------
# neighborhood_sum
# --------------------------------------------------------------------------


def _sum_fwd_kernel(feats_ref, idx_ref, mask_ref, out_ref,
                    *, k: int, ns: int):
    t = idx_ref.shape[1]
    m = _multi_hot(idx_ref, mask_ref, t, k, ns)
    feats = feats_ref[0].astype(jnp.float32)
    out = jax.lax.dot_general(
        m, feats, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI)
    out_ref[0] = out.astype(out_ref.dtype)


def _sum_bwd_kernel(idx_ref, mask_ref, dy_ref, dfeats_ref,
                    *, k: int, ns: int):
    tile = pl.program_id(1)
    t = idx_ref.shape[1]
    m = _multi_hot(idx_ref, mask_ref, t, k, ns)
    df = jax.lax.dot_general(
        m, dy_ref[0].astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI)

    @pl.when(tile == 0)
    def _():
        dfeats_ref[0] = jnp.zeros_like(dfeats_ref[0])

    dfeats_ref[0] += df.astype(dfeats_ref.dtype)


@jax.custom_vjp
def neighborhood_sum(features, idx, mask):
    """[B, Nq, C] = Σ_k masked features[idx[.., k]]."""
    return _sum_call(features, idx, mask)


def _sum_call(features, idx, mask):
    b, nq, k = idx.shape
    ns, c = features.shape[1], features.shape[2]
    tile = _tile_for(nq, ns)
    ip, nq0 = _pad_queries(idx, tile)
    mp, _ = _pad_queries(mask, tile)
    ntile = ip.shape[1] // tile
    kern = functools.partial(_sum_fwd_kernel, k=k, ns=ns)
    out = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[
            pl.BlockSpec((1, ns, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, k), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, k), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ip.shape[1], c), features.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=_interpret(),
    )(features, ip, mp)
    return out[:, :nq0]


def _sum_fwd(features, idx, mask):
    return _sum_call(features, idx, mask), (features, idx, mask)


def _sum_bwd(res, dy):
    features, idx, mask = res
    b, nq, k = idx.shape
    ns, c = features.shape[1], features.shape[2]
    tile = _tile_for(nq, ns)
    ip, _ = _pad_queries(idx, tile)
    mp, _ = _pad_queries(mask, tile)
    dyp, _ = _pad_queries(dy, tile)
    ntile = ip.shape[1] // tile
    kern = functools.partial(_sum_bwd_kernel, k=k, ns=ns)
    dfeats = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[
            pl.BlockSpec((1, tile, k), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, k), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ns, c), lambda bi, ti: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ns, c), features.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=_interpret(),
    )(ip, mp, dyp)
    return dfeats, None, None


neighborhood_sum.defvjp(_sum_fwd, _sum_bwd)


# --------------------------------------------------------------------------
# gather_sub_minmax
# --------------------------------------------------------------------------


def _mm_fwd_kernel(g_ref, d_ref, idx_ref, mask_ref, max_ref, min_ref,
                   *, k: int, ns: int):
    t = idx_ref.shape[1]
    g = g_ref[0]
    d = d_ref[0].astype(jnp.float32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (t, ns), 1)
    hmax = jnp.full(d.shape, -_BIG)
    hmin = jnp.full(d.shape, _BIG)
    for kk in range(k):
        oh = (iota == idx_ref[0][:, kk:kk + 1]).astype(g.dtype)
        gf = jax.lax.dot_general(
            oh, g, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_HI if g.dtype == jnp.float32 else
            jax.lax.Precision.DEFAULT)
        h = gf - d
        m = mask_ref[0][:, kk:kk + 1]
        hmax = jnp.where(m, jnp.maximum(hmax, h), hmax)
        hmin = jnp.where(m, jnp.minimum(hmin, h), hmin)
    max_ref[0] = hmax.astype(max_ref.dtype)
    min_ref[0] = hmin.astype(min_ref.dtype)


def _mm_bwd_kernel(g_ref, d_ref, idx_ref, mask_ref, hmax_ref, hmin_ref,
                   dmax_ref, dmin_ref, dg_ref, dd_ref, *, k: int, ns: int):
    tile = pl.program_id(1)
    t = idx_ref.shape[1]
    g = g_ref[0]
    d = d_ref[0].astype(jnp.float32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (t, ns), 1)
    hmax = hmax_ref[0].astype(jnp.float32)
    hmin = hmin_ref[0].astype(jnp.float32)
    dmax = dmax_ref[0].astype(jnp.float32)
    dmin = dmin_ref[0].astype(jnp.float32)

    dg = jnp.zeros((ns, dd_ref.shape[2]), jnp.float32)
    dd = jnp.zeros(d.shape, jnp.float32)
    for kk in range(k):
        oh = (iota == idx_ref[0][:, kk:kk + 1]).astype(g.dtype)
        gf = jax.lax.dot_general(
            oh, g, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_HI if g.dtype == jnp.float32 else
            jax.lax.Precision.DEFAULT)
        h = gf - d
        m = mask_ref[0][:, kk:kk + 1].astype(jnp.float32)
        contrib = m * ((h == hmax) * dmax + (h == hmin) * dmin)  # [T, C]
        dd = dd - contrib
        dg = dg + jax.lax.dot_general(
            oh.astype(jnp.float32), contrib,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)

    dd_ref[0] = dd.astype(dd_ref.dtype)

    @pl.when(tile == 0)
    def _():
        dg_ref[0] = jnp.zeros_like(dg_ref[0])

    dg_ref[0] += dg.astype(dg_ref.dtype)


@jax.custom_vjp
def gather_sub_minmax(g, d, idx, mask):
    """(hmax, hmin) of h[t,k] = g[idx[t,k]] - d[t] over valid slots.

    g [B,Ns,C]; d [B,Nq,C]; idx [B,Nq,K] int32; mask [B,Nq,K] bool.
    Slots with no valid neighbor return ±3e38 — callers must mask empty
    neighborhoods (any_valid) themselves.
    """
    return _mm_call(g, d, idx, mask)


def _mm_specs(tile, ns, c, k):
    gspec = pl.BlockSpec((1, ns, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    qspec = pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM)
    ispec = pl.BlockSpec((1, tile, k), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM)
    return gspec, qspec, ispec


def _mm_call(g, d, idx, mask):
    b, nq, k = idx.shape
    ns, c = g.shape[1], g.shape[2]
    tile = _tile_for(nq, ns, mode="sin_cos")  # per-slot loop: small tiles
    dp_, nq0 = _pad_queries(d, tile)
    ip, _ = _pad_queries(idx, tile)
    mp, _ = _pad_queries(mask, tile)
    ntile = ip.shape[1] // tile
    kern = functools.partial(_mm_fwd_kernel, k=k, ns=ns)
    gspec, qspec, ispec = _mm_specs(tile, ns, c, k)
    hmax, hmin = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[gspec, qspec, ispec, ispec],
        out_specs=(qspec, qspec),
        out_shape=(
            jax.ShapeDtypeStruct((b, ip.shape[1], c), jnp.float32),
            jax.ShapeDtypeStruct((b, ip.shape[1], c), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=_interpret(),
    )(g, dp_, ip, mp)
    return hmax[:, :nq0], hmin[:, :nq0]


def _mm_fwd(g, d, idx, mask):
    hmax, hmin = _mm_call(g, d, idx, mask)
    return (hmax, hmin), (g, d, idx, mask, hmax, hmin)


def _mm_bwd(res, dys):
    g, d, idx, mask, hmax, hmin = res
    dmax, dmin = dys
    b, nq, k = idx.shape
    ns, c = g.shape[1], g.shape[2]
    tile = _tile_for(nq, ns, mode="sin_cos")
    dp_, _ = _pad_queries(d, tile)
    ip, _ = _pad_queries(idx, tile)
    mp, _ = _pad_queries(mask, tile)
    hmaxp, _ = _pad_queries(hmax, tile)
    hminp, _ = _pad_queries(hmin, tile)
    dmaxp, _ = _pad_queries(dmax, tile)
    dminp, _ = _pad_queries(dmin, tile)
    ntile = ip.shape[1] // tile
    kern = functools.partial(_mm_bwd_kernel, k=k, ns=ns)
    gspec, qspec, ispec = _mm_specs(tile, ns, c, k)
    f32q = pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0),
                        memory_space=pltpu.VMEM)
    dg, dd = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[gspec, qspec, ispec, ispec, f32q, f32q, f32q, f32q],
        out_specs=(
            pl.BlockSpec((1, ns, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            qspec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, ns, c), g.dtype),
            jax.ShapeDtypeStruct((b, ip.shape[1], c), d.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=_interpret(),
    )(g, dp_, ip, mp, hmaxp, hminp, dmaxp, dminp)
    return dg, dd[:, :nq], None, None


gather_sub_minmax.defvjp(_mm_fwd, _mm_bwd)
