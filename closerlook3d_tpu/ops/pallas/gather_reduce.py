"""Fused gather-reduce kernels for the factorized point-wise MLP.

Transposed layout (see aggregation.py). The paper's best point-wise MLP
config (dp_fi_df, one FC, max pool) factors exactly:

    h[t, k] = G[idx[t,k]] - D[t]
    G = f @ (W_fi + W_df) + sxyz @ W_dp / r       (support-side)
    D = f_nearest @ W_df + qxyz @ W_dp / r        (query-side)

so the per-neighbor matmul collapses to per-point matmuls (K x fewer
FLOPs) and the only irregular work left is a gather + subtract + reduce:

* ``neighborhood_sum``  — Σ_k masked G[idx] (one multi-hot matmul; feeds
  the analytic masked-BN statistics);
* ``gather_sub_minmax`` — masked max AND min of h over the slots (both,
  so the BN affine — whose scale may be negative — plus ReLU apply
  OUTSIDE the kernel through monotonicity).

Both have custom VJPs (transposed multi-hot / extremum-routed matmuls).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from closerlook3d_tpu.ops.pallas.aggregation import (
    _NS_CHUNK,
    _gather_T,
    _interpret,
    _multi_hot_chunk,
    _pad_queries,
    _pad_support,
    _row,
    _tile_for,
)

_HI = jax.lax.Precision.HIGHEST
_BIG = 3e38  # python float: jnp constants may not be closure-captured


def _prep_iq(idx, mask, tile):
    ip, nq0 = _pad_queries(idx, tile)
    mp, _ = _pad_queries(mask, tile)
    iT = jnp.swapaxes(ip, 1, 2)  # [B, K, Nqp]
    mT = jnp.swapaxes(mp, 1, 2).astype(jnp.int32)
    return iT, mT, nq0, ip.shape[1]


def _ispec(tile, k):
    return pl.BlockSpec((1, k, tile), lambda bi, ti: (bi, 0, ti),
                        memory_space=pltpu.VMEM)


def _gspec(ns, c):
    return pl.BlockSpec((1, ns, c), lambda bi, ti: (bi, 0, 0),
                        memory_space=pltpu.VMEM)


def _qTspec(tile, c):
    return pl.BlockSpec((1, c, tile), lambda bi, ti: (bi, 0, ti),
                        memory_space=pltpu.VMEM)


# --------------------------------------------------------------------------
# neighborhood_sum
# --------------------------------------------------------------------------


def _sum_fwd_kernel(feats_ref, idxT_ref, maskT_ref, out_ref,
                    *, k: int, ns: int):
    t = idxT_ref.shape[2]
    cs = min(ns, _NS_CHUNK)

    def chunk_body(ci, acc):
        start = ci * cs
        m = _multi_hot_chunk(idxT_ref, maskT_ref, k, cs, t, start)
        fch = feats_ref[0, pl.ds(start, cs), :].astype(jnp.float32)
        return acc + jax.lax.dot_general(
            fch, m, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)

    c = out_ref.shape[1]
    out = jax.lax.fori_loop(0, ns // cs, chunk_body,
                            jnp.zeros((c, t), jnp.float32))
    out_ref[0] = out.astype(out_ref.dtype)


def _sum_bwd_kernel(idxT_ref, maskT_ref, dyT_ref, dfeats_ref,
                    *, k: int, ns: int):
    tile = pl.program_id(1)
    t = idxT_ref.shape[2]
    cs = min(ns, _NS_CHUNK)

    @pl.when(tile == 0)
    def _():
        dfeats_ref[0] = jnp.zeros_like(dfeats_ref[0])

    dy = dyT_ref[0].astype(jnp.float32)

    def chunk_body(ci, _):
        start = ci * cs
        m = _multi_hot_chunk(idxT_ref, maskT_ref, k, cs, t, start)
        df = jax.lax.dot_general(
            m, dy, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)
        dfeats_ref[0, pl.ds(start, cs), :] += df.astype(dfeats_ref.dtype)
        return 0

    jax.lax.fori_loop(0, ns // cs, chunk_body, 0)


@jax.custom_vjp
def neighborhood_sum(features, idx, mask):
    """[B, Nq, C] = Σ_k masked features[idx[.., k]]."""
    return _sum_call(features, idx, mask)


def _sum_call(features, idx, mask):
    b, nq, k = idx.shape
    _, features, _ = _pad_support(
        jnp.zeros((features.shape[0], features.shape[1], 3),
                  jnp.float32), features)
    ns, c = features.shape[1], features.shape[2]
    tile = _tile_for(nq, ns)
    iT, mT, nq0, nqp = _prep_iq(idx, mask, tile)
    ntile = nqp // tile
    kern = functools.partial(_sum_fwd_kernel, k=k, ns=ns)
    outT = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[_gspec(ns, c), _ispec(tile, k), _ispec(tile, k)],
        out_specs=_qTspec(tile, c),
        out_shape=jax.ShapeDtypeStruct((b, c, nqp), features.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(features, iT, mT)
    return jnp.swapaxes(outT, 1, 2)[:, :nq0]


def _sum_fwd(features, idx, mask):
    return _sum_call(features, idx, mask), (features, idx, mask)


def _sum_bwd(res, dy):
    features, idx, mask = res
    b, nq, k = idx.shape
    ns0 = features.shape[1]
    _, features, _ = _pad_support(
        jnp.zeros((features.shape[0], features.shape[1], 3),
                  jnp.float32), features)
    ns, c = features.shape[1], features.shape[2]
    tile = _tile_for(nq, ns)
    iT, mT, _, nqp = _prep_iq(idx, mask, tile)
    dyp, _ = _pad_queries(dy, tile)
    dyT = jnp.swapaxes(dyp, 1, 2)
    ntile = nqp // tile
    kern = functools.partial(_sum_bwd_kernel, k=k, ns=ns)
    dfeats = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[_ispec(tile, k), _ispec(tile, k), _qTspec(tile, c)],
        out_specs=_gspec(ns, c),
        out_shape=jax.ShapeDtypeStruct((b, ns, c), features.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(iT, mT, dyT)
    return dfeats[:, :ns0], None, None


neighborhood_sum.defvjp(_sum_fwd, _sum_bwd)


# --------------------------------------------------------------------------
# gather_sub_minmax
# --------------------------------------------------------------------------


def _mm_fwd_kernel(g_ref, dT_ref, idxT_ref, maskT_ref, max_ref, min_ref,
                   *, k: int, ns: int):
    t = idxT_ref.shape[2]
    g = g_ref[0]  # [Ns, C]
    dT = dT_ref[0].astype(jnp.float32)  # [C, T]
    iota = jax.lax.broadcasted_iota(jnp.int32, (ns, t), 0)
    fprec = _HI if g.dtype == jnp.float32 else jax.lax.Precision.DEFAULT

    def body(kk, carry):
        hmax, hmin = carry
        oh = (iota == _row(idxT_ref, kk)).astype(g.dtype)
        gf = _gather_T(oh, g, fprec)  # [C, T]
        h = gf - dT
        mk = _row(maskT_ref, kk) != 0  # [1, T]
        hmax = jnp.where(mk, jnp.maximum(hmax, h), hmax)
        hmin = jnp.where(mk, jnp.minimum(hmin, h), hmin)
        return hmax, hmin

    hmax, hmin = jax.lax.fori_loop(
        0, k, body, (jnp.full(dT.shape, -_BIG), jnp.full(dT.shape, _BIG)))
    max_ref[0] = hmax.astype(max_ref.dtype)
    min_ref[0] = hmin.astype(min_ref.dtype)


def _mm_bwd_kernel(g_ref, dT_ref, idxT_ref, maskT_ref, hmaxT_ref,
                   hminT_ref, dmaxT_ref, dminT_ref, dg_ref, ddT_ref,
                   *, k: int, ns: int):
    tile = pl.program_id(1)
    t = idxT_ref.shape[2]
    g = g_ref[0]
    dT = dT_ref[0].astype(jnp.float32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (ns, t), 0)
    fprec = _HI if g.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    hmax = hmaxT_ref[0].astype(jnp.float32)
    hmin = hminT_ref[0].astype(jnp.float32)
    dmax = dmaxT_ref[0].astype(jnp.float32)
    dmin = dminT_ref[0].astype(jnp.float32)

    def body(kk, carry):
        dg, dd = carry
        oh = (iota == _row(idxT_ref, kk)).astype(g.dtype)
        gf = _gather_T(oh, g, fprec)
        h = gf - dT
        mk = (_row(maskT_ref, kk) != 0).astype(jnp.float32)
        contrib = mk * ((h == hmax) * dmax + (h == hmin) * dmin)  # [C, T]
        dd = dd - contrib
        dg = dg + jax.lax.dot_general(
            oh.astype(jnp.float32), contrib,
            dimension_numbers=(((1,), (1,)), ((), ())),  # contract T
            preferred_element_type=jnp.float32, precision=_HI)  # [Ns, C]
        return dg, dd

    c = dT.shape[0]
    dg, dd = jax.lax.fori_loop(
        0, k, body, (jnp.zeros((ns, c), jnp.float32),
                     jnp.zeros(dT.shape, jnp.float32)))
    ddT_ref[0] = dd.astype(ddT_ref.dtype)

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


def _mm_call(g, d, idx, mask):
    b, nq, k = idx.shape
    ns, c = g.shape[1], g.shape[2]
    tile = _tile_for(nq, ns)
    iT, mT, nq0, nqp = _prep_iq(idx, mask, tile)
    dp_, _ = _pad_queries(d, tile)
    dT = jnp.swapaxes(dp_, 1, 2)  # [B, C, Nqp]
    ntile = nqp // tile
    kern = functools.partial(_mm_fwd_kernel, k=k, ns=ns)
    hmaxT, hminT = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[_gspec(ns, c), _qTspec(tile, c), _ispec(tile, k),
                  _ispec(tile, k)],
        out_specs=(_qTspec(tile, c), _qTspec(tile, c)),
        out_shape=(
            jax.ShapeDtypeStruct((b, c, nqp), jnp.float32),
            jax.ShapeDtypeStruct((b, c, nqp), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(g, dT, iT, mT)
    return (jnp.swapaxes(hmaxT, 1, 2)[:, :nq0],
            jnp.swapaxes(hminT, 1, 2)[:, :nq0])


def _mm_fwd(g, d, idx, mask):
    hmax, hmin = _mm_call(g, d, idx, mask)
    return (hmax, hmin), (g, d, idx, mask, hmax, hmin)


def _mm_bwd(res, dys):
    g, d, idx, mask, hmax, hmin = res
    dmax, dmin = dys
    b, nq, k = idx.shape
    ns, c = g.shape[1], g.shape[2]
    tile = _tile_for(nq, ns)
    iT, mT, _, nqp = _prep_iq(idx, mask, tile)

    def t_of(x):
        xp, _ = _pad_queries(x, tile)
        return jnp.swapaxes(xp, 1, 2)

    dT, hmaxT, hminT = t_of(d), t_of(hmax), t_of(hmin)
    dmaxT, dminT = t_of(dmax), t_of(dmin)
    ntile = nqp // tile
    kern = functools.partial(_mm_bwd_kernel, k=k, ns=ns)
    qT = _qTspec(tile, c)
    dg, ddT = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[_gspec(ns, c), qT, _ispec(tile, k), _ispec(tile, k),
                  qT, qT, qT, qT],
        out_specs=(_gspec(ns, c), qT),
        out_shape=(
            jax.ShapeDtypeStruct((b, ns, c), g.dtype),
            jax.ShapeDtypeStruct((b, c, nqp), d.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(g, dT, iT, mT, hmaxT, hminT, dmaxT, dminT)
    return dg, jnp.swapaxes(ddT, 1, 2)[:, :nq], None, None


gather_sub_minmax.defvjp(_mm_fwd, _mm_bwd)
