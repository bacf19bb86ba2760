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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from closerlook3d_tpu.ops.pallas.aggregation import (
    _NS_CHUNK,
    _chunk_lists,
    _lists_spec,
    _gather_T,
    _hi_slot,
    _interpret,
    _multi_hot_chunk,
    _one_hot_chunk,
    _pad_queries,
    _pad_support,
    _row,
    _tile_chunked,
    _tile_for,
    _wide_onehot,
)

_HI = jax.lax.Precision.HIGHEST
_BIG = 3e38  # python float: jnp constants may not be closure-captured


_KG = int(os.environ.get("CL3D_KG", "8"))  # slot-group width for the grouped wide-onehot kernels


def _prep_iq(idx, mask, tile):
    """Pad queries to the tile and slots to a _KG multiple (padded slots
    carry mask 0 / idx 0, so they contribute nothing; the group loops
    need in-bounds [gi*_KG, gi*_KG+_KG) sublane slices)."""
    kpad = (-idx.shape[2]) % _KG
    if kpad:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, kpad)))
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, kpad)))
    ip, nq0 = _pad_queries(idx, tile)
    mp, _ = _pad_queries(mask, tile)
    iT = jnp.swapaxes(ip, 1, 2)  # [B, Kp, Nqp]
    mT = jnp.swapaxes(mp, 1, 2).astype(jnp.int32)
    return iT, mT, nq0, ip.shape[1]


def _kp_of(k: int) -> int:
    return k + (-k) % _KG


def _group_onehot(idxT_ref, maskT_ref, gi, cs: int, t: int, start):
    """One-hot [cs, _KG*T] for slot group gi (slots gi*_KG..+_KG) +
    in-chunk flags [1, _KG*T]. Same layout contract as _wide_onehot but
    built from a dynamic sublane slice of the [Kp, T] index block, so
    the caller can skip groups beyond the tile's true occupancy."""
    g = _KG
    rows = idxT_ref[0, pl.ds(gi * g, g), :]  # [G, T]
    msk = maskT_ref[0, pl.ds(gi * g, g), :]
    rowW = rows.reshape(1, g * t)
    mW = msk.reshape(1, g * t) != 0
    iota = jax.lax.broadcasted_iota(jnp.int32, (cs, g * t), 0) + start
    inkW = mW & (rowW >= start) & (rowW < start + cs)
    ohW = (iota == rowW) & mW
    return ohW, inkW


def _slot_groups(idxT_ref, maskT_ref, k: int, cs: int, t: int, start,
                 hi, body_fn):
    """Occupancy-adaptive slot iteration for the chunked gather kernels.

    body_fn(base, g, ohW, inkW) processes slots [base, base+g) of every
    query in the tile, given their k-major one-hot [cs, g*T] and
    in-chunk flags [1, g*T]. It MUST keep all state in scratch/output
    refs: both paths below are predicated branches, so nothing can flow
    through SSA values across calls. body_fn(0, ...) runs exactly once
    per chunk (first group / wide call), so write-on-base-0 is a valid
    per-chunk scratch reset.

    hi = _hi_slot(...): 1 + the highest valid slot over the tile.
    Dense tiles (hi > k/2) build ONE wide one-hot over all k slots and
    make a single matmul-sized call — per-launch overhead amortizes
    best. Sparse tiles run statically-unrolled _KG-slot groups and skip
    groups no query occupies: work tracks true occupancy, which at
    uniform-random bench geometry is 2-6 of K=26-39.
    """
    @pl.when(2 * hi > k)
    def _():
        ohW, inkW = _wide_onehot(idxT_ref, maskT_ref, k, cs, t, start)
        body_fn(0, k, ohW, inkW)

    @pl.when(2 * hi <= k)
    def _():
        for gi in range((k // 2 + _KG - 1) // _KG):
            @pl.when(gi * _KG < hi)
            def _(gi=gi):
                ohW, inkW = _group_onehot(idxT_ref, maskT_ref, gi, cs,
                                          t, start)
                body_fn(gi * _KG, _KG, ohW, inkW)


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


def _sum_fwd_kernel(feats_ref, idxT_ref, maskT_ref, flags_ref, out_ref,
                    acc_ref, *, k: int, ns: int):
    t = idxT_ref.shape[2]
    cs = min(ns, _NS_CHUNK)
    trow = pl.program_id(1) % 8
    hi = _hi_slot(maskT_ref, k, t)  # hoisted: tile-invariant
    acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    def chunk_body(j, _):
        ci = flags_ref[0, trow, j]  # packed active-chunk list

        start = ci * cs
        m = _multi_hot_chunk(idxT_ref, maskT_ref, k, cs, t, start,
                             hi)
        fch = feats_ref[0, pl.ds(start, cs), :]
        # bf16 features: single-pass bf16 MXU matmul (multi-hot
        # entries are small ints, exact in bf16; f32 accumulation)
        fprec = (_HI if fch.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
        acc_ref[...] = acc_ref[...] + jax.lax.dot_general(
            fch, m.astype(fch.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=fprec)
        return 0

    jax.lax.fori_loop(0, flags_ref[0, trow, ns // cs], chunk_body, 0)
    out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _sum_bwd_kernel(idxT_ref, maskT_ref, dyT_ref, flags_ref, dfeats_ref,
                    *, k: int, ns: int):
    tile = pl.program_id(1)
    t = idxT_ref.shape[2]
    cs = min(ns, _NS_CHUNK)
    trow = tile % 8
    hi = _hi_slot(maskT_ref, k, t)  # hoisted: tile-invariant

    @pl.when(tile == 0)
    def _():
        dfeats_ref[0] = jnp.zeros_like(dfeats_ref[0])

    dy = dyT_ref[0]
    dprec = (_HI if dy.dtype == jnp.float32
             else jax.lax.Precision.DEFAULT)

    def chunk_body(j, _):
        ci = flags_ref[0, trow, j]  # packed active-chunk list

        start = ci * cs
        m = _multi_hot_chunk(idxT_ref, maskT_ref, k, cs, t, start,
                             hi)
        df = jax.lax.dot_general(
            m.astype(dy.dtype), dy,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=dprec)
        dfeats_ref[0, pl.ds(start, cs), :] += df.astype(dfeats_ref.dtype)
        return 0

    jax.lax.fori_loop(0, flags_ref[0, trow, ns // cs], chunk_body, 0)


def neighborhood_sum(features, idx, mask):
    """[B, Nq, C] = Σ_k masked features[idx[.., k]]."""
    from closerlook3d_tpu.ops.pallas.aggregation import _fold_batch
    b, nq, k = idx.shape
    ns, c = features.shape[1], features.shape[2]
    if _fold_batch(nq, b):
        off = (jnp.arange(b, dtype=idx.dtype) * ns)[:, None, None]
        out = _sum_vjp(features.reshape(1, b * ns, c),
                       (idx + off).reshape(1, b * nq, k),
                       mask.reshape(1, b * nq, k))
        return out.reshape(b, nq, c)
    return _sum_vjp(features, idx, mask)


@jax.custom_vjp
def _sum_vjp(features, idx, mask):
    return _sum_call(features, idx, mask)


def _sum_call(features, idx, mask):
    b, nq, k = idx.shape
    _, features, _ = _pad_support(
        jnp.zeros((features.shape[0], features.shape[1], 3),
                  jnp.float32), features)
    ns, c = features.shape[1], features.shape[2]
    tile = _tile_chunked(nq)
    iT, mT, nq0, nqp = _prep_iq(idx, mask, tile)
    ntile = nqp // tile
    cs = min(ns, _NS_CHUNK)
    kern = functools.partial(_sum_fwd_kernel, k=k, ns=ns)
    outT = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[_gspec(ns, c), _ispec(tile, iT.shape[1]), _ispec(tile, iT.shape[1]),
                  _lists_spec(ns // cs)],
        out_specs=_qTspec(tile, c),
        out_shape=jax.ShapeDtypeStruct((b, c, nqp), features.dtype),
        scratch_shapes=[pltpu.VMEM((c, tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(features, iT, mT, _chunk_lists(idx, mask, tile, cs, ns // cs))
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
    tile = _tile_chunked(nq)
    iT, mT, _, nqp = _prep_iq(idx, mask, tile)
    dyp, _ = _pad_queries(dy, tile)
    dyT = jnp.swapaxes(dyp, 1, 2)
    ntile = nqp // tile
    cs = min(ns, _NS_CHUNK)
    kern = functools.partial(_sum_bwd_kernel, k=k, ns=ns)
    dfeats = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[_ispec(tile, iT.shape[1]), _ispec(tile, iT.shape[1]), _qTspec(tile, c),
                  _lists_spec(ns // cs)],
        out_specs=_gspec(ns, c),
        out_shape=jax.ShapeDtypeStruct((b, ns, c), features.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(iT, mT, dyT, _chunk_lists(idx, mask, tile, cs, ns // cs))
    return dfeats[:, :ns0], None, None


_sum_vjp.defvjp(_sum_fwd, _sum_bwd)


# --------------------------------------------------------------------------
# gather_sub_minmax
# --------------------------------------------------------------------------


def _mm_fwd_kernel(g_ref, dT_ref, idxT_ref, maskT_ref, flags_ref, max_ref,
                   min_ref, hmax_ref, hmin_ref, *, k: int, ns: int):
    t = idxT_ref.shape[2]
    cs = min(ns, _MAX_CS)
    trow = pl.program_id(1) % 8
    dT = dT_ref[0].astype(jnp.float32)  # [C, T]
    hmax_ref[...] = jnp.full(hmax_ref.shape, -_BIG, hmax_ref.dtype)
    hmin_ref[...] = jnp.full(hmin_ref.shape, _BIG, hmin_ref.dtype)
    hi = _hi_slot(maskT_ref, k, t)

    def chunk_body(j, _):
        ci = flags_ref[0, trow, j]  # packed active-chunk list

        start = ci * cs
        gch = g_ref[0, pl.ds(start, cs), :]  # [cs, C]
        fprec = (_HI if gch.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
        if t % 128 == 0:
            def body_fn(base, g, ohW, inkW):
                gfW = _gather_T(ohW.astype(gch.dtype), gch, fprec)
                hmax, hmin = hmax_ref[...], hmin_ref[...]
                for kk in range(g):
                    h = gfW[:, kk * t:(kk + 1) * t] - dT
                    ink = inkW[:, kk * t:(kk + 1) * t]
                    hmax = jnp.where(ink, jnp.maximum(hmax, h), hmax)
                    hmin = jnp.where(ink, jnp.minimum(hmin, h), hmin)
                hmax_ref[...], hmin_ref[...] = hmax, hmin

            _slot_groups(idxT_ref, maskT_ref, k, cs, t, start, hi,
                         body_fn)
        else:
            def body(kk, _):
                oh, ink = _one_hot_chunk(idxT_ref, maskT_ref, kk, cs,
                                         t, start)
                gf = _gather_T(oh.astype(gch.dtype), gch, fprec)
                h = gf - dT
                hmax_ref[...] = jnp.where(
                    ink, jnp.maximum(hmax_ref[...], h), hmax_ref[...])
                hmin_ref[...] = jnp.where(
                    ink, jnp.minimum(hmin_ref[...], h), hmin_ref[...])
                return 0

            jax.lax.fori_loop(0, hi, body, 0)
        return 0

    jax.lax.fori_loop(0, flags_ref[0, trow, ns // cs], chunk_body, 0)
    # empty neighborhoods -> 0, NOT the ±_BIG scratch sentinel: a
    # sentinel that escapes the kernel is one downstream multiply away
    # from overflow, and on TPU `0 * inf = NaN` in a masked cotangent
    # poisons entire backward dot_generals (found by the compiled-on-TPU
    # parity suite, VERDICT r4 item 1a — interpret/CPU associated the
    # same multiply differently and hid it)
    cnt = jnp.sum(maskT_ref[0].astype(jnp.float32), axis=0, keepdims=True)
    max_ref[0] = jnp.where(cnt > 0, hmax_ref[...], 0.0).astype(
        max_ref.dtype)
    min_ref[0] = jnp.where(cnt > 0, hmin_ref[...], 0.0).astype(
        min_ref.dtype)


def _mm_bwd_kernel(g_ref, dT_ref, idxT_ref, maskT_ref, hmaxT_ref,
                   hminT_ref, dmaxT_ref, dminT_ref, flags_ref, dg_ref,
                   ddT_ref, dd_ref, *, k: int, ns: int):
    tile = pl.program_id(1)
    t = idxT_ref.shape[2]
    cs = min(ns, _MAX_CS)
    trow = tile % 8
    dT = dT_ref[0].astype(jnp.float32)
    hmax = hmaxT_ref[0].astype(jnp.float32)
    hmin = hminT_ref[0].astype(jnp.float32)
    dmax = dmaxT_ref[0].astype(jnp.float32)
    dmin = dminT_ref[0].astype(jnp.float32)
    dd_ref[...] = jnp.zeros(dd_ref.shape, dd_ref.dtype)

    @pl.when(tile == 0)
    def _():
        dg_ref[0] = jnp.zeros_like(dg_ref[0])

    hi = _hi_slot(maskT_ref, k, t)

    def chunk_body(j, _):
        ci = flags_ref[0, trow, j]  # packed active-chunk list

        start = ci * cs
        gch = g_ref[0, pl.ds(start, cs), :]
        fprec = (_HI if gch.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
        c = dT.shape[0]
        if t % 128 == 0:
            def body_fn(base, g, ohW, inkW):
                ohWc = ohW.astype(gch.dtype)
                gfW = _gather_T(ohWc, gch, fprec)  # [C, G*T]
                parts = []
                for kk in range(g):
                    h = gfW[:, kk * t:(kk + 1) * t] - dT
                    inkf = inkW[:, kk * t:(kk + 1) * t].astype(
                        jnp.float32)
                    contrib = inkf * ((h == hmax) * dmax
                                      + (h == hmin) * dmin)  # [C, T]
                    dd_ref[...] = dd_ref[...] - contrib
                    parts.append(contrib.astype(gch.dtype))
                dgW = (parts[0] if g == 1
                       else jnp.concatenate(parts, axis=1))
                dg_ref[0, pl.ds(start, cs), :] += jax.lax.dot_general(
                    ohWc, dgW,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=fprec).astype(dg_ref.dtype)

            _slot_groups(idxT_ref, maskT_ref, k, cs, t, start, hi,
                         body_fn)
        else:
            def body(kk, dg):
                oh, ink = _one_hot_chunk(idxT_ref, maskT_ref, kk, cs,
                                         t, start)
                ohc = oh.astype(gch.dtype)
                gf = _gather_T(ohc, gch, fprec)
                h = gf - dT
                inkf = ink.astype(jnp.float32)
                contrib = inkf * ((h == hmax) * dmax
                                  + (h == hmin) * dmin)
                dd_ref[...] = dd_ref[...] - contrib
                return dg + jax.lax.dot_general(
                    ohc, contrib.astype(gch.dtype),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=fprec)

            dg = jax.lax.fori_loop(0, hi, body,
                                   jnp.zeros((cs, c), jnp.float32))
            dg_ref[0, pl.ds(start, cs), :] += dg.astype(dg_ref.dtype)
        return 0

    jax.lax.fori_loop(0, flags_ref[0, trow, ns // cs], chunk_body, 0)
    ddT_ref[0] = dd_ref[...].astype(ddT_ref.dtype)


def gather_sub_minmax(g, d, idx, mask):
    """See _gather_sub_minmax_vjp; folds batch at small nq."""
    from closerlook3d_tpu.ops.pallas.aggregation import _fold_batch
    b, nq, k = idx.shape
    ns, c = g.shape[1], g.shape[2]
    if _fold_batch(nq, b):
        off = (jnp.arange(b, dtype=idx.dtype) * ns)[:, None, None]
        hmax, hmin = _mm_vjp(g.reshape(1, b * ns, c),
                             d.reshape(1, b * nq, c),
                             (idx + off).reshape(1, b * nq, k),
                             mask.reshape(1, b * nq, k))
        return hmax.reshape(b, nq, c), hmin.reshape(b, nq, c)
    return _mm_vjp(g, d, idx, mask)


@jax.custom_vjp
def _mm_vjp(g, d, idx, mask):
    """(hmax, hmin) of h[t,k] = g[idx[t,k]] - d[t] over valid slots.

    g [B,Ns,C]; d [B,Nq,C]; idx [B,Nq,K] int32; mask [B,Nq,K] bool.
    Queries with no valid neighbor return 0 (same convention as
    neighborhood_max / ops.grouping.masked_max): the ±_BIG scratch
    sentinel must never escape the kernel — one downstream multiply
    overflows it to ±inf and a masked (0-valued) cotangent then turns
    into NaN on TPU, poisoning whole backward contractions.
    """
    return _mm_call(g, d, idx, mask)


def _mm_call(g, d, idx, mask):
    b, nq, k = idx.shape
    pad = (-g.shape[1]) % _MAX_CS
    if pad:
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
    ns, c = g.shape[1], g.shape[2]
    tile = _tile_chunked(nq)
    iT, mT, nq0, nqp = _prep_iq(idx, mask, tile)
    dp_, _ = _pad_queries(d, tile)
    dT = jnp.swapaxes(dp_, 1, 2)  # [B, C, Nqp]
    ntile = nqp // tile
    cs = min(ns, _MAX_CS)
    kern = functools.partial(_mm_fwd_kernel, k=k, ns=ns)
    hmaxT, hminT = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[_gspec(ns, c), _qTspec(tile, c), _ispec(tile, iT.shape[1]),
                  _ispec(tile, iT.shape[1]), _lists_spec(ns // cs)],
        out_specs=(_qTspec(tile, c), _qTspec(tile, c)),
        out_shape=(
            jax.ShapeDtypeStruct((b, c, nqp), jnp.float32),
            jax.ShapeDtypeStruct((b, c, nqp), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((c, tile), jnp.float32),
                        pltpu.VMEM((c, tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(g, dT, iT, mT, _chunk_lists(idx, mask, tile, cs, ns // cs))
    return (jnp.swapaxes(hmaxT, 1, 2)[:, :nq0],
            jnp.swapaxes(hminT, 1, 2)[:, :nq0])


def _mm_fwd(g, d, idx, mask):
    hmax, hmin = _mm_call(g, d, idx, mask)
    return (hmax, hmin), (g, d, idx, mask, hmax, hmin)


def _mm_bwd(res, dys):
    g, d, idx, mask, hmax, hmin = res
    dmax, dmin = dys
    b, nq, k = idx.shape
    ns0 = g.shape[1]
    pad = (-g.shape[1]) % _MAX_CS
    if pad:
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
    ns, c = g.shape[1], g.shape[2]
    tile = _tile_chunked(nq)
    iT, mT, _, nqp = _prep_iq(idx, mask, tile)

    def t_of(x):
        xp, _ = _pad_queries(x, tile)
        return jnp.swapaxes(xp, 1, 2)

    dT, hmaxT, hminT = t_of(d), t_of(hmax), t_of(hmin)
    dmaxT, dminT = t_of(dmax), t_of(dmin)
    ntile = nqp // tile
    cs = min(ns, _MAX_CS)
    kern = functools.partial(_mm_bwd_kernel, k=k, ns=ns)
    qT = _qTspec(tile, c)
    dg, ddT = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[_gspec(ns, c), qT, _ispec(tile, iT.shape[1]), _ispec(tile, iT.shape[1]),
                  qT, qT, qT, qT, _lists_spec(ns // cs)],
        out_specs=(_gspec(ns, c), qT),
        out_shape=(
            jax.ShapeDtypeStruct((b, ns, c), g.dtype),
            jax.ShapeDtypeStruct((b, c, nqp), d.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((c, tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(g, dT, iT, mT, hmaxT, hminT, dmaxT, dminT,
      _chunk_lists(idx, mask, tile, cs, ns // cs))
    return dg[:, :ns0], jnp.swapaxes(ddT, 1, 2)[:, :nq], None, None


_mm_vjp.defvjp(_mm_fwd, _mm_bwd)


# --------------------------------------------------------------------------
# neighborhood_max — fused gather + masked max (strided-shortcut pooling)
# --------------------------------------------------------------------------
#
# Parity: the reference's grouping + torch.max pooling over the strided
# neighborhood (SURVEY.md §2.3 N4; resnet strided-block shortcut). The
# jnp path (masked_max(group_features(...))) materializes [B,Nq,K,C] in
# HBM; this kernel keeps everything in VMEM. Gradient routes each
# query-channel's dy to the FIRST argmax slot in (chunk, k) order —
# torch's single-index max-backward semantics (jnp even-splits ties;
# identical for distinct values).
#
# Structure: ONE wide one-hot [cs, K*T] per chunk (k-major lanes, built
# in a single vectorized compare from the [K,T]->[1,K*T] reshaped index
# block) feeding ONE matmul [cs,C]x[cs,K*T] -> [C,K*T]; the per-slot
# [C,T] views are static lane slices (T is a 128 multiple). A per-k
# matmul formulation is MXU-launch-bound and measured ~2x slower.


# v5e sweep (seg step, bf16): 512 -> pwmlp 90.2 / pospool 68.0 ms,
# 256 -> 83.0 / 62.5, 128 -> 83.2 (pwmlp) — smaller chunks tighten the
# one-hot width against the Morton span; 256 balances per-chunk fixed
# costs. Env override for re-sweeps.
_MAX_CS = int(os.environ.get("CL3D_MAX_CS", "256"))


def _max_fwd_kernel(feats_ref, idxT_ref, maskT_ref, flags_ref, out_ref,
                    acc_ref, *, k: int, ns: int):
    t = idxT_ref.shape[2]
    cs = min(ns, _MAX_CS)
    trow = pl.program_id(1) % 8
    acc_ref[...] = jnp.full(acc_ref.shape, -_BIG, acc_ref.dtype)
    hi = _hi_slot(maskT_ref, k, t)

    def chunk_body(j, _):
        ci = flags_ref[0, trow, j]  # packed active-chunk list

        start = ci * cs
        fch = feats_ref[0, pl.ds(start, cs), :]
        # one-hot gathers are exact at ANY matmul precision (single
        # nonzero term, f32 accumulation); bf16 DEFAULT is 6x the
        # MXU rate of f32 HIGHEST
        prec = (_HI if fch.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        if t % 128 == 0:
            def body_fn(base, g, ohW, inkW):
                gW = _gather_T(ohW.astype(fch.dtype), fch, prec)
                acc = acc_ref[...]
                for kk in range(g):  # static lane slices
                    gf = gW[:, kk * t:(kk + 1) * t]
                    ink = inkW[:, kk * t:(kk + 1) * t]
                    acc = jnp.maximum(acc, jnp.where(ink, gf, -_BIG))
                acc_ref[...] = acc

            _slot_groups(idxT_ref, maskT_ref, k, cs, t, start, hi,
                         body_fn)
        else:
            def body(kk, _):
                oh, ink = _one_hot_chunk(idxT_ref, maskT_ref, kk, cs,
                                         t, start)
                gfT = _gather_T(oh.astype(fch.dtype), fch, prec)
                acc_ref[...] = jnp.maximum(
                    acc_ref[...], jnp.where(ink, gfT, -_BIG))
                return 0

            jax.lax.fori_loop(0, hi, body, 0)
        return 0

    jax.lax.fori_loop(0, flags_ref[0, trow, ns // cs], chunk_body, 0)
    # empty neighborhoods -> 0 (ops/grouping.masked_max convention)
    cnt = jnp.sum(maskT_ref[0].astype(jnp.float32), axis=0, keepdims=True)
    out_ref[0] = jnp.where(cnt > 0, acc_ref[...], 0.0)


def _max_fwd_arg_kernel(feats_ref, idxT_ref, maskT_ref, flags_ref,
                        out_ref, arg_ref, acc_ref, aacc_ref, *, k: int,
                        ns: int):
    """Forward used under autodiff: also emits the winning GLOBAL slot
    id (chunk*K + slot, f32, −1 when empty) per (channel, query), so the
    backward routes cotangents by one index compare per slot — no
    feature re-gather, no max-value residual. First strictly-greater
    wins, matching the previous first-wins equality routing."""
    t = idxT_ref.shape[2]
    cs = min(ns, _MAX_CS)
    trow = pl.program_id(1) % 8
    acc_ref[...] = jnp.full(acc_ref.shape, -_BIG, acc_ref.dtype)
    aacc_ref[...] = jnp.full(aacc_ref.shape, -1.0, aacc_ref.dtype)
    hi = _hi_slot(maskT_ref, k, t)

    def chunk_body(j, _):
        ci = flags_ref[0, trow, j]  # packed active-chunk list

        start = ci * cs
        fch = feats_ref[0, pl.ds(start, cs), :]
        prec = (_HI if fch.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        if t % 128 == 0:
            def body_fn(base, g, ohW, inkW):
                gW = _gather_T(ohW.astype(fch.dtype), fch, prec)
                acc, aarg = acc_ref[...], aacc_ref[...]
                for kk in range(g):
                    gf = gW[:, kk * t:(kk + 1) * t]
                    ink = inkW[:, kk * t:(kk + 1) * t]
                    gid = (ci * k + base + kk).astype(jnp.float32)
                    win = ink & (gf > acc)
                    acc = jnp.where(win, gf, acc)
                    aarg = jnp.where(win, gid, aarg)
                acc_ref[...] = acc
                aacc_ref[...] = aarg

            _slot_groups(idxT_ref, maskT_ref, k, cs, t, start, hi,
                         body_fn)
        else:
            def body(kk, _):
                oh, ink = _one_hot_chunk(idxT_ref, maskT_ref, kk, cs,
                                         t, start)
                gfT = _gather_T(oh.astype(fch.dtype), fch, prec)
                gid = (ci * k + kk).astype(jnp.float32)
                win = ink & (gfT > acc_ref[...])
                acc_ref[...] = jnp.where(win, gfT, acc_ref[...])
                aacc_ref[...] = jnp.where(win, gid, aacc_ref[...])
                return 0

            jax.lax.fori_loop(0, hi, body, 0)
        return 0

    jax.lax.fori_loop(0, flags_ref[0, trow, ns // cs], chunk_body, 0)
    cnt = jnp.sum(maskT_ref[0].astype(jnp.float32), axis=0, keepdims=True)
    out_ref[0] = jnp.where(cnt > 0, acc_ref[...], 0.0)
    arg_ref[0] = aacc_ref[...]


def _max_bwd_kernel(idxT_ref, maskT_ref, argT_ref, dyT_ref,
                    flags_ref, dfeats_ref, *, k: int, ns: int):
    tile = pl.program_id(1)
    t = idxT_ref.shape[2]
    cs = min(ns, _MAX_CS)
    trow = tile % 8

    @pl.when(tile == 0)
    def _():
        dfeats_ref[0] = jnp.zeros_like(dfeats_ref[0])

    mdt = dfeats_ref.dtype
    prec = _HI if mdt == jnp.float32 else jax.lax.Precision.DEFAULT
    dy = dyT_ref[0].astype(mdt)  # [C, T]
    aarg = argT_ref[0]  # [C, T] f32 global winning slot ids
    hi = _hi_slot(maskT_ref, k, t)

    def chunk_body(j, _):
        ci = flags_ref[0, trow, j]  # packed active-chunk list

        start = ci * cs
        if t % 128 == 0:
            def body_fn(base, g, ohW, inkW):
                ohWc = ohW.astype(mdt)
                # winner ids are globally unique, so one compare
                # routes the cotangent; slots won by other chunks
                # match nothing
                parts = []
                for kk in range(g):
                    gid = (ci * k + base + kk).astype(jnp.float32)
                    parts.append(dy * (aarg == gid).astype(mdt))
                dgW = (parts[0] if g == 1
                       else jnp.concatenate(parts, axis=1))
                dfeats_ref[0, pl.ds(start, cs), :] += (
                    jax.lax.dot_general(
                        ohWc, dgW,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec).astype(dfeats_ref.dtype))

            _slot_groups(idxT_ref, maskT_ref, k, cs, t, start, hi,
                         body_fn)
        else:
            def body(kk, df):
                oh, _ = _one_hot_chunk(idxT_ref, maskT_ref, kk, cs,
                                       t, start)
                gid = (ci * k + kk).astype(jnp.float32)
                return df + jax.lax.dot_general(
                    oh.astype(mdt), dy * (aarg == gid).astype(mdt),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec)

            df = jax.lax.fori_loop(
                0, hi, body, jnp.zeros((cs, dfeats_ref.shape[2]),
                                       jnp.float32))
            dfeats_ref[0, pl.ds(start, cs), :] += df.astype(
                dfeats_ref.dtype)
        return 0

    jax.lax.fori_loop(0, flags_ref[0, trow, ns // cs], chunk_body, 0)


def neighborhood_max(features, idx, mask):
    """[B, Nq, C] = max_k masked features[idx[.., k]] (empty -> 0)."""
    from closerlook3d_tpu.ops.pallas.aggregation import _fold_batch
    b, nq, k = idx.shape
    ns, c = features.shape[1], features.shape[2]
    if _fold_batch(nq, b):
        off = (jnp.arange(b, dtype=idx.dtype) * ns)[:, None, None]
        out = _max_vjp(features.reshape(1, b * ns, c),
                       (idx + off).reshape(1, b * nq, k),
                       mask.reshape(1, b * nq, k))
        return out.reshape(b, nq, c)
    return _max_vjp(features, idx, mask)


@jax.custom_vjp
def _max_vjp(features, idx, mask):
    out, _ = _max_call(features, idx, mask)
    return out


def _max_call(features, idx, mask):
    b, nq, k = idx.shape
    dtype = features.dtype
    pad = (-features.shape[1]) % _MAX_CS
    if pad:
        features = jnp.pad(features, ((0, 0), (0, pad), (0, 0)))
    ns, c = features.shape[1], features.shape[2]
    tile = _tile_chunked(nq)
    iT, mT, nq0, nqp = _prep_iq(idx, mask, tile)
    ntile = nqp // tile
    cs = min(ns, _MAX_CS)
    kern = functools.partial(_max_fwd_kernel, k=k, ns=ns)
    outT = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[_gspec(ns, c), _ispec(tile, iT.shape[1]), _ispec(tile, iT.shape[1]),
                  _lists_spec(ns // cs)],
        out_specs=_qTspec(tile, c),
        out_shape=jax.ShapeDtypeStruct((b, c, nqp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(features, iT, mT, _chunk_lists(idx, mask, tile, cs, ns // cs))
    return jnp.swapaxes(outT, 1, 2)[:, :nq0].astype(dtype), outT


def _max_fwd(features, idx, mask):
    b, nq, k = idx.shape
    dtype = features.dtype
    fp = features
    pad = (-features.shape[1]) % _MAX_CS
    if pad:
        fp = jnp.pad(fp, ((0, 0), (0, pad), (0, 0)))
    ns, c = fp.shape[1], fp.shape[2]
    tile = _tile_chunked(nq)
    iT, mT, nq0, nqp = _prep_iq(idx, mask, tile)
    ntile = nqp // tile
    cs = min(ns, _MAX_CS)
    kern = functools.partial(_max_fwd_arg_kernel, k=k, ns=ns)
    outT, argT = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[_gspec(ns, c), _ispec(tile, iT.shape[1]), _ispec(tile, iT.shape[1]),
                  _lists_spec(ns // cs)],
        out_specs=(_qTspec(tile, c), _qTspec(tile, c)),
        out_shape=(jax.ShapeDtypeStruct((b, c, nqp), jnp.float32),
                   jax.ShapeDtypeStruct((b, c, nqp), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((c, tile), jnp.float32),
                        pltpu.VMEM((c, tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(fp, iT, mT, _chunk_lists(idx, mask, tile, cs, ns // cs))
    out = jnp.swapaxes(outT, 1, 2)[:, :nq0].astype(dtype)
    # features rides along only for its static shape/dtype — the bwd
    # kernel never reads it (argmax routing), so no HBM traffic
    return out, (features, idx, mask, argT)


def _max_bwd(res, dy):
    features, idx, mask, argT = res
    fdtype = features.dtype
    b, nq, k = idx.shape
    ns0 = features.shape[1]
    ns = ns0 + (-ns0) % _MAX_CS
    c = features.shape[2]
    tile = _tile_chunked(nq)
    iT, mT, _, nqp = _prep_iq(idx, mask, tile)
    dyp, _ = _pad_queries(dy, tile)
    dyT = jnp.swapaxes(dyp, 1, 2)
    ntile = nqp // tile
    cs = min(ns, _MAX_CS)
    kern = functools.partial(_max_bwd_kernel, k=k, ns=ns)
    dfeats = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[_ispec(tile, iT.shape[1]), _ispec(tile, iT.shape[1]),
                  _qTspec(tile, c), _qTspec(tile, c),
                  _lists_spec(ns // cs)],
        out_specs=_gspec(ns, c),
        out_shape=jax.ShapeDtypeStruct((b, ns, c), fdtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(iT, mT, argT, dyT,
      _chunk_lists(idx, mask, tile, cs, ns // cs))
    return dfeats[:, :ns0], None, None


_max_vjp.defvjp(_max_fwd, _max_bwd)


# --------------------------------------------------------------------------
# pwmlp_minmax_stats — fused train-path kernel (minmax + BN statistics)
# --------------------------------------------------------------------------
#
# The query-side term of h[t,k] = g[idx[t,k]] - d[t] is constant over k,
# so it commutes out of max/min: the kernel reduces pure g-space gathers
# and the caller applies "- d" outside. That lets ONE kernel produce
#   gmax/gmin = masked max/min_k g[idx]   (0 when empty)
#   s1 = Σ_k g[idx],  s2 = Σ_k g²[idx]    (masked-BN statistics)
# from a single wide one-hot build + g load per chunk — the separate
# neighborhood_sum + gather_sub_minmax pair built the one-hot twice and
# launched twice per direction. g² is a separate input so the gather
# matmul stays C channels wide; its cotangent flows back to g through
# autodiff of the caller's g*g. s1 costs no extra matmul (sum of the
# already-gathered per-slot views); s2 is one multi-hot matmul whose
# multi-hot is K lane-slice adds of the wide one-hot.
# Tie semantics in bwd: the FIRST extremal slot (chunk-then-slot order)
# receives the full cotangent — the fwd records the winning global slot
# id and the bwd routes by one index compare per slot, so no feature
# re-gather is needed (ties are measure-zero for continuous features).


def pwmlp_minmax_stats(g, gsq, idx, mask):
    """(gmax, gmin, s1, s2), each [B, Nq, C] f32; folds batch at small
    nq like the other index-addressed kernels."""
    b, nq, k = idx.shape
    ns, c = g.shape[1], g.shape[2]
    if _tile_chunked(nq if not _needs_fold(nq, b) else b * nq) % 128:
        # tiny-tile fallback (never hit at production shapes): compose
        # from the existing primitives
        s = neighborhood_sum(jnp.concatenate([g, gsq], axis=-1), idx,
                             mask)
        z = jnp.zeros((b, nq, c), g.dtype)
        hmax, hmin = gather_sub_minmax(g, z, idx, mask)
        return hmax, hmin, s[..., :c], s[..., c:]
    if _needs_fold(nq, b):
        off = (jnp.arange(b, dtype=idx.dtype) * ns)[:, None, None]
        outs = _pwstats_vjp(g.reshape(1, b * ns, c),
                            gsq.reshape(1, b * ns, c),
                            (idx + off).reshape(1, b * nq, k),
                            mask.reshape(1, b * nq, k))
        return tuple(o.reshape(b, nq, c) for o in outs)
    return _pwstats_vjp(g, gsq, idx, mask)


def _needs_fold(nq: int, b: int) -> bool:
    from closerlook3d_tpu.ops.pallas.aggregation import _fold_batch
    return _fold_batch(nq, b)


def _pwstats_fwd_kernel(g_ref, gsq_ref, idxT_ref, maskT_ref, flags_ref,
                        max_ref, min_ref, s1_ref, s2_ref, amax_ref,
                        amin_ref, hmax_ref, hmin_ref, s1a_ref, s2a_ref,
                        amaxa_ref, amina_ref, m_ref, *, k: int, ns: int):
    t = idxT_ref.shape[2]
    cs = min(ns, _MAX_CS)
    trow = pl.program_id(1) % 8
    hmax_ref[...] = jnp.full(hmax_ref.shape, -_BIG, hmax_ref.dtype)
    hmin_ref[...] = jnp.full(hmin_ref.shape, _BIG, hmin_ref.dtype)
    s1a_ref[...] = jnp.zeros(s1a_ref.shape, s1a_ref.dtype)
    s2a_ref[...] = jnp.zeros(s2a_ref.shape, s2a_ref.dtype)
    amaxa_ref[...] = jnp.full(amaxa_ref.shape, -1.0, amaxa_ref.dtype)
    amina_ref[...] = jnp.full(amina_ref.shape, -1.0, amina_ref.dtype)

    hi = _hi_slot(maskT_ref, k, t)

    def chunk_body(j, _):
        ci = flags_ref[0, trow, j]  # packed active-chunk list

        start = ci * cs
        gch = g_ref[0, pl.ds(start, cs), :]
        qch = gsq_ref[0, pl.ds(start, cs), :]
        fprec = (_HI if gch.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
        def body_fn(base, g, ohW, inkW):
            ohWc = ohW.astype(gch.dtype)
            gfW = _gather_T(ohWc, gch, fprec)  # [C, G*T] f32
            hmax, hmin = hmax_ref[...], hmin_ref[...]
            amax, amin = amaxa_ref[...], amina_ref[...]
            s1 = s1a_ref[...]
            m = ohWc[:, 0:t]
            for kk in range(g):
                gf = gfW[:, kk * t:(kk + 1) * t]
                ink = inkW[:, kk * t:(kk + 1) * t]
                gid = (ci * k + base + kk).astype(jnp.float32)
                # strict compares keep the FIRST extremum: the
                # winning global slot id routes the backward
                winx = ink & (gf > hmax)
                hmax = jnp.where(winx, gf, hmax)
                amax = jnp.where(winx, gid, amax)
                winn = ink & (gf < hmin)
                hmin = jnp.where(winn, gf, hmin)
                amin = jnp.where(winn, gid, amin)
                s1 = s1 + gf  # masked one-hot: invalid adds 0
                if kk:
                    m = m + ohWc[:, kk * t:(kk + 1) * t]
            hmax_ref[...], hmin_ref[...] = hmax, hmin
            amaxa_ref[...], amina_ref[...] = amax, amin
            s1a_ref[...] = s1
            if base == 0:  # first call per chunk: scratch reset
                m_ref[...] = m.astype(m_ref.dtype)
            else:
                m_ref[...] += m.astype(m_ref.dtype)

        _slot_groups(idxT_ref, maskT_ref, k, cs, t, start, hi,
                     body_fn)
        # ONE s2 matmul per chunk over the accumulated multi-hot
        s2a_ref[...] = s2a_ref[...] + jax.lax.dot_general(
            qch, m_ref[...].astype(qch.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=fprec)
        return 0

    jax.lax.fori_loop(0, flags_ref[0, trow, ns // cs], chunk_body, 0)
    # empty neighborhoods -> 0 (same sentinel-escape rationale as
    # _mm_fwd_kernel); the backward routes by the ±1-initialized slot
    # ids, which never match, so it needs no change
    cnt = jnp.sum(maskT_ref[0].astype(jnp.float32), axis=0, keepdims=True)
    max_ref[0] = jnp.where(cnt > 0, hmax_ref[...], 0.0)
    min_ref[0] = jnp.where(cnt > 0, hmin_ref[...], 0.0)
    s1_ref[0] = s1a_ref[...]
    s2_ref[0] = s2a_ref[...]
    amax_ref[0] = amaxa_ref[...]
    amin_ref[0] = amina_ref[...]


def _pwstats_bwd_kernel(idxT_ref, maskT_ref, amaxT_ref, aminT_ref,
                        dmaxT_ref, dminT_ref, ds1T_ref, ds2T_ref,
                        flags_ref, dg_ref, dq_ref, m_ref, *, k: int,
                        ns: int):
    tile = pl.program_id(1)
    t = idxT_ref.shape[2]
    cs = min(ns, _MAX_CS)
    trow = tile % 8
    mdt = dg_ref.dtype
    fprec = _HI if mdt == jnp.float32 else jax.lax.Precision.DEFAULT
    amax = amaxT_ref[0]  # [C, T] f32 global winning slot ids
    amin = aminT_ref[0]
    dmax = dmaxT_ref[0].astype(mdt)
    dmin = dminT_ref[0].astype(mdt)

    @pl.when(tile == 0)
    def _():
        dg_ref[0] = jnp.zeros_like(dg_ref[0])
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    hi = _hi_slot(maskT_ref, k, t)

    def chunk_body(j, _):
        ci = flags_ref[0, trow, j]  # packed active-chunk list

        start = ci * cs
        ds1 = ds1T_ref[0].astype(mdt)  # [C, T]
        ds2 = ds2T_ref[0].astype(mdt)

        def body_fn(base, g, ohW, inkW):
            ohWc = ohW.astype(mdt)
            # winner ids are globally unique: one compare per
            # extremum routes the cotangent — no feature re-gather
            parts = []
            m = ohWc[:, 0:t]
            for kk in range(g):
                gid = (ci * k + base + kk).astype(jnp.float32)
                contrib = (dmax * (amax == gid).astype(mdt)
                           + dmin * (amin == gid).astype(mdt))
                parts.append(contrib)
                if kk:
                    m = m + ohWc[:, kk * t:(kk + 1) * t]
            dgW = (parts[0] if g == 1
                   else jnp.concatenate(parts, axis=1))
            dg_ref[0, pl.ds(start, cs), :] += jax.lax.dot_general(
                ohWc, dgW, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=fprec).astype(dg_ref.dtype)
            if base == 0:  # first call per chunk: scratch reset
                m_ref[...] = m
            else:
                m_ref[...] += m

        _slot_groups(idxT_ref, maskT_ref, k, cs, t, start, hi,
                     body_fn)
        m = m_ref[...]
        dg_ref[0, pl.ds(start, cs), :] += jax.lax.dot_general(
            m, ds1, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=fprec).astype(dg_ref.dtype)
        dq_ref[0, pl.ds(start, cs), :] += jax.lax.dot_general(
            m, ds2, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=fprec).astype(dq_ref.dtype)
        return 0

    jax.lax.fori_loop(0, flags_ref[0, trow, ns // cs], chunk_body, 0)


@jax.custom_vjp
def _pwstats_vjp(g, gsq, idx, mask):
    out, _ = _pwstats_call(g, gsq, idx, mask)
    return out


def _pwstats_call(g, gsq, idx, mask):
    b, nq, k = idx.shape
    pad = (-g.shape[1]) % _MAX_CS
    if pad:
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
        gsq = jnp.pad(gsq, ((0, 0), (0, pad), (0, 0)))
    ns, c = g.shape[1], g.shape[2]
    tile = _tile_chunked(nq)
    iT, mT, nq0, nqp = _prep_iq(idx, mask, tile)
    ntile = nqp // tile
    cs = min(ns, _MAX_CS)
    kern = functools.partial(_pwstats_fwd_kernel, k=k, ns=ns)
    qT = _qTspec(tile, c)
    outs = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[_gspec(ns, c), _gspec(ns, c), _ispec(tile, iT.shape[1]),
                  _ispec(tile, iT.shape[1]), _lists_spec(ns // cs)],
        out_specs=(qT, qT, qT, qT, qT, qT),
        out_shape=tuple(
            jax.ShapeDtypeStruct((b, c, nqp), jnp.float32)
            for _ in range(6)),
        scratch_shapes=[pltpu.VMEM((c, tile), jnp.float32)
                        for _ in range(6)]
        + [pltpu.VMEM((cs, tile), g.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(g, gsq, iT, mT, _chunk_lists(idx, mask, tile, cs, ns // cs))
    return (tuple(jnp.swapaxes(o, 1, 2)[:, :nq0] for o in outs[:4]),
            (outs[4], outs[5]))


def _pwstats_fwd(g, gsq, idx, mask):
    out, (amaxT, aminT) = _pwstats_call(g, gsq, idx, mask)
    # g rides along only for its static shape/dtype — the bwd kernel
    # never reads it (argmax routing)
    return out, (g, idx, mask, amaxT, aminT)


def _pwstats_bwd(res, dys):
    g, idx, mask, amaxT, aminT = res
    dmax, dmin, ds1, ds2 = dys
    b, nq, k = idx.shape
    ns0 = g.shape[1]
    ns = ns0 + (-ns0) % _MAX_CS
    c = g.shape[2]
    tile = _tile_chunked(nq)
    iT, mT, _, nqp = _prep_iq(idx, mask, tile)

    def t_of(x):
        xp, _ = _pad_queries(x, tile)
        return jnp.swapaxes(xp, 1, 2)

    dmaxT, dminT, ds1T, ds2T = t_of(dmax), t_of(dmin), t_of(ds1), t_of(ds2)
    ntile = nqp // tile
    cs = min(ns, _MAX_CS)
    kern = functools.partial(_pwstats_bwd_kernel, k=k, ns=ns)
    qT = _qTspec(tile, c)
    dg, dq = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[_ispec(tile, iT.shape[1]), _ispec(tile, iT.shape[1]),
                  qT, qT, qT, qT, qT, qT, _lists_spec(ns // cs)],
        out_specs=(_gspec(ns, c), _gspec(ns, c)),
        out_shape=(
            jax.ShapeDtypeStruct((b, ns, c), g.dtype),
            jax.ShapeDtypeStruct((b, ns, c), g.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((cs, tile), g.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(iT, mT, amaxT, aminT, dmaxT, dminT, ds1T, ds2T,
      _chunk_lists(idx, mask, tile, cs, ns // cs))
    return dg[:, :ns0], dq[:, :ns0], None, None


_pwstats_vjp.defvjp(_pwstats_fwd, _pwstats_bwd)
