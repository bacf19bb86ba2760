"""Fused pseudo-grid (KPConv-style) correlation kernel.

Computes the kernel-point feature distribution without materializing
[B, Nq, K, C] or [B, Nq, K, Kp]:

    h[t, p, c] = Σ_k mask_k * infl(Δp_k, kp_p) * f[idx_k, c]
    infl linear:   max(0, 1 - |Δp - kp_p| / extent)
    infl constant: [|Δp - kp_p| <= extent]
    infl gaussian: exp(-|Δp - kp_p|² / (2 (0.3 extent)²))

FACTORIZED formulation (the pospool-xyz trick extended to kernel
points): the influence depends on (support s, query t) only through
Δp(s,t) — never on the neighbor slot k — so the slot sum collapses
into the masked multi-hot M[s,t] = Σ_k mask_k·[idx_k(t)=s]:

    h[p*C+c, t] = Σ_s (M[s,t] · infl_p(s,t)) · f[s, c]

Per support chunk that is ONE multi-hot build (k cheap compares) plus,
per kernel point, a [cs,T] influence map and a single [C,cs]x[cs,T]
MXU matmul — replacing the old per-slot gathers × per-kernel-point VPU
products (k·Kp elementwise [C,T] ops). Duplicated valid indices sum in
M exactly as they do in the reference's slot loop.

The per-kernel-point weight matmul (h @ W) stays OUTSIDE in flax so W's
gradient is ordinary autodiff; this kernel is differentiable in the
features (custom VJP: the transposed influence-weighted matmuls).

Transposed layout (channels/kernel-points on sublanes, queries on
lanes) shared with the rest of ops/pallas; output is [B, Kp*C, Nq]
(p-major rows, matching the jnp path's reshape) transposed once outside.
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
    _lists_spec,
    _interpret,
    _multi_hot_chunk,
    _pad_queries,
    _pad_support,
    _prep_tq,
    _tile_chunked,
)

_HI = jax.lax.Precision.HIGHEST


def _influence_cs(dps, kp_ref, p: int, extent: float, mode: str):
    """[cs, T] influence of kernel point p from per-coord outer diffs.

    dps: three [cs, T] radius-normalized coordinate differences
    (support s minus query t). Values for non-neighbor (s, t) pairs are
    garbage-but-finite; the multi-hot zeroes them out.
    """
    d2 = None
    for dim in range(3):
        diff = dps[dim] - kp_ref[0, p, dim]
        d2 = diff * diff if d2 is None else d2 + diff * diff
    if mode == "linear":
        return jnp.maximum(1.0 - jnp.sqrt(d2) * (1.0 / extent), 0.0)
    if mode == "constant":
        return (d2 <= extent * extent).astype(jnp.float32)
    if mode == "gaussian":
        sig = 0.3 * extent
        return jnp.exp(-d2 * (1.0 / (2.0 * sig * sig)))
    raise ValueError(mode)


def _fwd_kernel(qxyzT_ref, sxyz_ref, feats_ref, idxT_ref, maskT_ref,
                kp_ref, flags_ref, out_ref, acc_ref, *, k: int, ns: int,
                channels: int, kpn: int, radius: float, extent: float,
                mode: str):
    t = qxyzT_ref.shape[2]
    cs = min(ns, _NS_CHUNK)
    trow = pl.program_id(1) % 8
    hi = _hi_slot(maskT_ref, k, t)  # hoisted: tile-invariant
    qT = qxyzT_ref[0]
    inv_r = 1.0 / radius
    acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    def chunk_body(j, _):
        ci = flags_ref[0, trow, j]  # packed active-chunk list

        start = ci * cs
        m = _multi_hot_chunk(idxT_ref, maskT_ref, k, cs, t, start,
                             hi)
        sx = sxyz_ref[0, pl.ds(start, cs), :]  # [cs, 3]
        fch = feats_ref[0, pl.ds(start, cs), :]
        # bf16 features: bf16 x bf16 single-pass MXU matmuls (the
        # influence weights tolerate bf16 like every other bf16 op);
        # f32 features keep full precision (parity tests).
        fprec = (_HI if fch.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
        dps = [(sx[:, d:d + 1] - qT[d:d + 1, :]) * inv_r
               for d in range(3)]  # 3 x [cs, T]
        # stack the Kp influence-weighted multi-hots along lanes
        # (T is a 128 multiple, so the concat is alignment-free)
        # and run ONE [cs,C]x[cs,Kp*T] MXU matmul — Kp separate
        # matmuls are launch-bound
        w = jnp.concatenate(
            [m * _influence_cs(dps, kp_ref, p, extent, mode)
             for p in range(kpn)], axis=1)  # [cs, Kp*T]
        outW = jax.lax.dot_general(
            fch, w.astype(fch.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=fprec)  # [C, Kp*T]
        for p in range(kpn):
            acc_ref[p * channels:(p + 1) * channels, :] += (
                outW[:, p * t:(p + 1) * t])
        return 0

    jax.lax.fori_loop(0, flags_ref[0, trow, ns // cs], chunk_body, 0)
    out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _bwd_kernel(qxyzT_ref, sxyz_ref, idxT_ref, maskT_ref, kp_ref, dyT_ref,
                flags_ref, dfeats_ref, *, k: int, ns: int, channels: int,
                kpn: int, radius: float, extent: float, mode: str):
    tile = pl.program_id(1)
    t = qxyzT_ref.shape[2]
    cs = min(ns, _NS_CHUNK)
    trow = tile % 8
    hi = _hi_slot(maskT_ref, k, t)  # hoisted: tile-invariant
    qT = qxyzT_ref[0]
    inv_r = 1.0 / radius
    dy = dyT_ref[0]  # [Kp*C, T]
    dprec = _HI if dy.dtype == jnp.float32 else jax.lax.Precision.DEFAULT

    @pl.when(tile == 0)
    def _():
        dfeats_ref[0] = jnp.zeros_like(dfeats_ref[0])

    def chunk_body(j, _):
        ci = flags_ref[0, trow, j]  # packed active-chunk list

        start = ci * cs
        m = _multi_hot_chunk(idxT_ref, maskT_ref, k, cs, t, start,
                             hi)
        sx = sxyz_ref[0, pl.ds(start, cs), :]
        dps = [(sx[:, d:d + 1] - qT[d:d + 1, :]) * inv_r
               for d in range(3)]
        # same stacking as the forward: one [cs,Kp*T]x[C,Kp*T]
        # contraction over Kp*T instead of Kp launch-bound matmuls
        w = jnp.concatenate(
            [m * _influence_cs(dps, kp_ref, p, extent, mode)
             for p in range(kpn)], axis=1)  # [cs, Kp*T]
        dyW = jnp.concatenate(
            [dy[p * channels:(p + 1) * channels, :]
             for p in range(kpn)], axis=1)  # [C, Kp*T]
        df = jax.lax.dot_general(
            w.astype(dy.dtype), dyW,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=dprec)
        dfeats_ref[0, pl.ds(start, cs), :] += df.astype(dfeats_ref.dtype)
        return 0

    jax.lax.fori_loop(0, flags_ref[0, trow, ns // cs], chunk_body, 0)


def pseudo_grid_fused(query_xyz, support_xyz, features, idx, mask, kp,
                      radius, extent: float, mode: str):
    from closerlook3d_tpu.ops.pallas.aggregation import _fold_batch
    b, nq, k = idx.shape
    ns, c = features.shape[1], features.shape[2]
    if _fold_batch(nq, b):
        off = (jnp.arange(b, dtype=idx.dtype) * ns)[:, None, None]
        out = _pg_vjp(
            query_xyz.reshape(1, b * nq, 3),
            support_xyz.reshape(1, b * ns, 3),
            features.reshape(1, b * ns, c),
            (idx + off).reshape(1, b * nq, k),
            mask.reshape(1, b * nq, k), kp, radius, extent, mode)
        return out.reshape(b, nq, -1)
    return _pg_vjp(query_xyz, support_xyz, features, idx, mask, kp,
                   radius, extent, mode)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _pg_vjp(query_xyz, support_xyz, features, idx, mask, kp,
                      radius: float, extent: float, mode: str = "linear"):
    """[B, Nq, Kp*C] kernel-point distributed features (p-major).

    kp: [Kp, 3] rigid kernel-point layout (radius-normalized units).
    Differentiable in features only.
    """
    return _call(query_xyz, support_xyz, features, idx, mask, kp, radius,
                 extent, mode)


def _specs(tile, ns, c, k, kpn):
    qspec = pl.BlockSpec((1, 3, tile), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, ns, 3), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((1, ns, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    ispec = pl.BlockSpec((1, k, tile), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM)
    kpspec = pl.BlockSpec((1, kpn, 3), lambda bi, ti: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, kpn * c, tile), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM)
    return qspec, sspec, fspec, ispec, kpspec, ospec


def _call(query_xyz, support_xyz, features, idx, mask, kp, radius,
          extent, mode):
    b, nq, _ = query_xyz.shape
    support_xyz, features, _ = _pad_support(support_xyz, features)
    ns, c = features.shape[1], features.shape[2]
    k = idx.shape[2]
    kpn = kp.shape[0]
    tile = _tile_chunked(nq)
    qT, iT, mT, nq0, nqp = _prep_tq(query_xyz, idx, mask, tile)
    ntile = nqp // tile
    cs = min(ns, _NS_CHUNK)
    kern = functools.partial(
        _fwd_kernel, k=k, ns=ns, channels=c, kpn=kpn,
        radius=float(radius), extent=float(extent), mode=mode)
    qspec, sspec, fspec, ispec, kpspec, ospec = _specs(tile, ns, c, k, kpn)
    outT = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[qspec, sspec, fspec, ispec, ispec, kpspec,
                  _lists_spec(ns // cs)],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((b, kpn * c, nqp), features.dtype),
        scratch_shapes=[pltpu.VMEM((kpn * c, tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(qT, support_xyz.astype(jnp.float32), features, iT, mT,
      kp.astype(jnp.float32)[None],
      _chunk_lists(idx, mask, tile, cs, ns // cs))
    return jnp.swapaxes(outT, 1, 2)[:, :nq0]


def _fwd(query_xyz, support_xyz, features, idx, mask, kp, radius, extent,
         mode):
    out = _call(query_xyz, support_xyz, features, idx, mask, kp, radius,
                extent, mode)
    return out, (query_xyz, support_xyz, features, idx, mask, kp)


def _bwd(radius, extent, mode, res, dy):
    query_xyz, support_xyz, features, idx, mask, kp = res
    b = query_xyz.shape[0]
    ns0 = features.shape[1]
    sxyz0 = support_xyz
    support_xyz, features, _ = _pad_support(support_xyz, features)
    ns, c = features.shape[1], features.shape[2]
    k = idx.shape[2]
    kpn = kp.shape[0]
    tile = _tile_chunked(query_xyz.shape[1])
    qT, iT, mT, _, nqp = _prep_tq(query_xyz, idx, mask, tile)
    dyp, _ = _pad_queries(dy, tile)
    dyT = jnp.swapaxes(dyp, 1, 2)
    ntile = nqp // tile
    cs = min(ns, _NS_CHUNK)
    kern = functools.partial(
        _bwd_kernel, k=k, ns=ns, channels=c, kpn=kpn,
        radius=float(radius), extent=float(extent), mode=mode)
    qspec, sspec, fspec, ispec, kpspec, ospec = _specs(tile, ns, c, k, kpn)
    dfeats = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[qspec, sspec, ispec, ispec, kpspec, ospec,
                  _lists_spec(ns // cs)],
        out_specs=fspec,
        out_shape=jax.ShapeDtypeStruct((b, ns, c), features.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(qT, support_xyz.astype(jnp.float32), iT, mT,
      kp.astype(jnp.float32)[None], dyT,
      _chunk_lists(idx, mask, tile, cs, ns // cs))
    return (jnp.zeros_like(query_xyz), jnp.zeros_like(sxyz0),
            dfeats[:, :ns0], None, None, jnp.zeros_like(kp))


_pg_vjp.defvjp(_fwd, _bwd)
