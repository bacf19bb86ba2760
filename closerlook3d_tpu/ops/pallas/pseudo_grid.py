"""Fused pseudo-grid (KPConv-style) correlation kernel.

Computes the kernel-point feature distribution without materializing
[B, Nq, K, C] or [B, Nq, K, Kp]:

    h[t, p, c] = Σ_k mask_k * infl(Δp_k, kp_p) * f[idx_k, c]
    infl linear:   max(0, 1 - |Δp - kp_p| / extent)
    infl constant: [|Δp - kp_p| <= extent]
    infl gaussian: exp(-|Δp - kp_p|² / (2 (0.3 extent)²))

SLOT-SPACE formulation: the Kp influence maps depend on Δp, which only
~k slots per query actually have — evaluating them densely over every
[cs, T] candidate pair (the round-2 multi-hot design) spent ~65% of the
kernel on VPU influence math for pairs the mask zeroes out. Instead,
per support chunk the kernel GATHERS slot neighbor positions and
features onto the occupancy-adaptive slot groups of gather_reduce
(one-hot MXU matmuls, exact for the 0/1 weights):

    dpg[d, k·T+t] = Σ_s oh[s, k·T+t] · sx[s, d]      (slot Δp sources)
    fg[c, k·T+t]  = Σ_s oh[s, k·T+t] · f[s, c]       (slot features)

and only THEN evaluates influence — once per tile, on the [Kp, g·T]
slot grid (vectorized over kernel points on sublanes), followed by the
per-(p, slot) combine h_p[c,t] += fg[c,k·T+t] · w[p,k·T+t]. Influence
work drops from O(Kp · chunks · cs · T) to O(Kp · occupancy · T); at
bench occupancy (2-6 of K=26-39) that is ~20x less VPU work, and the
gather matmuls ride the MXU. Dense tiles fall back to one wide one-hot
per chunk (same _slot_groups dispatch as the reduction kernels), where
the cost matches the old dense design. Duplicated valid indices occupy
separate slots and sum exactly as the reference's slot loop does.

The per-kernel-point weight matmul (h @ W) stays OUTSIDE in flax so W's
gradient is ordinary autodiff; this kernel is differentiable in the
features (custom VJP: slot-space dy distribution + one-hot scatter).

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
    _pad_queries,
    _pad_support,
    _tile_chunked,
)
from closerlook3d_tpu.ops.pallas.gather_reduce import (
    _KG,
    _kp_of,
    _prep_iq,
    _slot_groups,
)

_HI = jax.lax.Precision.HIGHEST


def _influence_rows(u, kp, extent: float, mode: str):
    """[Kp, W] influence from slot-space radius-normalized diffs.

    u: three [1, W] coordinate diffs ((support - query) / radius) on the
    slot grid; kp: [Kp, 3] kernel points. Rows vectorize the kernel
    points on sublanes — one d2/sqrt pass covers all Kp at once.
    Values for invalid slots are garbage-but-finite; the caller masks.
    """
    d2 = None
    for d in range(3):
        diff = u[d] - kp[:, d:d + 1]  # [Kp, W]
        d2 = diff * diff if d2 is None else d2 + diff * diff
    if mode == "linear":
        return jnp.maximum(1.0 - jnp.sqrt(d2) * (1.0 / extent), 0.0)
    if mode == "constant":
        return (d2 <= extent * extent).astype(jnp.float32)
    if mode == "gaussian":
        sig = 0.3 * extent
        return jnp.exp(-d2 * (1.0 / (2.0 * sig * sig)))
    raise ValueError(mode)


def _slot_u(dpg_ref, qT, gi: int, g: int, t: int, inv_r: float):
    """Slot-space (support - query)/radius rows for group gi: 3 x [1, g*T].

    dpg holds the one-hot-gathered support positions (exact: 0/1 weights,
    f32 HIGHEST accumulation), so these equal the old chunk-space dps at
    the surviving (s, t) pairs bit-for-bit.
    """
    sl0 = gi * g * t
    u = []
    for d in range(3):
        qtile = jnp.concatenate([qT[d:d + 1, :]] * g, axis=1)  # [1, g*T]
        u.append((dpg_ref[d:d + 1, sl0:sl0 + g * t] - qtile) * inv_r)
    return u


def _mask_row(maskT_ref, gi: int, g: int, t: int):
    """[1, g*T] validity row for slot group gi (k-major lane layout)."""
    return maskT_ref[0, pl.ds(gi * g, g), :].reshape(1, g * t) != 0


def _fwd_kernel(qxyzT_ref, sxyz_ref, feats_ref, idxT_ref, maskT_ref,
                kp_ref, flags_ref, out_ref, acc_ref, fg_ref, dpg_ref, *,
                k: int, ns: int, channels: int, kpn: int, radius: float,
                extent: float, mode: str):
    t = qxyzT_ref.shape[2]
    cs = min(ns, _NS_CHUNK)
    trow = pl.program_id(1) % 8
    hi = _hi_slot(maskT_ref, k, t)  # hoisted: tile-invariant
    qT = qxyzT_ref[0]  # [3, T]
    inv_r = 1.0 / radius
    g = _KG
    ngroups = k // g
    # bf16 features: bf16 x bf16 single-pass MXU gathers (one-hot rows
    # make each output a sum of <=1 product — exact in any precision,
    # but bf16 inputs round the VALUES, so f32 features keep HIGHEST)
    fprec = (_HI if feats_ref.dtype == jnp.float32
             else jax.lax.Precision.DEFAULT)

    # zero only the slot groups the tile occupies; groups >= hi are
    # never read back (the combine below is predicated the same way)
    for gi in range(ngroups):
        @pl.when(gi * g < hi)
        def _(gi=gi):
            sl0 = gi * g * t
            fg_ref[:, sl0:sl0 + g * t] = jnp.zeros(
                (channels, g * t), jnp.float32)
            dpg_ref[:, sl0:sl0 + g * t] = jnp.zeros(
                (dpg_ref.shape[0], g * t), jnp.float32)

    def chunk_body(j, _):
        ci = flags_ref[0, trow, j]  # packed active-chunk list
        start = ci * cs
        sx = sxyz_ref[0, pl.ds(start, cs), :]  # [cs, 3]
        fch = feats_ref[0, pl.ds(start, cs), :]  # [cs, C]

        def body_fn(base, gg, ohW, inkW):
            sl = slice(base * t, (base + gg) * t)
            fg_ref[:, sl] += jax.lax.dot_general(
                fch, ohW.astype(fch.dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=fprec)
            dpg_ref[0:3, sl] += jax.lax.dot_general(
                sx, ohW.astype(jnp.float32),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI)

        _slot_groups(idxT_ref, maskT_ref, k, cs, t, start, hi, body_fn)
        return 0

    jax.lax.fori_loop(0, flags_ref[0, trow, ns // cs], chunk_body, 0)

    acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)
    kp = kp_ref[0]  # [Kp, 3]
    for gi in range(ngroups):
        @pl.when(gi * g < hi)
        def _(gi=gi):
            sl0 = gi * g * t
            u = _slot_u(dpg_ref, qT, gi, g, t, inv_r)
            w = _influence_rows(u, kp, extent, mode)  # [Kp, g*T]
            w = jnp.where(_mask_row(maskT_ref, gi, g, t), w, 0.0)
            for kk in range(g):
                # slot-level predication: the combine is the tile's
                # biggest VPU loop (Kp x g FMAs); skip slots past the
                # tile's occupancy instead of multiplying by zero
                @pl.when(gi * g + kk < hi)
                def _(kk=kk):
                    for p in range(kpn):
                        acc_ref[p * channels:(p + 1) * channels, :] += (
                            fg_ref[:, sl0 + kk * t:sl0 + (kk + 1) * t]
                            * w[p:p + 1, kk * t:(kk + 1) * t])
    out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _bwd_kernel(qxyzT_ref, sxyz_ref, idxT_ref, maskT_ref, kp_ref, dyT_ref,
                flags_ref, dfeats_ref, dslot_ref, dpg_ref, *, k: int,
                ns: int, channels: int, kpn: int, radius: float,
                extent: float, mode: str):
    """df[s, c] = Σ_{(p,k,t): idx_k(t)=s} w_p(k,t) · dy[p·C+c, t].

    Two chunk passes: (1) one-hot-gather slot Δp sources, then per
    occupied group distribute dy onto slots (dslot[c, k·T+t] =
    Σ_p w[p,k·T+t] · dy[p·C+c, t]); (2) one-hot-scatter dslot back to
    support rows on the MXU (contraction over the slot-grid lanes).
    """
    tile = pl.program_id(1)
    t = qxyzT_ref.shape[2]
    cs = min(ns, _NS_CHUNK)
    trow = tile % 8
    hi = _hi_slot(maskT_ref, k, t)  # hoisted: tile-invariant
    qT = qxyzT_ref[0]
    inv_r = 1.0 / radius
    g = _KG
    ngroups = k // g
    dy = dyT_ref[0]  # [Kp*C, T]
    dprec = _HI if dy.dtype == jnp.float32 else jax.lax.Precision.DEFAULT

    @pl.when(tile == 0)
    def _():
        dfeats_ref[0] = jnp.zeros_like(dfeats_ref[0])

    for gi in range(ngroups):
        @pl.when(gi * g < hi)
        def _(gi=gi):
            sl0 = gi * g * t
            dpg_ref[:, sl0:sl0 + g * t] = jnp.zeros(
                (dpg_ref.shape[0], g * t), jnp.float32)
    # the dense-tile scatter below contracts the FULL slot grid, so
    # unoccupied columns must be zero, not uninitialized VMEM
    dslot_ref[...] = jnp.zeros(dslot_ref.shape, jnp.float32)

    def chunk_gather(j, _):
        ci = flags_ref[0, trow, j]
        start = ci * cs
        sx = sxyz_ref[0, pl.ds(start, cs), :]

        def body_fn(base, gg, ohW, inkW):
            dpg_ref[0:3, base * t:(base + gg) * t] += jax.lax.dot_general(
                sx, ohW.astype(jnp.float32),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI)

        _slot_groups(idxT_ref, maskT_ref, k, cs, t, start, hi, body_fn)
        return 0

    jax.lax.fori_loop(0, flags_ref[0, trow, ns // cs], chunk_gather, 0)

    kp = kp_ref[0]
    for gi in range(ngroups):
        @pl.when(gi * g < hi)
        def _(gi=gi):
            sl0 = gi * g * t
            u = _slot_u(dpg_ref, qT, gi, g, t, inv_r)
            w = _influence_rows(u, kp, extent, mode)
            w = jnp.where(_mask_row(maskT_ref, gi, g, t), w, 0.0)
            for kk in range(g):
                @pl.when(gi * g + kk < hi)  # skip unoccupied slots
                def _(kk=kk):
                    sl = slice(sl0 + kk * t, sl0 + (kk + 1) * t)
                    for p in range(kpn):
                        dslot_ref[:, sl] += (
                            dy[p * channels:(p + 1) * channels,
                               :].astype(jnp.float32)
                            * w[p:p + 1, kk * t:(kk + 1) * t])

    def chunk_scatter(j, _):
        ci = flags_ref[0, trow, j]
        start = ci * cs

        def body_fn(base, gg, ohW, inkW):
            ds = dslot_ref[:, base * t:(base + gg) * t]  # [C, gg*T]
            df = jax.lax.dot_general(
                ohW.astype(ds.dtype), ds,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=dprec)
            dfeats_ref[0, pl.ds(start, cs), :] += df.astype(
                dfeats_ref.dtype)

        _slot_groups(idxT_ref, maskT_ref, k, cs, t, start, hi, body_fn)
        return 0

    jax.lax.fori_loop(0, flags_ref[0, trow, ns // cs], chunk_scatter, 0)


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


def _specs(tile, ns, c, kh, kpn):
    qspec = pl.BlockSpec((1, 3, tile), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, ns, 3), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((1, ns, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    ispec = pl.BlockSpec((1, kh, tile), lambda bi, ti: (bi, 0, ti),
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
    kpn = kp.shape[0]
    # this kernel's slot-group layout ([K,T]->[1,K*T] reshapes in
    # _wide_onehot/_group_onehot/_mask_row) needs a lane-aligned
    # tile; tiny deep stages (folded nq < 128) must pad up to 128
    # or Mosaic rejects the shape cast (found by the round-5
    # parity probe at partseg stage 4: nq=2 x b=16 -> t=32)
    tile = max(128, _tile_chunked(nq))
    qp, nq0 = _pad_queries(query_xyz.astype(jnp.float32), tile)
    qT = jnp.swapaxes(qp, 1, 2)  # [B, 3, Nqp]
    iT, mT, _, nqp = _prep_iq(idx, mask, tile)  # slot-padded to _KG
    kh = iT.shape[1]
    ntile = nqp // tile
    cs = min(ns, _NS_CHUNK)
    kern = functools.partial(
        _fwd_kernel, k=kh, ns=ns, channels=c, kpn=kpn,
        radius=float(radius), extent=float(extent), mode=mode)
    qspec, sspec, fspec, ispec, kpspec, ospec = _specs(tile, ns, c, kh, kpn)
    outT = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[qspec, sspec, fspec, ispec, ispec, kpspec,
                  _lists_spec(ns // cs)],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((b, kpn * c, nqp), features.dtype),
        scratch_shapes=[
            pltpu.VMEM((kpn * c, tile), jnp.float32),
            pltpu.VMEM((c, kh * tile), jnp.float32),
            pltpu.VMEM((8, kh * tile), jnp.float32),
        ],
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
    ns0 = features.shape[1]
    sxyz0 = support_xyz
    support_xyz, features, _ = _pad_support(support_xyz, features)
    ns, c = features.shape[1], features.shape[2]
    kpn = kp.shape[0]
    tile = max(128, _tile_chunked(query_xyz.shape[1]))  # see _call
    qp, _ = _pad_queries(query_xyz.astype(jnp.float32), tile)
    qT = jnp.swapaxes(qp, 1, 2)
    iT, mT, _, nqp = _prep_iq(idx, mask, tile)
    kh = iT.shape[1]
    dyp, _ = _pad_queries(dy, tile)
    dyT = jnp.swapaxes(dyp, 1, 2)
    ntile = nqp // tile
    cs = min(ns, _NS_CHUNK)
    kern = functools.partial(
        _bwd_kernel, k=kh, ns=ns, channels=c, kpn=kpn,
        radius=float(radius), extent=float(extent), mode=mode)
    qspec, sspec, fspec, ispec, kpspec, ospec = _specs(tile, ns, c, kh, kpn)
    dfeats = pl.pallas_call(
        kern,
        grid=(b := query_xyz.shape[0], ntile),
        in_specs=[qspec, sspec, ispec, ispec, kpspec, ospec,
                  _lists_spec(ns // cs)],
        out_specs=fspec,
        out_shape=jax.ShapeDtypeStruct((b, ns, c), features.dtype),
        scratch_shapes=[
            pltpu.VMEM((c, kh * tile), jnp.float32),
            pltpu.VMEM((8, kh * tile), jnp.float32),
        ],
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
