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
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from closerlook3d_tpu.ops.pallas.aggregation import (
    _interpret,
    _pack_chunk_lists,
    _pad_queries,
    _tile_for,
)

_HI = jax.lax.Precision.HIGHEST
_BIG = 1e10


def _bq_kernel(qxyz_ref, sxyzt_ref, qmask_ref, smask_ref, *rest,
               k: int, ns: int, radius: float, folded: bool = False):
    if folded:
        qb_ref, sb_ref, idx_ref, nmask_ref = rest
    else:
        idx_ref, nmask_ref = rest
    t = qxyz_ref.shape[1]
    q = qxyz_ref[0]  # [T, 3] f32
    st = sxyzt_ref[0]  # [3, Ns] f32
    # exact f32 outer-difference on the VPU: the 3-wide MXU contraction
    # pads to 128 and runs 6 HIGHEST passes — ~5x the work
    d2 = None
    for d in range(3):
        diff = q[:, d:d + 1] - st[d:d + 1, :]  # [T, Ns]
        d2 = diff * diff if d2 is None else d2 + diff * diff
    d2 = d2 + jnp.where(smask_ref[0], 0.0, _BIG)  # [1, Ns] broadcast
    if folded:
        # batch-folded tiles mix clouds on the lanes: exclude cross-
        # batch pairs exactly (coordinate-offset tricks would cost f32
        # bits; one [T, Ns] compare costs ~1 extraction pass)
        d2 = d2 + jnp.where(qb_ref[0] == sb_ref[0], 0.0, _BIG)

    iota_ns = jax.lax.broadcasted_iota(jnp.int32, (t, ns), 1)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (t, k), 1)
    r2 = radius * radius
    qvalid = qmask_ref[0]  # [T, 1] bool

    def cond(carry):
        kk, go, *_ = carry
        return (kk < k) & go

    def body(carry):
        kk, _, d2, out_idx, out_valid = carry
        dmin = jnp.min(d2, axis=1, keepdims=True)  # [T, 1]
        # first (lowest-index) argmin, as the jnp top_k tiebreak
        cand = jnp.where(d2 == dmin, iota_ns, ns)
        cur = jnp.min(cand, axis=1, keepdims=True)  # [T, 1] int32
        ok = ((dmin <= r2) & qvalid).astype(jnp.int32)  # [T, 1]
        sel_k = (iota_k == kk).astype(jnp.int32)
        out_idx = out_idx + cur * sel_k
        out_valid = out_valid + ok * sel_k  # int32 carry: bool carries
        d2 = jnp.where(iota_ns == cur, _BIG, d2)  # fail scf legalization
        # EXACT early exit: once no query has an in-radius minimum,
        # every later slot is invalid and gets shadow-padded to slot 0
        # anyway — extracting it cannot change any output
        go = jnp.any(dmin <= r2)
        return kk + 1, go, d2, out_idx, out_valid

    # while (not unrolled): Mosaic keeps every unrolled iteration's
    # [T, Ns] temporaries live on the VMEM stack otherwise
    _, _, d2, out_idx, out_valid = jax.lax.while_loop(
        cond, body,
        (0, True, d2, jnp.zeros((t, k), jnp.int32),
         jnp.zeros((t, k), jnp.int32)))
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
    if (b > 1 and nq < 128 and b * ns <= 8192
            and os.environ.get("CL3D_BQ_FOLD", "1") == "1"):
        # deep-stage shapes (nq 8-88) leave 30-70% of the 128 lanes and
        # all but one grid step idle; fold batch into the query lanes
        # with an exact in-kernel batch guard (selection and tiebreaks
        # are batch-local and index-order-preserving, so outputs match
        # the unfolded kernel exactly)
        return _bq_folded(query_xyz, support_xyz, radius, nsample,
                          query_mask, support_mask)
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
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(qp, sxt, qmp, smp)
    return idx[:, :nq0], nmask[:, :nq0]


def _bq_folded(query_xyz, support_xyz, radius: float, nsample: int,
               query_mask, support_mask) -> Tuple[jax.Array, jax.Array]:
    """Batch-folded small-stage ball query (see dispatch above)."""
    b, nq, _ = query_xyz.shape
    ns = support_xyz.shape[1]
    nf, nsf = b * nq, b * ns
    qf = query_xyz.reshape(1, nf, 3).astype(jnp.float32)
    sf = support_xyz.reshape(1, nsf, 3).astype(jnp.float32)
    qmf = query_mask.reshape(1, nf)
    smf = support_mask.reshape(1, nsf)
    qb = jnp.repeat(jnp.arange(b, dtype=jnp.int32), nq).reshape(1, nf)
    sb = jnp.repeat(jnp.arange(b, dtype=jnp.int32), ns).reshape(1, nsf)
    tile = _tile_for(nf, nsf)
    qp, _ = _pad_queries(qf, tile)
    qmp, _ = _pad_queries(qmf[..., None], tile)
    qbp, _ = _pad_queries(qb[..., None], tile)
    ntile = qp.shape[1] // tile
    sxt = jnp.swapaxes(sf, 1, 2)  # [1, 3, Nsf]

    kern = functools.partial(_bq_kernel, k=nsample, ns=nsf,
                             radius=float(radius), folded=True)
    idx, nmask = pl.pallas_call(
        kern,
        grid=(1, ntile),
        in_specs=[
            pl.BlockSpec((1, tile, 3), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, nsf), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nsf), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nsf), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, nsample), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, nsample), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, qp.shape[1], nsample), jnp.int32),
            jax.ShapeDtypeStruct((1, qp.shape[1], nsample), jnp.bool_),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(qp, sxt, qmp, smf[:, None, :], qbp, sb[:, None, :])
    # folded indices are batch*ns + local; a query whose batch has no
    # valid support argmins into batch 0 (all-BIG row) — clamp keeps
    # the (masked-false) value in range like the unfolded kernel
    idx = jnp.clip(idx[:, :nf] - qb[..., None] * ns, 0, ns - 1)
    return (idx.reshape(b, nq, nsample),
            nmask[:, :nf].reshape(b, nq, nsample))


# --------------------------------------------------------------------------
# Chunk-skipping ball query (Morton-sorted clouds)
# --------------------------------------------------------------------------
#
# With spatially sorted support (data/spatial_host.morton_sort_batch and
# ops/sampling.grid_subsample both emit Z-order), each 512-point support
# chunk occupies a compact bbox. A query tile's in-radius neighbors can
# only live in chunks whose bbox is within `radius` of the tile's bbox,
# which is 1-4 of 30 chunks at S3DIS scale — the kernel skips the rest.
# Exact for every in-radius neighbor (bbox distance lower-bounds point
# distance); only the shadow index of all-invalid rows may differ from
# the unchunked kernel (it is still a valid point index, which is all
# downstream consumers rely on). Unsorted inputs stay correct and merely
# skip fewer chunks.

_BQ_CS = int(os.environ.get("CL3D_BQ_CS", "512"))  # support chunk
# (v5e sweep at S3DIS stage-0: 512 beats 256/128 — smaller chunks cost
# more merges than their tighter bboxes and narrower scans save)


def _bq_bbox_flags(qp, qmp, sp, smp, tile: int, cs: int, radius: float):
    """[B, ntile(pad8), C] int32: may support chunk c contain a point
    within `radius` of any valid query in tile t? (bbox lower bound)"""
    b, nqp, _ = qp.shape
    ntile = nqp // tile
    big = jnp.float32(1e9)
    q = qp.reshape(b, ntile, tile, 3)
    qm = qmp.reshape(b, ntile, tile, 1)
    qmin = jnp.min(jnp.where(qm, q, big), axis=2)  # [B, ntile, 3]
    qmax = jnp.max(jnp.where(qm, q, -big), axis=2)
    c = sp.shape[1] // cs
    s = sp.reshape(b, c, cs, 3)
    sm = smp.reshape(b, c, cs, 1)
    smin = jnp.min(jnp.where(sm, s, big), axis=2)  # [B, C, 3]
    smax = jnp.max(jnp.where(sm, s, -big), axis=2)
    gap = jnp.maximum(qmin[:, :, None] - smax[:, None],
                      smin[:, None] - qmax[:, :, None])
    gap = jnp.clip(gap, 0.0, big)  # empty tile/chunk -> 2e9 -> inactive
    d2 = jnp.sum(gap * gap, axis=-1)  # [B, ntile, C]
    r2 = jnp.float32(radius) * jnp.float32(radius)
    flags = (d2 <= r2 * 1.0001 + 1e-9).astype(jnp.int32)
    pad = (-ntile) % 8
    if pad:
        flags = jnp.pad(flags, ((0, 0), (0, pad), (0, 0)))
    return flags


def _bq_chunked_kernel(qxyzT_ref, sxyz_ref, qmaskT_ref, flags_ref,
                       idx_ref, nmask_ref, rd2_ref, ridx_ref, comb_ref,
                       pidx_ref, *, k: int, cs: int, nchunks: int,
                       radius: float):
    """Transposed orientation (slots on sublanes, queries on lanes).

    Distances are [cs, T] VPU outer-differences — a 4-wide MXU
    contraction pads to 128 and runs 6 HIGHEST passes, ~5x the work —
    and the running list is [KP, T] with KP = k rounded to the f32
    sublane granule (8), so the merge concat needs no 128-lane-group
    padding at all (w = KP+cs vs 128+cs). The extraction loop carries
    only scalars: the [w, T] candidate buffer and the previous index
    list live in scratch refs mutated in place — carrying comb_d
    (~280 KB f32) through lax.while_loop copied it every iteration.
    """
    t = qxyzT_ref.shape[2]
    qT = qxyzT_ref[0]  # [3, T] f32
    trow = pl.program_id(1) % 8
    kp = (k + 7) // 8 * 8
    w = kp + cs
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (kp, t), 0)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, t), 0)
    rd2_ref[...] = jnp.full((kp, t), _BIG, jnp.float32)
    ridx_ref[...] = jnp.zeros((kp, t), jnp.int32)

    def chunk_body(j, _):
        ci = flags_ref[0, trow, j]  # packed active-chunk list

        start = ci * cs
        sx = sxyz_ref[0, pl.ds(start, cs), :]  # [cs, 3]
        d2c = None  # exact f32 outer-difference, all VPU
        for d in range(3):
            diff = sx[:, d:d + 1] - qT[d:d + 1, :]  # [cs, T]
            d2c = diff * diff if d2c is None else d2c + diff * diff
        r2 = radius * radius
        # per-query best candidate this chunk; bbox pruning is a
        # lower bound, so chunks can pass the flag yet hold nothing
        # in radius for any query -> skip the merge outright
        cmin = jnp.min(d2c, axis=0, keepdims=True)  # [1, T]

        @pl.when(jnp.min(cmin) <= r2)
        def _merge():
            rd2 = rd2_ref[...]  # [KP, T]
            prev_i = ridx_ref[...]
            # running-list prefix already better than anything this
            # chunk offers keeps its slots: skip those passes (cuts
            # the re-extraction cost from ~K per chunk to ~#new)
            keep = jnp.min(
                jnp.sum((rd2 < cmin).astype(jnp.int32), axis=0))
            comb_ref[...] = jnp.where(
                iota_w < keep, _BIG,
                jnp.concatenate([rd2, d2c], axis=0))
            pidx_ref[...] = prev_i  # old list; ridx mutates below
            rd2_ref[...] = jnp.where(iota_k < keep, rd2, _BIG)
            ridx_ref[...] = jnp.where(iota_k < keep, prev_i, 0)

            def cond(carry):
                kk, go = carry
                return (kk < k) & go

            def body(carry):
                kk, _ = carry
                comb_d = comb_ref[...]
                dmin = jnp.min(comb_d, axis=0, keepdims=True)
                # lowest-position tiebreak == lowest-index (rd2
                # entries precede the chunk, insertion-ordered)
                pos = jnp.min(jnp.where(comb_d == dmin, iota_w, w),
                              axis=0, keepdims=True)
                # merged index: old-list slot (from the preserved
                # copy) or a chunk candidate (position-derived)
                vprev = jnp.sum(
                    jnp.where(iota_k == pos, pidx_ref[...], 0),
                    axis=0, keepdims=True)
                vi = jnp.where(pos < kp, vprev, pos - kp + start)
                sel_k = iota_k == kk
                # unconditional writes: slot 0 must hold the
                # NEAREST index even out of radius (the shadow-pad
                # convention), and validity is re-derived from
                # rd2 <= r2 at the end
                rd2_ref[...] = jnp.where(sel_k, dmin, rd2_ref[...])
                ridx_ref[...] = jnp.where(sel_k, vi, ridx_ref[...])
                comb_ref[...] = jnp.where(iota_w == pos, _BIG,
                                          comb_d)
                # once every query's minimum is out of radius,
                # further slots can only be invalid (then shadow-
                # padded): stop. Work tracks real neighbor counts.
                return kk + 1, jnp.any(dmin <= r2)

            jax.lax.while_loop(cond, body, (keep, True))
        return 0

    jax.lax.fori_loop(0, flags_ref[0, trow, nchunks], chunk_body, 0)

    r2 = radius * radius
    qvalid = qmaskT_ref[0]  # [1, T] bool
    out_valid = (rd2_ref[...] <= r2) & qvalid  # [KP, T]
    out_idx = ridx_ref[...]
    first = out_idx[0:1, :]
    idx_ref[0] = jnp.where(out_valid, out_idx, first)
    nmask_ref[0] = out_valid


@functools.partial(jax.jit, static_argnames=("radius", "nsample"))
def ball_query_pallas_chunked(query_xyz, support_xyz, radius: float,
                              nsample: int, query_mask=None,
                              support_mask=None) -> Tuple[jax.Array,
                                                          jax.Array]:
    """Chunk-skipping drop-in for ball_query at large support sizes."""
    b, nq, _ = query_xyz.shape
    ns = support_xyz.shape[1]
    if query_mask is None:
        query_mask = jnp.ones((b, nq), bool)
    if support_mask is None:
        support_mask = jnp.ones((b, ns), bool)
    cs = _BQ_CS
    tile = _tile_chunked_bq(nq)
    qp, nq0 = _pad_queries(query_xyz.astype(jnp.float32), tile)
    qmp, _ = _pad_queries(query_mask[..., None], tile)
    # invalid/padded queries sit far away so they never look in-radius
    # (they would otherwise stall the kernel's early-exit loop)
    qp = jnp.where(qmp, qp, 1e7)
    ntile = qp.shape[1] // tile
    # pad support to a chunk multiple; sentinel invalid coords far away
    # so they are never within radius (and bboxes ignore them)
    sx = support_xyz.astype(jnp.float32)
    pad = (-ns) % cs
    if pad:
        sx = jnp.pad(sx, ((0, 0), (0, pad), (0, 0)))
        support_mask = jnp.pad(support_mask, ((0, 0), (0, pad)))
    sx = jnp.where(support_mask[..., None], sx, 1e6)
    nsp = sx.shape[1]
    flags = _pack_chunk_lists(_bq_bbox_flags(
        qp, qmp, sx, support_mask[..., None], tile, cs, radius))
    qT = jnp.swapaxes(qp, 1, 2)  # [B, 3, Nqp]
    qmT = jnp.swapaxes(qmp, 1, 2)  # [B, 1, Nqp]
    kp = (nsample + 7) // 8 * 8

    kern = functools.partial(_bq_chunked_kernel, k=nsample, cs=cs,
                             nchunks=nsp // cs, radius=float(radius))
    idxT, nmaskT = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[
            pl.BlockSpec((1, 3, tile), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nsp, 3), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, nsp // cs + 1), lambda bi, ti: (bi, ti // 8, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, kp, tile), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp, tile), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, kp, qp.shape[1]), jnp.int32),
            jax.ShapeDtypeStruct((b, kp, qp.shape[1]), jnp.bool_),
        ),
        scratch_shapes=[
            pltpu.VMEM((kp, tile), jnp.float32),
            pltpu.VMEM((kp, tile), jnp.int32),
            pltpu.VMEM((kp + cs, tile), jnp.float32),
            pltpu.VMEM((kp, tile), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(qT, sx, qmT, flags)
    return (jnp.swapaxes(idxT, 1, 2)[:, :nq0, :nsample],
            jnp.swapaxes(nmaskT, 1, 2)[:, :nq0, :nsample])


def _tile_chunked_bq(nq: int) -> int:
    """Query tile for the chunked kernel: liveness is [T, cs], so the
    tile no longer depends on the support size. Smaller tiles give
    tighter bboxes (fewer active chunks) at more grid steps."""
    nq_pow = 1 << (nq - 1).bit_length()
    return max(8, min(_BQ_TILE, nq_pow))


# TPU sweep (S3DIS stage-0, 4x15360, K=26): tile 128 + cs 512 won on
# both uniform and surface-like clouds; smaller chunks lose to per-chunk
# fixed cost, larger tiles to looser bboxes.
_BQ_TILE = int(os.environ.get("CL3D_BQ_TILE", "128"))


# --------------------------------------------------------------------------
# Chunk-skipping 1-NN (decoder upsample indices)
# --------------------------------------------------------------------------
#
# No radius to prune with, so the bound is geometric: every query in a
# tile has SOME support within ub = min over nonempty chunks of the
# farthest tile-box/chunk-box distance; chunks whose nearest-box
# distance exceeds ub cannot hold any query's 1-NN. With sorted inputs
# that leaves 1-3 active chunks of 30 at S3DIS scale. Exact.


def _knn1_bbox_flags(qp, qmp, sp, smp, tile: int, cs: int):
    b, nqp, _ = qp.shape
    ntile = nqp // tile
    big = jnp.float32(1e9)
    q = qp.reshape(b, ntile, tile, 3)
    qm = qmp.reshape(b, ntile, tile, 1)
    qmin = jnp.min(jnp.where(qm, q, big), axis=2)
    qmax = jnp.max(jnp.where(qm, q, -big), axis=2)
    c = sp.shape[1] // cs
    s = sp.reshape(b, c, cs, 3)
    sm = smp.reshape(b, c, cs, 1)
    smin = jnp.min(jnp.where(sm, s, big), axis=2)
    smax = jnp.max(jnp.where(sm, s, -big), axis=2)
    lo = jnp.clip(jnp.maximum(qmin[:, :, None] - smax[:, None],
                              smin[:, None] - qmax[:, :, None]), 0.0, big)
    lo2 = jnp.sum(lo * lo, axis=-1)  # [B, ntile, C] nearest-box dist^2
    hi = jnp.maximum(jnp.maximum(qmax[:, :, None] - smin[:, None],
                                 smax[:, None] - qmin[:, :, None]), 0.0)
    hi = jnp.clip(hi, 0.0, big)
    hi2 = jnp.sum(hi * hi, axis=-1)  # farthest-box dist^2
    empty = jnp.any(smin > smax, axis=-1)  # [B, C] no valid points
    hi2 = jnp.where(empty[:, None, :], jnp.float32(4e18), hi2)
    ub = jnp.min(hi2, axis=-1, keepdims=True)  # [B, ntile, 1]
    flags = (lo2 <= ub * 1.0001 + 1e-9).astype(jnp.int32)
    pad = (-ntile) % 8
    if pad:
        flags = jnp.pad(flags, ((0, 0), (0, pad), (0, 0)))
    return flags


def _knn1_chunked_kernel(qxyzT_ref, sxyz_ref, flags_ref, idx_ref, d2_ref,
                         bd_ref, bi_ref, *, cs: int, nchunks: int):
    """Transposed orientation: distances live as [cs, T] VPU
    outer-differences (no MXU matmul — a 4-wide contraction pads to 128
    and runs 6 passes at HIGHEST; the outer-difference is exact f32 at
    ~5x less work), reductions run along sublanes."""
    t = qxyzT_ref.shape[2]
    qT = qxyzT_ref[0]  # [3, T]
    trow = pl.program_id(1) % 8
    iota_cs = jax.lax.broadcasted_iota(jnp.int32, (cs, t), 0)
    bd_ref[...] = jnp.full((1, t), _BIG, jnp.float32)
    bi_ref[...] = jnp.zeros((1, t), jnp.int32)

    def chunk_body(j, _):
        ci = flags_ref[0, trow, j]  # packed active-chunk list

        start = ci * cs
        sx = sxyz_ref[0, pl.ds(start, cs), :]  # [cs, 3]
        d2c = None
        for d in range(3):
            diff = sx[:, d:d + 1] - qT[d:d + 1, :]  # [cs, T]
            d2c = diff * diff if d2c is None else d2c + diff * diff
        cmin = jnp.min(d2c, axis=0, keepdims=True)  # [1, T]
        cand = jnp.min(jnp.where(d2c == cmin, iota_cs + start,
                                 jnp.int32(2**30)),
                       axis=0, keepdims=True)
        # strict < keeps the earlier (lower-index) chunk on ties
        upd = cmin < bd_ref[...]
        bi_ref[...] = jnp.where(upd, cand, bi_ref[...])
        bd_ref[...] = jnp.where(upd, cmin, bd_ref[...])
        return 0

    jax.lax.fori_loop(0, flags_ref[0, trow, nchunks], chunk_body, 0)
    idx_ref[0] = bi_ref[...]
    d2_ref[0] = bd_ref[...]


@jax.jit
def knn1_pallas_chunked(query_xyz, support_xyz, query_mask=None,
                        support_mask=None) -> Tuple[jax.Array, jax.Array]:
    """Chunk-skipping 1-NN: (idx, dist2), each [B, Nq, 1]."""
    b, nq, _ = query_xyz.shape
    ns = support_xyz.shape[1]
    if query_mask is None:
        query_mask = jnp.ones((b, nq), bool)
    if support_mask is None:
        support_mask = jnp.ones((b, ns), bool)
    cs = _BQ_CS
    tile = _tile_chunked_bq(nq)
    qp, nq0 = _pad_queries(query_xyz.astype(jnp.float32), tile)
    qmp, _ = _pad_queries(query_mask[..., None], tile)
    qp = jnp.where(qmp, qp, 1e7)
    ntile = qp.shape[1] // tile
    sx = support_xyz.astype(jnp.float32)
    pad = (-ns) % cs
    if pad:
        sx = jnp.pad(sx, ((0, 0), (0, pad), (0, 0)))
        support_mask = jnp.pad(support_mask, ((0, 0), (0, pad)))
    sx = jnp.where(support_mask[..., None], sx, 1e6)
    nsp = sx.shape[1]
    flags = _pack_chunk_lists(_knn1_bbox_flags(
        qp, qmp, sx, support_mask[..., None], tile, cs))
    qT = jnp.swapaxes(qp, 1, 2)  # [B, 3, Nqp]

    kern = functools.partial(_knn1_chunked_kernel, cs=cs,
                             nchunks=nsp // cs)
    idxT, d2T = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[
            pl.BlockSpec((1, 3, tile), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nsp, 3), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, nsp // cs + 1), lambda bi, ti: (bi, ti // 8, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, tile), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, qp.shape[1]), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, qp.shape[1]), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, tile), jnp.float32),
            pltpu.VMEM((1, tile), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(qT, sx, flags)
    return (jnp.swapaxes(idxT, 1, 2)[:, :nq0],
            jnp.swapaxes(d2T, 1, 2)[:, :nq0])


def _knn_kernel(qxyz_ref, sxyzt_ref, smask_ref, idx_ref, d2_ref,
                *, k: int, ns: int):
    t = qxyz_ref.shape[1]
    q = qxyz_ref[0]
    st = sxyzt_ref[0]
    d2 = None  # exact f32 outer-difference, all VPU (see _bq_kernel)
    for d in range(3):
        diff = q[:, d:d + 1] - st[d:d + 1, :]  # [T, Ns]
        d2 = diff * diff if d2 is None else d2 + diff * diff
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
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(qp, sxt, smp)
    return idx[:, :nq0], d2[:, :nq0]
