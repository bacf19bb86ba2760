"""Fused PosPool aggregation kernels (gather -> Δp encode -> masked reduce).

Replaces the reference's 3-kernel CUDA sequence (group_points -> operator
math -> reduction; SURVEY.md §3.2 "THE kernel to fuse on TPU") with one
Pallas program per query tile. Nothing [B,N,K,C]-shaped ever touches HBM.

Layout rule (shared by every kernel in this package): per-tile values
are TRANSPOSED — channels/coords on sublanes, queries on lanes — so that

  * the masked multi-hot / one-hot matrices are [Ns, T] (built by a
    fori_loop over the K slots with dynamic SUBLANE slices of the
    transposed [K, T] index block — lane-dynamic slicing is unsupported
    and unrolled loops explode Mosaic's VMEM liveness);
  * every gather is a dot_general contracting the Ns axis
    ([Ns,C] x [Ns,T] -> [C,T]);
  * per-slot masks are [1, T] rows that broadcast over sublanes;
  * outputs leave the kernel as [B, C, Nq] and are transposed once by
    XLA outside.

Two formulations, chosen by position-embedding mode:

* ``xyz`` — fully factorized:
    y[c in group d, t] = (1/cnt_t) * Σ_s M_T[s,t] * Δ_d[s,t] * f[s,c]
  with M_T the masked multi-hot and Δ_d[s,t] = (sxyz[s,d]-qxyz[t,d])/r
  an outer-difference broadcast: three [Ns,C/3]x[Ns,T] matmuls, K times
  fewer MACs than gathering, no coordinate gather at all.
* ``sin_cos`` — per-slot fori loop: one-hot gathers of features+coords
  (exact: single 1.0*value products), sinusoidal encode, masked
  accumulate.

Backward passes are the transposed matmuls (scatter-add onto support
features), accumulated across query tiles in the output block.

Precision notes (hard-won, see tests):
* f32 MXU matmuls default to bf16 passes — HIGHEST wherever f32
  operands carry real precision (Δ matrices, f32 features);
* Mosaic rejects HIGHEST on bf16 operands — bf16 one-hot gathers are
  exact anyway.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST
# support-axis chunk for the multi-hot kernels: the one-hot build cost
# per query tile scales with (active chunks) x chunk size, and with
# Morton-sorted inputs a tile's neighbors span a short index range, so
# smaller chunks do strictly less VPU work (until per-chunk fixed costs
# bite). v5e sweep on the S3DIS seg step (4x15360, bf16):
# 2048 -> 357 ms/step, 512 -> 215, 256 -> 160, 128 -> 108, 64 -> 109.
# Env override for benchmarking.
_NS_CHUNK = int(os.environ.get("CL3D_NS_CHUNK", "128"))


def _pad_support(support_xyz, features):
    """Pad the support axis to a _NS_CHUNK multiple (indices in idx are
    always < ns, so padded rows never match any one-hot)."""
    ns = support_xyz.shape[1]
    if ns <= _NS_CHUNK:
        return support_xyz.astype(jnp.float32), features, ns
    pad = (-ns) % _NS_CHUNK
    if pad == 0:
        return support_xyz.astype(jnp.float32), features, ns
    sx = jnp.pad(support_xyz.astype(jnp.float32),
                 ((0, 0), (0, pad), (0, 0)), constant_values=1e9)
    f = jnp.pad(features, ((0, 0), (0, pad), (0, 0)))
    return sx, f, sx.shape[1]


def _interpret() -> bool:
    """Interpret mode lets the CPU test suite validate kernels exactly."""
    return os.environ.get("CL3D_PALLAS_INTERPRET", "0") == "1"


def _tile_for(nq: int, ns: int, mode: str = "xyz") -> int:
    """Query-tile (lane) count: two [Ns, T] f32 live buffers in ~8MB."""
    del mode  # fori-loop kernels have uniform liveness now
    budget = max((4 * 1024 * 1024) // (4 * ns), 8)
    t = 1 << (budget.bit_length() - 1)
    nq_pow = 1 << (nq - 1).bit_length()
    # Mosaic requires lane-dim blocks divisible by 128 (or full-array)
    return max(128, min(256, t, nq_pow)) if nq >= 128 else         max(8, min(nq_pow, 256))


_TILE_CHUNKED = int(os.environ.get("CL3D_AGG_TILE", "128"))


def _tile_chunked(nq: int) -> int:
    """Query tile for chunked kernels: liveness is [cs, T], not [Ns, T],
    so the tile is VMEM-independent of the support size."""
    nq_pow = 1 << (nq - 1).bit_length()
    return (max(128, min(_TILE_CHUNKED, nq_pow)) if nq >= 128
            else max(8, nq_pow))


def _chunk_flags(idx, mask, tile, cs: int, nchunks: int):
    """[B, ntile(pad8), nchunks] int32: does query tile t reference
    support chunk c through any valid neighbor slot?

    With spatially sorted queries+supports (ops/spatial.morton_sort)
    almost every tile touches 1-2 chunks; the kernels skip the rest.
    Correct for ANY ordering — unsorted inputs just skip nothing.
    The tile axis is padded to a multiple of 8 (Mosaic SMEM block rule;
    blocks are (1, 8, nchunks), kernels read row program_id(1) % 8).
    """
    b, _, k = idx.shape
    ip, _ = _pad_queries(idx, tile)
    mp, _ = _pad_queries(mask, tile)
    ntile = ip.shape[1] // tile
    cid = jnp.where(mp, ip // cs, -1).reshape(b, ntile, tile * k)
    hit = cid[..., None] == jnp.arange(nchunks, dtype=cid.dtype)
    flags = jnp.any(hit, axis=2).astype(jnp.int32)
    pad = (-ntile) % 8
    if pad:
        flags = jnp.pad(flags, ((0, 0), (0, pad), (0, 0)))
    return flags


def _pack_chunk_lists(flags):
    """[B, ntile8, C] int32 flags -> [B, ntile8, C+1] packed lists:
    active chunk ids ascending at the front, the count in slot C.

    The chunked kernels loop over exactly the active chunks through
    this list instead of scanning all C flags: a dead flag check costs
    ~100 cycles of SMEM-read+branch per grid step, and at sparse bench
    occupancy 28 of 30 chunks are dead."""
    c = flags.shape[-1]
    order = jnp.argsort(1 - flags, axis=-1, stable=True)
    cnt = jnp.sum(flags, axis=-1, keepdims=True)
    return jnp.concatenate([order.astype(jnp.int32),
                            cnt.astype(jnp.int32)], axis=-1)


def _chunk_lists(idx, mask, tile, cs: int, nchunks: int):
    """_chunk_flags composed with _pack_chunk_lists (the common case)."""
    return _pack_chunk_lists(_chunk_flags(idx, mask, tile, cs, nchunks))


def _lists_spec(nchunks: int):
    return pl.BlockSpec((1, 8, nchunks + 1),
                        lambda bi, ti: (bi, ti // 8, 0),
                        memory_space=pltpu.SMEM)


def _pad_queries(x, t):
    """Pad dim 1 (queries) to a multiple of t."""
    nq = x.shape[1]
    pad = (-nq) % t
    if pad == 0:
        return x, nq
    widths = [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2)
    return jnp.pad(x, widths), nq


def _prep_tq(query_xyz, idx, mask, tile):
    """Host-side: pad queries then transpose to lane-major blocks."""
    qp, nq0 = _pad_queries(query_xyz.astype(jnp.float32), tile)
    ip, _ = _pad_queries(idx, tile)
    mp, _ = _pad_queries(mask, tile)
    qT = jnp.swapaxes(qp, 1, 2)  # [B, 3, Nqp]
    iT = jnp.swapaxes(ip, 1, 2)  # [B, K, Nqp]
    mT = jnp.swapaxes(mp, 1, 2).astype(jnp.int32)  # [B, K, Nqp]
    return qT, iT, mT, nq0, qp.shape[1]


def _row(ref, kk):
    """Dynamic sublane slice: row kk of a [1, K, T] ref -> [1, T] value.

    Must index the REF (dynamic slices of loaded values are rejected).
    """
    return ref[0, pl.ds(kk, 1), :]


def _multi_hot_T(idxT_ref, maskT_ref, k: int, ns: int, t: int):
    """M_T[s, t] = Σ_k mask[k,t] * [idx[k,t] == s] — [Ns, T] f32."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (ns, t), 0)

    def body(kk, m):
        oh = (iota == _row(idxT_ref, kk)) & (_row(maskT_ref, kk) != 0)
        return m + oh.astype(jnp.float32)

    return jax.lax.fori_loop(0, _hi_slot(maskT_ref, k, t), body,
                             jnp.zeros((ns, t), jnp.float32))


def _hi_slot(maskT_ref, k: int, t: int):
    """Scalar bound on the slot loops: 1 + highest valid slot index over
    this query tile (0 when the tile has no valid neighbor at all).

    The ordered ball query packs valid neighbors as a prefix, so this is
    typically the tile's max neighbor COUNT — work tracks true
    occupancy, not K. Exact for arbitrary masks too (any all-invalid
    slot tail contributes nothing to a masked accumulation). The slot
    count comes from the ref itself — slot-padded refs (gather_reduce's
    _prep_iq) carry mask 0 in the pad rows, which never win the max."""
    kr = maskT_ref.shape[1]  # ref block is [1, K(p), T]
    iota1 = jax.lax.broadcasted_iota(jnp.int32, (kr, t), 0) + 1
    return jnp.max(jnp.where(maskT_ref[0] != 0, iota1, 0))


def _gather_T(ohT, src, precision):
    """[Ns, T] one/multi-hot x [Ns, C] -> [C, T] (contract Ns)."""
    return jax.lax.dot_general(
        src, ohT, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)


def _sincos_T(dpT, channels: int):
    """Sinusoidal weights [C, T] from dp [3, T] (coord-major sin|cos)."""
    ndim = channels // 6
    exps = jax.lax.broadcasted_iota(
        jnp.int32, (ndim, 1), 0).astype(jnp.float32) / ndim
    freq = 1000.0**exps  # [ndim, 1]
    parts = []
    for d in range(3):
        ang = 100.0 * dpT[d:d + 1, :] / freq  # [ndim, T]
        parts.append(jnp.sin(ang))
        parts.append(jnp.cos(ang))
    return jnp.concatenate(parts, axis=0)  # [C, T]


# --------------------------------------------------------------------------
# xyz mode: factorized multi-hot matmuls
# --------------------------------------------------------------------------


def _one_hot_chunk(idxT_ref, maskT_ref, kk, cs: int, t: int, start):
    """Chunk-restricted one-hot for slot kk.

    Returns (oh [cs, T] f32, ink [1, T] bool): oh[s-start, t] = 1 iff
    idx[kk, t] == s with s in this chunk and the slot valid; ink marks
    queries whose slot-kk neighbor lives in this chunk. Each valid slot
    lands in exactly one chunk, so per-chunk accumulations sum to the
    full-support result.
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, (cs, t), 0) + start
    row = _row(idxT_ref, kk)
    mk = _row(maskT_ref, kk) != 0
    ink = mk & (row >= start) & (row < start + cs)
    oh = (iota == row) & mk
    return oh.astype(jnp.float32), ink


def _wide_onehot(idxT_ref, maskT_ref, k: int, cs: int, t: int, start):
    """One-hot [cs, K*T] (k-major lanes) + per-slot in-chunk rows
    ([1, K*T]): column k*T+t is slot k of query t. ONE vectorized
    compare instead of a K-iteration loop; requires t % 128 == 0
    (Mosaic's [K,T]->[1,K*T] reshape needs lane-aligned T). k may be
    smaller than the ref's slot dim (slot-padded inputs) — only the
    first k rows are used."""
    rowW = idxT_ref[0, pl.ds(0, k), :].reshape(1, k * t)
    mW = maskT_ref[0, pl.ds(0, k), :].reshape(1, k * t) != 0
    iota = jax.lax.broadcasted_iota(jnp.int32, (cs, k * t), 0) + start
    inkW = mW & (rowW >= start) & (rowW < start + cs)
    # (i16 compares would halve the vreg count here, but v5e supports
    # neither 16-bit iota nor 16-bit equality — measured dead end)
    ohW = (iota == rowW) & mW
    return ohW, inkW


def _multi_hot_chunk(idxT_ref, maskT_ref, k: int, cs: int, t: int,
                     start, hi=None):
    """Per-support-chunk masked multi-hot [cs, T] (chunk begins at start).

    Deliberately a rolled fori loop: building via _wide_onehot + a
    [cs,K,T] reshape-sum was measured SLOWER (seg step 94.5 -> 129.7
    ms) — the per-chunk relayout outweighs the loop overhead here.
    The trip count is bounded by the tile's true occupancy (_hi_slot),
    not K: at bench geometry that is 2-6 of K=26-39.
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, (cs, t), 0) + start

    def body(kk, m):
        oh = (iota == _row(idxT_ref, kk)) & (_row(maskT_ref, kk) != 0)
        return m + oh.astype(jnp.float32)

    bound = _hi_slot(maskT_ref, k, t) if hi is None else hi
    return jax.lax.fori_loop(0, bound, body,
                             jnp.zeros((cs, t), jnp.float32))


def _xyz_fwd_kernel(qxyzT_ref, sxyz_ref, feats_ref, idxT_ref, maskT_ref,
                    flags_ref, out_ref, acc_ref, cnt_ref, *, k: int,
                    ns: int, channels: int, radius: float, reduction: str):
    t = qxyzT_ref.shape[2]
    g = channels // 3
    cs = min(ns, _NS_CHUNK)
    inv_r = 1.0 / radius
    qT = qxyzT_ref[0]  # [3, T]
    trow = pl.program_id(1) % 8
    hi = _hi_slot(maskT_ref, k, t)  # hoisted: tile-invariant
    acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
    # valid-neighbor count == mask row-sum (every valid slot lands in
    # exactly one chunk) — no need to build multi-hots to count
    cnt_ref[...] = jnp.sum(maskT_ref[0].astype(jnp.float32), axis=0,
                           keepdims=True)

    def chunk_body(j, _):
        ci = flags_ref[0, trow, j]  # packed active-chunk list

        start = ci * cs
        m = _multi_hot_chunk(idxT_ref, maskT_ref, k, cs, t, start,
                             hi)
        sx = sxyz_ref[0, pl.ds(start, cs), :]  # [cs, 3]
        fch = feats_ref[0, pl.ds(start, cs), :]
        # bf16 features ride single-pass bf16 MXU matmuls (the
        # multi-hot-weighted delta quantizes like any other bf16
        # operand); f32 features keep full precision.
        fprec = (_HI if fch.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
        parts = []
        for d in range(3):
            delta = (sx[:, d:d + 1] - qT[d:d + 1, :]) * inv_r  # [cs,T]
            w = (m * delta).astype(fch.dtype)
            parts.append(jax.lax.dot_general(
                fch[:, d * g:(d + 1) * g], w,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=fprec))
        acc_ref[...] = acc_ref[...] + jnp.concatenate(parts, axis=0)
        return 0

    jax.lax.fori_loop(0, flags_ref[0, trow, ns // cs], chunk_body, 0)
    acc = acc_ref[...]
    if reduction == "avg":
        acc = acc / jnp.maximum(cnt_ref[...], 1.0)
    out_ref[0] = acc.astype(out_ref.dtype)


def _xyz_bwd_kernel(qxyzT_ref, sxyz_ref, idxT_ref, maskT_ref, dyT_ref,
                    flags_ref, dfeats_ref, cnt_ref, *, k: int, ns: int,
                    channels: int, radius: float, reduction: str):
    tile = pl.program_id(1)
    t = qxyzT_ref.shape[2]
    g = channels // 3
    cs = min(ns, _NS_CHUNK)
    inv_r = 1.0 / radius
    qT = qxyzT_ref[0]
    trow = tile % 8
    hi = _hi_slot(maskT_ref, k, t)  # hoisted: tile-invariant

    @pl.when(tile == 0)
    def _():
        dfeats_ref[0] = jnp.zeros_like(dfeats_ref[0])

    dy0 = dyT_ref[0]  # [C, T]
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
        grads = []
        for d in range(3):
            delta = (sx[:, d:d + 1] - qT[d:d + 1, :]) * inv_r
            w = (m * delta).astype(dy0.dtype)  # [cs, T]
            grads.append(jax.lax.dot_general(
                w, dy0[d * g:(d + 1) * g, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=dprec))
        df = jnp.concatenate(grads, axis=-1)  # [cs, C]
        dfeats_ref[0, pl.ds(start, cs), :] += df.astype(dfeats_ref.dtype)
        return 0

    jax.lax.fori_loop(0, flags_ref[0, trow, ns // cs], chunk_body, 0)


# --------------------------------------------------------------------------
# sin_cos mode: factorized by the angle-difference identity
#
#   w_c(s, t) = sin/cos(u_s(c) - v_t(c)),  u = α p_s,d / (r·freq),
#                                          v = α q_t,d / (r·freq)
#   sin(u-v) = sinU cosV - cosU sinV;  cos(u-v) = cosU cosV + sinU sinV
#
# so the slot sum collapses into the masked multi-hot exactly as in xyz
# mode: per chunk, TWO [C,cs]x[cs,T] MXU matmuls of trig-modulated
# features replace the k-slot gather+sincos loop.
#
# With a GLOBAL angle origin (absolute coordinates), the support-side
# trig modulation g1 = f·(sel·sinU + (1−sel)·cosU), g2 = f·((1−sel)·
# sinU − sel·cosU) depends on nothing tile- or chunk-local, so it moves
# OUT of the kernel into one fused XLA pass per block (CSE'd across a
# stage's blocks: U depends only on support positions). The kernel body
# is then just multi-hot + two MXU matmuls per chunk, with the
# query-side trig (sinV/cosV [C,T]) and the combine cosV·acc1 +
# sinV·acc2 running ONCE per tile. Identity reassociation on absolute
# angles (≤ α·extent/r ≈ 4e3 rad at S3DIS stage 1) costs ~5e-4
# absolute vs the direct small-angle form — f32 argument-reduction ulp,
# invisible under bf16 training; the interpret-mode parity test pins
# the f32 bound.
# --------------------------------------------------------------------------


def _sincos_coef(channels: int) -> "np.ndarray":
    """[4, C] host constants for the factorized kernels.

    Rows 0-2: α/freq on the channel's coordinate (zero elsewhere) —
    matmul with radius-normalized positions yields the angle matrix.
    Row 3: sin-channel selector (1=sin block, 0=cos block), canonical
    coordinate-major [sin(freqs), cos(freqs)] layout per coordinate
    (matches models.aggregation.sinusoidal_embedding).
    """
    ndim = channels // 6
    freq = 1000.0 ** (np.arange(ndim) / ndim)
    coef = np.zeros((4, channels), np.float32)
    for d in range(3):
        base = d * 2 * ndim
        coef[d, base:base + ndim] = 100.0 / freq
        coef[d, base + ndim:base + 2 * ndim] = 100.0 / freq
        coef[3, base:base + ndim] = 1.0
    return coef


def _sincos_coefT(channels: int) -> "np.ndarray":
    """[C, 3] transpose of _sincos_coef's frequency rows — the V angles
    need per-channel coefficients in column orientation and Mosaic
    relayouts are dearer than a second tiny constant."""
    return np.ascontiguousarray(_sincos_coef(channels)[:3].T)


def _sc_tile_trig_v(qT, coefT_ref, inv_r: float):
    """Tile-invariant query-side angle trig: (sinV, cosV), each [C, T].

    Absolute-coordinate angles (origin 0 — shared with the XLA-side
    support modulation, the identity sin/cos(u−v) needs one origin).
    The frequency matrix has exactly one nonzero per channel (the
    channel's coordinate), so the angle "matmul" is really a selector
    broadcast: V = Σ_d Aᵀ[:,d]·(q_d/r) — pure VPU outer products
    instead of a 3/4-wide MXU contraction (which pads to 128 and runs
    6 HIGHEST passes).
    """
    v = None
    for d in range(3):
        qv = qT[d:d + 1, :] * inv_r                      # [1, T]
        vd = coefT_ref[0, :, d:d + 1] * qv               # [C, T]
        v = vd if v is None else v + vd
    return jnp.sin(v), jnp.cos(v)


def _sc_fwd_kernel(qxyzT_ref, g1_ref, g2_ref, idxT_ref, maskT_ref,
                   coefT_ref, flags_ref, out_ref, acc1_ref,
                   acc2_ref, cnt_ref, *, k: int, ns: int, channels: int,
                   radius: float, reduction: str):
    t = qxyzT_ref.shape[2]
    cs = min(ns, _NS_CHUNK)
    trow = pl.program_id(1) % 8
    hi = _hi_slot(maskT_ref, k, t)  # hoisted: tile-invariant
    qT = qxyzT_ref[0]  # [3, T]
    inv_r = 1.0 / radius
    acc1_ref[...] = jnp.zeros(acc1_ref.shape, acc1_ref.dtype)
    acc2_ref[...] = jnp.zeros(acc2_ref.shape, acc2_ref.dtype)
    # valid-neighbor count == mask row-sum (chunk-independent)
    cnt_ref[...] = jnp.sum(maskT_ref[0].astype(jnp.float32), axis=0,
                           keepdims=True)

    def chunk_body(j, _):
        ci = flags_ref[0, trow, j]  # packed active-chunk list

        start = ci * cs
        m = _multi_hot_chunk(idxT_ref, maskT_ref, k, cs, t, start,
                             hi)
        f1 = g1_ref[0, pl.ds(start, cs), :]  # trig-modulated features
        f2 = g2_ref[0, pl.ds(start, cs), :]
        # bf16 streams ride single-pass bf16 MXU matmuls with f32
        # accumulation (multi-hot is exact; the modulated operands
        # quantize like any bf16 input); f32 keeps full precision
        fprec = (_HI if f1.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
        mc = m.astype(f1.dtype)
        acc1_ref[...] = acc1_ref[...] + jax.lax.dot_general(
            f1, mc, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=fprec)
        acc2_ref[...] = acc2_ref[...] + jax.lax.dot_general(
            f2, mc, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=fprec)
        return 0

    jax.lax.fori_loop(0, flags_ref[0, trow, ns // cs], chunk_body, 0)
    # y_sin = cosV·Σ f sinU − sinV·Σ f cosU
    # y_cos = cosV·Σ f cosU + sinV·Σ f sinU  (signs live in g1/g2)
    # — tile-invariant combine: ONE pass, not one per active chunk
    sinV, cosV = _sc_tile_trig_v(qT, coefT_ref, inv_r)
    acc = cosV * acc1_ref[...] + sinV * acc2_ref[...]
    if reduction == "avg":
        acc = acc / jnp.maximum(cnt_ref[...], 1.0)
    out_ref[0] = acc.astype(out_ref.dtype)


def _sc_bwd_kernel(qxyzT_ref, idxT_ref, maskT_ref, coefT_ref, dyT_ref,
                   flags_ref, dg1_ref, dg2_ref,
                   *, k: int, ns: int, channels: int, radius: float,
                   reduction: str):
    tile = pl.program_id(1)
    t = qxyzT_ref.shape[2]
    cs = min(ns, _NS_CHUNK)
    trow = tile % 8
    hi = _hi_slot(maskT_ref, k, t)  # hoisted: tile-invariant
    qT = qxyzT_ref[0]
    inv_r = 1.0 / radius

    dy0 = dyT_ref[0]  # [C, T]
    ddt = dy0.dtype
    dprec = (_HI if ddt == jnp.float32 else jax.lax.Precision.DEFAULT)
    dy = dy0.astype(jnp.float32)
    if reduction == "avg":
        cnt = jnp.sum(maskT_ref[0].astype(jnp.float32), axis=0,
                      keepdims=True)
        dy = dy / jnp.maximum(cnt, 1.0)
    # dy modulations are tile-invariant: hoisted. The dg1/dg2 → df
    # chain (⊙ the support-side trig) runs outside in XLA autodiff.
    sinV, cosV = _sc_tile_trig_v(qT, coefT_ref, inv_r)
    dyc = (cosV * dy).astype(ddt)
    dys = (sinV * dy).astype(ddt)

    @pl.when(tile == 0)
    def _():
        dg1_ref[0] = jnp.zeros_like(dg1_ref[0])
        dg2_ref[0] = jnp.zeros_like(dg2_ref[0])

    def chunk_body(j, _):
        ci = flags_ref[0, trow, j]  # packed active-chunk list

        start = ci * cs
        m = _multi_hot_chunk(idxT_ref, maskT_ref, k, cs, t, start,
                             hi)
        mc = m.astype(ddt)
        p = jax.lax.dot_general(
            mc, dyc, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=dprec)
        q = jax.lax.dot_general(
            mc, dys, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=dprec)
        dg1_ref[0, pl.ds(start, cs), :] += p.astype(dg1_ref.dtype)
        dg2_ref[0, pl.ds(start, cs), :] += q.astype(dg2_ref.dtype)
        return 0

    jax.lax.fori_loop(0, flags_ref[0, trow, ns // cs], chunk_body, 0)


# --------------------------------------------------------------------------
# host-side plumbing
# --------------------------------------------------------------------------


def _common_specs(tile, ns, c, k):
    qspec = pl.BlockSpec((1, 3, tile), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, ns, 3), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((1, ns, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    ispec = pl.BlockSpec((1, k, tile), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM)
    oTspec = pl.BlockSpec((1, c, tile), lambda bi, ti: (bi, 0, ti),
                          memory_space=pltpu.VMEM)
    return qspec, sspec, fspec, ispec, oTspec


def _fold_batch(nq: int, b: int) -> bool:
    """Fold batch into the point axes when per-batch query tiles would
    occupy a fraction of the 128-lane unit (deep stages: nq of 8-88).
    Valid for every index-addressed kernel: offset indices keep each
    query inside its own batch's support range, so nothing crosses
    batch boundaries, and the chunk flags localize as usual."""
    return b > 1 and nq < 128


def pospool_fused(query_xyz, support_xyz, features, idx, mask,
                  radius, mode: str, reduction: str):
    b, nq, k = idx.shape
    ns, c = features.shape[1], features.shape[2]
    if _fold_batch(nq, b):
        off = (jnp.arange(b, dtype=idx.dtype) * ns)[:, None, None]
        out = _pospool_dispatch(
            query_xyz.reshape(1, b * nq, 3),
            support_xyz.reshape(1, b * ns, 3),
            features.reshape(1, b * ns, c),
            (idx + off).reshape(1, b * nq, k),
            mask.reshape(1, b * nq, k), radius, mode, reduction)
        return out.reshape(b, nq, -1)
    return _pospool_dispatch(query_xyz, support_xyz, features, idx, mask,
                             radius, mode, reduction)


def _pospool_dispatch(query_xyz, support_xyz, features, idx, mask,
                      radius, mode: str, reduction: str):
    if mode == "xyz":
        return _pospool_vjp(query_xyz, support_xyz, features, idx, mask,
                            radius, reduction)
    if mode != "sin_cos":
        raise ValueError(mode)
    # XLA-side support modulation (see the sin_cos block comment): the
    # trig of U = A·s/r depends only on support positions — identical
    # across a stage's blocks, so XLA CSEs it; the feature products are
    # fused elementwise. Gradients to `features` chain through here by
    # ordinary autodiff (the kernel's VJP stops at dg1/dg2).
    c = features.shape[2]
    coef = _sincos_coef(c)
    ang = jax.lax.dot_general(
        support_xyz.astype(jnp.float32) * jnp.float32(1.0 / radius),
        jnp.asarray(coef[:3]),
        dimension_numbers=(((2,), (0,)), ((), ())),
        precision=_HI)  # [B, Ns, C]
    s_sel = jnp.asarray(coef[3:4]) != 0
    su, cu = jnp.sin(ang), jnp.cos(ang)
    f32 = features.astype(jnp.float32)
    g1 = (f32 * jnp.where(s_sel, su, cu)).astype(features.dtype)
    g2 = (f32 * jnp.where(s_sel, -cu, su)).astype(features.dtype)
    return _sc2_vjp(query_xyz, g1, g2, idx, mask, radius, reduction)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _pospool_vjp(query_xyz, support_xyz, features, idx, mask,
                  radius: float, reduction: str = "avg"):
    """Fused xyz-mode PosPool: [B, Nq, C] from padded neighborhoods.

    query_xyz [B,Nq,3] f32; support_xyz [B,Ns,3] f32; features [B,Ns,C]
    (bf16 or f32); idx [B,Nq,K] int32; mask [B,Nq,K] bool.
    reduction: avg|sum. Differentiable in features (positions carry no
    gradient, matching the reference operators). sin_cos mode goes
    through _sc2_vjp (see _pospool_dispatch).
    """
    return _pospool_call(query_xyz, support_xyz, features, idx, mask,
                         radius, reduction)


def _pospool_call(query_xyz, support_xyz, features, idx, mask,
                  radius, reduction):
    b, nq, _ = query_xyz.shape
    support_xyz, features, _ = _pad_support(support_xyz, features)
    ns, c = features.shape[1], features.shape[2]
    k = idx.shape[2]
    tile = _tile_chunked(nq)
    qT, iT, mT, nq0, nqp = _prep_tq(query_xyz, idx, mask, tile)
    ntile = nqp // tile

    kern = functools.partial(
        _xyz_fwd_kernel, k=k, ns=ns, channels=c, radius=float(radius),
        reduction=reduction)
    qspec, sspec, fspec, ispec, oTspec = _common_specs(tile, ns, c, k)
    cs = min(ns, _NS_CHUNK)
    in_specs = [qspec, sspec, fspec, ispec, ispec, _lists_spec(ns // cs)]
    operands = [qT, support_xyz.astype(jnp.float32), features, iT, mT,
                _chunk_lists(idx, mask, tile, cs, ns // cs)]
    scratch = [pltpu.VMEM((c, tile), jnp.float32),
               pltpu.VMEM((1, tile), jnp.float32)]
    outT = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=in_specs,
        out_specs=oTspec,
        out_shape=jax.ShapeDtypeStruct((b, c, nqp), features.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*operands)
    return jnp.swapaxes(outT, 1, 2)[:, :nq0]


def _pospool_fwd(query_xyz, support_xyz, features, idx, mask,
                 radius, reduction):
    out = _pospool_call(query_xyz, support_xyz, features, idx, mask,
                        radius, reduction)
    return out, (query_xyz, support_xyz, features, idx, mask)


def _pospool_bwd(radius, reduction, res, dy):
    query_xyz, support_xyz, features, idx, mask = res
    b = query_xyz.shape[0]
    ns0 = features.shape[1]
    support_xyz, features, _ = _pad_support(support_xyz, features)
    ns, c = features.shape[1], features.shape[2]
    k = idx.shape[2]
    tile = _tile_chunked(query_xyz.shape[1])
    qT, iT, mT, _, nqp = _prep_tq(query_xyz, idx, mask, tile)
    dyp, _ = _pad_queries(dy, tile)
    dyT = jnp.swapaxes(dyp, 1, 2)  # [B, C, Nqp]
    ntile = nqp // tile

    kern = functools.partial(
        _xyz_bwd_kernel, k=k, ns=ns, channels=c, radius=float(radius),
        reduction=reduction)
    qspec, sspec, fspec, ispec, oTspec = _common_specs(tile, ns, c, k)
    cs = min(ns, _NS_CHUNK)
    in_specs = [qspec, sspec, ispec, ispec, oTspec, _lists_spec(ns // cs)]
    operands = [qT, support_xyz.astype(jnp.float32), iT, mT, dyT,
                _chunk_lists(idx, mask, tile, cs, ns // cs)]
    scratch = [pltpu.VMEM((1, tile), jnp.float32)]
    dfeats = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=in_specs,
        out_specs=fspec,
        out_shape=jax.ShapeDtypeStruct((b, ns, c), features.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*operands)
    return (jnp.zeros_like(query_xyz),
            jnp.zeros((b, ns0, 3), query_xyz.dtype),
            dfeats[:, :ns0], None, None)


_pospool_vjp.defvjp(_pospool_fwd, _pospool_bwd)


# ---- sin_cos two-stream gather (see the sin_cos block comment) ----------


def _pad_rows(f):
    """Pad the support-row axis to a _NS_CHUNK multiple with zeros
    (indices in idx are always < the original Ns, so padded rows are
    never selected)."""
    ns = f.shape[1]
    if ns <= _NS_CHUNK:
        return f
    pad = (-ns) % _NS_CHUNK
    if pad == 0:
        return f
    return jnp.pad(f, ((0, 0), (0, pad), (0, 0)))


def _sc2_coefT_spec(c):
    return pl.BlockSpec((1, c, 3), lambda bi, ti: (0, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _sc2_vjp(query_xyz, g1, g2, idx, mask, radius: float,
             reduction: str = "avg"):
    """Two-stream masked neighborhood sum + sinusoidal combine:

        out[t, c] = cosV[c,t]·Σ_s M[s,t] g1[s,c]
                  + sinV[c,t]·Σ_s M[s,t] g2[s,c]

    with V the absolute-coordinate query angles. g1/g2 are the
    trig-modulated support features built in _pospool_dispatch.
    Differentiable in g1/g2.
    """
    return _sc2_call(query_xyz, g1, g2, idx, mask, radius, reduction)


def _sc2_call(query_xyz, g1, g2, idx, mask, radius, reduction):
    b, nq, _ = query_xyz.shape
    g1, g2 = _pad_rows(g1), _pad_rows(g2)
    ns, c = g1.shape[1], g1.shape[2]
    k = idx.shape[2]
    tile = _tile_chunked(nq)
    qT, iT, mT, nq0, nqp = _prep_tq(query_xyz, idx, mask, tile)
    ntile = nqp // tile

    kern = functools.partial(
        _sc_fwd_kernel, k=k, ns=ns, channels=c, radius=float(radius),
        reduction=reduction)
    qspec, _, fspec, ispec, oTspec = _common_specs(tile, ns, c, k)
    cs = min(ns, _NS_CHUNK)
    in_specs = [qspec, fspec, fspec, ispec, ispec, _sc2_coefT_spec(c),
                _lists_spec(ns // cs)]
    operands = [qT, g1, g2, iT, mT, jnp.asarray(_sincos_coefT(c))[None],
                _chunk_lists(idx, mask, tile, cs, ns // cs)]
    scratch = [pltpu.VMEM((c, tile), jnp.float32),
               pltpu.VMEM((c, tile), jnp.float32),
               pltpu.VMEM((1, tile), jnp.float32)]
    outT = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=in_specs,
        out_specs=oTspec,
        out_shape=jax.ShapeDtypeStruct((b, c, nqp), g1.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*operands)
    return jnp.swapaxes(outT, 1, 2)[:, :nq0]


def _sc2_fwd(query_xyz, g1, g2, idx, mask, radius, reduction):
    out = _sc2_call(query_xyz, g1, g2, idx, mask, radius, reduction)
    # zero-width slice: carries g1's row count + dtype (statically)
    # through the residuals without holding any data
    return out, (query_xyz, g1[:, :, :0], idx, mask)


def _sc2_bwd(radius, reduction, res, dy):
    query_xyz, gmeta, idx, mask = res
    ns0, gdt = gmeta.shape[1], gmeta.dtype
    b = query_xyz.shape[0]
    ns = ns0 if ns0 <= _NS_CHUNK else ns0 + (-ns0) % _NS_CHUNK
    c = dy.shape[2]
    k = idx.shape[2]
    tile = _tile_chunked(query_xyz.shape[1])
    qT, iT, mT, _, nqp = _prep_tq(query_xyz, idx, mask, tile)
    dyp, _ = _pad_queries(dy, tile)
    dyT = jnp.swapaxes(dyp, 1, 2)  # [B, C, Nqp]
    ntile = nqp // tile

    kern = functools.partial(
        _sc_bwd_kernel, k=k, ns=ns, channels=c, radius=float(radius),
        reduction=reduction)
    qspec, _, fspec, ispec, oTspec = _common_specs(tile, ns, c, k)
    cs = min(ns, _NS_CHUNK)
    in_specs = [qspec, ispec, ispec, _sc2_coefT_spec(c), oTspec,
                _lists_spec(ns // cs)]
    operands = [qT, iT, mT, jnp.asarray(_sincos_coefT(c))[None], dyT,
                _chunk_lists(idx, mask, tile, cs, ns // cs)]
    dg1, dg2 = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=in_specs,
        out_specs=(fspec, fspec),
        out_shape=(jax.ShapeDtypeStruct((b, ns, c), gdt),
                   jax.ShapeDtypeStruct((b, ns, c), gdt)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*operands)
    return (jnp.zeros_like(query_xyz), dg1[:, :ns0], dg2[:, :ns0],
            None, None)


_sc2_vjp.defvjp(_sc2_fwd, _sc2_bwd)
