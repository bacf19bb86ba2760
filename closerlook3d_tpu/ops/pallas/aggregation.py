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
# features replace the k-slot gather+sincos loop. Angles are recentred
# on the chunk's first support point to keep |U|,|V| small for queries
# that matter (M[s,t]=0 kills the rest), bounding f32 trig
# argument-reduction error (identity reassociation costs ~1e-4 absolute
# vs the direct small-angle form — invisible under bf16 training).
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


def _sc_chunk_trig(sxyz_ref, qT, coef_ref, coefT_ref, start, cs: int,
                   inv_r: float):
    """Per-chunk recentred angle trig: (sinU, cosU [cs,C], sinV, cosV
    [C,T]) for the chunk's supports and this tile's queries.

    The chunk origin o (first support point) recentres both angle sets.
    The frequency matrix A has exactly one nonzero per channel (the
    channel's coordinate), so the angle "matmuls" are really selector
    broadcasts: U = Σ_d ((s_d − o_d)/r)·A[d,:], V = Σ_d Aᵀ[:,d]·
    ((q_d − o_d)/r) — pure VPU outer products instead of two 3/4-wide
    MXU contractions (which pad to 128 and run 6 HIGHEST passes).
    """
    sx = sxyz_ref[0, pl.ds(start, cs), :]  # [cs, 3]
    o = sxyz_ref[0, pl.ds(start, 1), :]    # [1, 3] chunk origin
    A = coef_ref[0, 0:3, :]                # [3, C]
    u = None
    v = None
    for d in range(3):
        su = (sx[:, d:d + 1] - o[:, d:d + 1]) * inv_r    # [cs, 1]
        ud = su * A[d:d + 1, :]                          # [cs, C]
        u = ud if u is None else u + ud
        qv = (qT[d:d + 1, :] - o[:, d:d + 1]) * inv_r    # [1, T]
        vd = coefT_ref[0, :, d:d + 1] * qv               # [C, T]
        v = vd if v is None else v + vd
    return jnp.sin(u), jnp.cos(u), jnp.sin(v), jnp.cos(v)


def _sc_fwd_kernel(qxyzT_ref, sxyz_ref, feats_ref, idxT_ref, maskT_ref,
                   coef_ref, coefT_ref, flags_ref, out_ref, acc_ref,
                   cnt_ref, *, k: int, ns: int, channels: int,
                   radius: float, reduction: str):
    t = qxyzT_ref.shape[2]
    cs = min(ns, _NS_CHUNK)
    trow = pl.program_id(1) % 8
    hi = _hi_slot(maskT_ref, k, t)  # hoisted: tile-invariant
    qT = qxyzT_ref[0]  # [3, T]
    inv_r = 1.0 / radius
    acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
    # valid-neighbor count == mask row-sum (chunk-independent)
    cnt_ref[...] = jnp.sum(maskT_ref[0].astype(jnp.float32), axis=0,
                           keepdims=True)
    s_sel = coef_ref[0, 3:4, :]  # [1, C] 1=sin-channel

    def chunk_body(j, _):
        ci = flags_ref[0, trow, j]  # packed active-chunk list

        start = ci * cs
        m = _multi_hot_chunk(idxT_ref, maskT_ref, k, cs, t, start,
                             hi)
        fch = feats_ref[0, pl.ds(start, cs), :]
        # bf16 features: modulate in f32, then single-pass bf16 MXU
        # matmuls with f32 accumulation (multi-hot is exact; the
        # modulated operand quantizes like any bf16 input)
        fprec = (_HI if fch.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
        fch32 = fch.astype(jnp.float32)
        sinU, cosU, sinV, cosV = _sc_chunk_trig(
            sxyz_ref, qT, coef_ref, coefT_ref, start, cs, inv_r)
        # y_sin = cosV·Σ f sinU − sinV·Σ f cosU
        # y_cos = cosV·Σ f cosU + sinV·Σ f sinU
        g1 = (fch32 * (s_sel * sinU + (1.0 - s_sel) * cosU)).astype(
            fch.dtype)
        g2 = (fch32 * ((1.0 - s_sel) * sinU - s_sel * cosU)).astype(
            fch.dtype)
        mc = m.astype(fch.dtype)
        mg1 = jax.lax.dot_general(
            g1, mc, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=fprec)
        mg2 = jax.lax.dot_general(
            g2, mc, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=fprec)
        acc_ref[...] = acc_ref[...] + cosV * mg1 + sinV * mg2
        return 0

    jax.lax.fori_loop(0, flags_ref[0, trow, ns // cs], chunk_body, 0)
    acc = acc_ref[...]
    if reduction == "avg":
        acc = acc / jnp.maximum(cnt_ref[...], 1.0)
    out_ref[0] = acc.astype(out_ref.dtype)


def _sc_bwd_kernel(qxyzT_ref, sxyz_ref, idxT_ref, maskT_ref, coef_ref,
                   coefT_ref, dyT_ref, flags_ref, dfeats_ref, cnt_ref,
                   *, k: int, ns: int, channels: int, radius: float,
                   reduction: str):
    del cnt_ref  # the masked count is chunk-independent (mask rows only)
    tile = pl.program_id(1)
    t = qxyzT_ref.shape[2]
    cs = min(ns, _NS_CHUNK)
    trow = tile % 8
    hi = _hi_slot(maskT_ref, k, t)  # hoisted: tile-invariant
    qT = qxyzT_ref[0]
    inv_r = 1.0 / radius
    s_sel = coef_ref[0, 3:4, :]

    dy0 = dyT_ref[0]  # [C, T]
    ddt = dy0.dtype
    dprec = (_HI if ddt == jnp.float32 else jax.lax.Precision.DEFAULT)
    dy = dy0.astype(jnp.float32)
    if reduction == "avg":
        cnt = jnp.sum(maskT_ref[0].astype(jnp.float32), axis=0,
                      keepdims=True)
        dy = dy / jnp.maximum(cnt, 1.0)

    @pl.when(tile == 0)
    def _():
        dfeats_ref[0] = jnp.zeros_like(dfeats_ref[0])

    def chunk_body(j, _):
        ci = flags_ref[0, trow, j]  # packed active-chunk list

        start = ci * cs
        m = _multi_hot_chunk(idxT_ref, maskT_ref, k, cs, t, start,
                             hi)
        sinU, cosU, sinV, cosV = _sc_chunk_trig(
            sxyz_ref, qT, coef_ref, coefT_ref, start, cs, inv_r)
        mc = m.astype(ddt)
        p = jax.lax.dot_general(
            mc, (cosV * dy).astype(ddt),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=dprec)
        q = jax.lax.dot_general(
            mc, (sinV * dy).astype(ddt),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=dprec)
        df = ((s_sel * sinU + (1.0 - s_sel) * cosU) * p
              + ((1.0 - s_sel) * sinU - s_sel * cosU) * q)
        dfeats_ref[0, pl.ds(start, cs), :] += df.astype(dfeats_ref.dtype)
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
        out = _pospool_vjp(
            query_xyz.reshape(1, b * nq, 3),
            support_xyz.reshape(1, b * ns, 3),
            features.reshape(1, b * ns, c),
            (idx + off).reshape(1, b * nq, k),
            mask.reshape(1, b * nq, k), radius, mode, reduction)
        return out.reshape(b, nq, -1)
    return _pospool_vjp(query_xyz, support_xyz, features, idx, mask,
                        radius, mode, reduction)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _pospool_vjp(query_xyz, support_xyz, features, idx, mask,
                  radius: float, mode: str = "xyz",
                  reduction: str = "avg"):
    """Fused PosPool: [B, Nq, C] from padded neighborhoods.

    query_xyz [B,Nq,3] f32; support_xyz [B,Ns,3] f32; features [B,Ns,C]
    (bf16 or f32); idx [B,Nq,K] int32; mask [B,Nq,K] bool.
    mode: xyz|sin_cos; reduction: avg|sum. Differentiable in features
    (positions carry no gradient, matching the reference operators).
    """
    return _pospool_call(query_xyz, support_xyz, features, idx, mask,
                         radius, mode, reduction)


def _pospool_call(query_xyz, support_xyz, features, idx, mask,
                  radius, mode, reduction):
    b, nq, _ = query_xyz.shape
    support_xyz, features, _ = _pad_support(support_xyz, features)
    ns, c = features.shape[1], features.shape[2]
    k = idx.shape[2]
    tile = _tile_chunked(nq)
    qT, iT, mT, nq0, nqp = _prep_tq(query_xyz, idx, mask, tile)
    ntile = nqp // tile

    if mode == "xyz":
        kern_fn = _xyz_fwd_kernel
    elif mode == "sin_cos":
        kern_fn = _sc_fwd_kernel
    else:
        raise ValueError(mode)
    kern = functools.partial(
        kern_fn, k=k, ns=ns, channels=c, radius=float(radius),
        reduction=reduction)
    qspec, sspec, fspec, ispec, oTspec = _common_specs(tile, ns, c, k)
    cs = min(ns, _NS_CHUNK)
    in_specs = [qspec, sspec, fspec, ispec, ispec, _lists_spec(ns // cs)]
    operands = [qT, support_xyz.astype(jnp.float32), features, iT, mT,
                _chunk_lists(idx, mask, tile, cs, ns // cs)]
    if mode == "sin_cos":
        in_specs.insert(5, pl.BlockSpec((1, 4, c), lambda bi, ti: (0, 0, 0),
                                        memory_space=pltpu.VMEM))
        operands.insert(5, jnp.asarray(_sincos_coef(c))[None])
        in_specs.insert(6, pl.BlockSpec((1, c, 3), lambda bi, ti: (0, 0, 0),
                                        memory_space=pltpu.VMEM))
        operands.insert(6, jnp.asarray(_sincos_coefT(c))[None])
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
                 radius, mode, reduction):
    out = _pospool_call(query_xyz, support_xyz, features, idx, mask,
                        radius, mode, reduction)
    return out, (query_xyz, support_xyz, features, idx, mask)


def _pospool_bwd(radius, mode, reduction, res, dy):
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

    kern_fn = _xyz_bwd_kernel if mode == "xyz" else _sc_bwd_kernel
    kern = functools.partial(
        kern_fn, k=k, ns=ns, channels=c, radius=float(radius),
        reduction=reduction)
    qspec, sspec, fspec, ispec, oTspec = _common_specs(tile, ns, c, k)
    cs = min(ns, _NS_CHUNK)
    in_specs = [qspec, sspec, ispec, ispec, oTspec, _lists_spec(ns // cs)]
    operands = [qT, support_xyz.astype(jnp.float32), iT, mT, dyT,
                _chunk_lists(idx, mask, tile, cs, ns // cs)]
    if mode == "sin_cos":
        in_specs.insert(4, pl.BlockSpec((1, 4, c), lambda bi, ti: (0, 0, 0),
                                        memory_space=pltpu.VMEM))
        operands.insert(4, jnp.asarray(_sincos_coef(c))[None])
        in_specs.insert(5, pl.BlockSpec((1, c, 3), lambda bi, ti: (0, 0, 0),
                                        memory_space=pltpu.VMEM))
        operands.insert(5, jnp.asarray(_sincos_coefT(c))[None])
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
