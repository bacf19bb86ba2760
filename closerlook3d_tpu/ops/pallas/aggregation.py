"""Fused PosPool aggregation kernels (gather -> Δp encode -> masked reduce).

Replaces the reference's 3-kernel CUDA sequence (group_points -> operator
math -> reduction; SURVEY.md §3.2 "THE kernel to fuse on TPU") with one
Pallas program per query tile. Nothing [B,N,K,C]-shaped ever touches HBM.

Two formulations, chosen by position-embedding mode:

* ``xyz`` (PosPool's parameter-free headline variant) — fully factorized:
    y[t, c in group d] = (1/cnt_t) * Σ_s M[t,s] * Δ_d[t,s] * f[s,c]
  where M[t,s] = Σ_k mask_k * [idx_k == s] is the masked multi-hot
  neighborhood matrix (built on the VPU in K accumulation steps) and
  Δ_d[t,s] = (sxyz[s,d] - qxyz[t,d])/r is an outer-difference broadcast.
  The whole operator is then THREE [T,Ns]x[Ns,C/3] matmuls — K times
  fewer MACs than gathering, and no coordinate gather at all.

* ``sin_cos`` — per-slot loop: one-hot gather of features+coords per
  neighbor slot k on the MXU (exact: single 1.0*value products), encode,
  masked accumulate.

Backward passes are the transposed matmuls (scatter-add onto support
features), accumulated across query tiles in the output block.

Precision notes (hard-won, see tests):
* f32 MXU matmuls default to bf16 passes — HIGHEST is required wherever
  f32 operands carry real precision (Δ matrices, f32 features);
* Mosaic rejects HIGHEST on bf16 operands — bf16 one-hot gathers are
  exact anyway (each output element is one 1.0 * value product).

Scale: per-query cost is O(Ns), so these kernels target shape-task
sizes (Ns <= ~4096); scene scales keep the XLA path until the windowed
variant lands.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST

# interpret mode lets the CPU test suite validate these kernels exactly
# (no TPU required); enabled via env, read at trace time
def _interpret() -> bool:
    return os.environ.get("CL3D_PALLAS_INTERPRET", "0") == "1"


def _tile_for(nq: int, ns: int, mode: str = "xyz") -> int:
    """Query-tile size: keep per-tile VMEM working set in budget.

    xyz mode holds one [T, Ns] f32 multi-hot (+ one delta); the unrolled
    per-slot sin_cos kernels keep several [T, Ns] temporaries live, so
    they get a 4x smaller tile.
    """
    budget = max(2 * 1024 * 1024 // (4 * ns), 8)
    if mode == "sin_cos":
        budget = max(budget // 4, 8)
    t = 1 << (budget.bit_length() - 1)
    nq_pow = 1 << (nq - 1).bit_length()
    return max(8, min(512, t, nq_pow))


def _multi_hot(idx_ref, mask_ref, t: int, k: int, ns: int):
    """M[t, s] = sum_k mask[t,k] * [idx[t,k] == s] — masked multi-hot."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (t, ns), 1)
    m = jnp.zeros((t, ns), jnp.float32)
    for kk in range(k):
        oh = (iota == idx_ref[0][:, kk:kk + 1]) & mask_ref[0][:, kk:kk + 1]
        m = m + oh.astype(jnp.float32)
    return m


def _sincos_weights(dp_k, channels: int):
    """Canonical sin_cos layout: coord-major [sin(f0..n), cos(f0..n)]."""
    ndim = channels // 6
    exps = jax.lax.broadcasted_iota(
        jnp.int32, (1, ndim), 1).astype(jnp.float32) / ndim
    freq = 1000.0**exps
    parts = []
    for d in range(3):
        ang = 100.0 * dp_k[:, d:d + 1] / freq
        parts.append(jnp.sin(ang))
        parts.append(jnp.cos(ang))
    return jnp.concatenate(parts, axis=-1)


# --------------------------------------------------------------------------
# xyz mode: factorized multi-hot matmuls
# --------------------------------------------------------------------------


def _xyz_fwd_kernel(qxyz_ref, sxyzt_ref, feats_ref, idx_ref, mask_ref,
                    out_ref, *, k: int, ns: int, channels: int,
                    radius: float, reduction: str):
    t = qxyz_ref.shape[1]
    g = channels // 3
    m = _multi_hot(idx_ref, mask_ref, t, k, ns)  # [T, Ns]
    feats = feats_ref[0].astype(jnp.float32)  # [Ns, C]
    inv_r = 1.0 / radius

    outs = []
    for d in range(3):
        delta = (sxyzt_ref[0][d:d + 1, :] - qxyz_ref[0][:, d:d + 1]) * inv_r
        w = m * delta  # [T, Ns]
        outs.append(jax.lax.dot_general(
            w, feats[:, d * g:(d + 1) * g],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI))
    acc = jnp.concatenate(outs, axis=-1)  # [T, C]
    if reduction == "avg":
        cnt = jnp.sum(m, axis=1, keepdims=True)
        acc = acc / jnp.maximum(cnt, 1.0)
    out_ref[0] = acc.astype(out_ref.dtype)


def _xyz_bwd_kernel(qxyz_ref, sxyzt_ref, idx_ref, mask_ref, dy_ref,
                    dfeats_ref, *, k: int, ns: int, channels: int,
                    radius: float, reduction: str):
    tile = pl.program_id(1)
    t = qxyz_ref.shape[1]
    g = channels // 3
    m = _multi_hot(idx_ref, mask_ref, t, k, ns)
    inv_r = 1.0 / radius

    dy = dy_ref[0].astype(jnp.float32)  # [T, C]
    if reduction == "avg":
        cnt = jnp.sum(m, axis=1, keepdims=True)
        dy = dy / jnp.maximum(cnt, 1.0)

    grads = []
    for d in range(3):
        delta = (sxyzt_ref[0][d:d + 1, :] - qxyz_ref[0][:, d:d + 1]) * inv_r
        w = m * delta  # [T, Ns]
        grads.append(jax.lax.dot_general(
            w, dy[:, d * g:(d + 1) * g],
            dimension_numbers=(((0,), (0,)), ((), ())),  # contract T
            preferred_element_type=jnp.float32, precision=_HI))  # [Ns, g]
    df = jnp.concatenate(grads, axis=-1)  # [Ns, C]

    @pl.when(tile == 0)
    def _():
        dfeats_ref[0] = jnp.zeros_like(dfeats_ref[0])

    dfeats_ref[0] += df.astype(dfeats_ref.dtype)


# --------------------------------------------------------------------------
# sin_cos mode: per-slot one-hot gathers
# --------------------------------------------------------------------------


def _sc_fwd_kernel(qxyz_ref, sxyz_ref, feats_ref, idx_ref, mask_ref,
                   out_ref, *, k: int, ns: int, channels: int,
                   radius: float, reduction: str):
    t = qxyz_ref.shape[1]
    qxyz = qxyz_ref[0]
    sxyz = sxyz_ref[0]
    feats = feats_ref[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (t, ns), 1)

    acc = jnp.zeros((t, channels), jnp.float32)
    cnt = jnp.zeros((t, 1), jnp.float32)
    for kk in range(k):
        oh = (iota == idx_ref[0][:, kk:kk + 1]).astype(jnp.float32)
        pj = jax.lax.dot_general(
            oh, sxyz, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)  # [T, 3]
        gf = jax.lax.dot_general(
            oh.astype(feats.dtype), feats,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_HI if feats.dtype == jnp.float32 else
            jax.lax.Precision.DEFAULT)  # [T, C]
        dp = (pj - qxyz) * (1.0 / radius)
        w = _sincos_weights(dp, channels)
        m = mask_ref[0][:, kk:kk + 1].astype(jnp.float32)
        acc = acc + gf * w * m
        cnt = cnt + m
    if reduction == "avg":
        acc = acc / jnp.maximum(cnt, 1.0)
    out_ref[0] = acc.astype(out_ref.dtype)


def _sc_bwd_kernel(qxyz_ref, sxyz_ref, idx_ref, mask_ref, dy_ref,
                   dfeats_ref, *, k: int, ns: int, channels: int,
                   radius: float, reduction: str):
    tile = pl.program_id(1)
    t = qxyz_ref.shape[1]
    qxyz = qxyz_ref[0]
    sxyz = sxyz_ref[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (t, ns), 1)

    dy = dy_ref[0].astype(jnp.float32)
    if reduction == "avg":
        cnt = jnp.zeros((t, 1), jnp.float32)
        for kk in range(k):
            cnt += mask_ref[0][:, kk:kk + 1].astype(jnp.float32)
        dy = dy / jnp.maximum(cnt, 1.0)

    df = jnp.zeros((ns, channels), jnp.float32)
    for kk in range(k):
        oh = (iota == idx_ref[0][:, kk:kk + 1]).astype(jnp.float32)
        pj = jax.lax.dot_general(
            oh, sxyz, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)
        dp = (pj - qxyz) * (1.0 / radius)
        w = _sincos_weights(dp, channels)
        m = mask_ref[0][:, kk:kk + 1].astype(jnp.float32)
        dgf = w * m * dy
        df = df + jax.lax.dot_general(
            oh, dgf, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)

    @pl.when(tile == 0)
    def _():
        dfeats_ref[0] = jnp.zeros_like(dfeats_ref[0])

    dfeats_ref[0] += df.astype(dfeats_ref.dtype)


# --------------------------------------------------------------------------
# host-side plumbing
# --------------------------------------------------------------------------


def _pad_queries(x, t):
    nq = x.shape[1]
    pad = (-nq) % t
    if pad == 0:
        return x, nq
    widths = [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2)
    return jnp.pad(x, widths), nq


def _specs(tile, ns, c, k, xyz_transposed: bool):
    qspec = pl.BlockSpec((1, tile, 3), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM)
    if xyz_transposed:
        sspec = pl.BlockSpec((1, 3, ns), lambda bi, ti: (bi, 0, 0),
                             memory_space=pltpu.VMEM)
    else:
        sspec = pl.BlockSpec((1, ns, 3), lambda bi, ti: (bi, 0, 0),
                             memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((1, ns, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    ispec = pl.BlockSpec((1, tile, k), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM)
    return qspec, sspec, fspec, ispec


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def pospool_fused(query_xyz, support_xyz, features, idx, mask,
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
    ns, c = features.shape[1], features.shape[2]
    k = idx.shape[2]
    tile = _tile_for(nq, ns, mode)
    qp, nq0 = _pad_queries(query_xyz, tile)
    ip, _ = _pad_queries(idx, tile)
    mp, _ = _pad_queries(mask, tile)
    ntile = qp.shape[1] // tile

    if mode == "xyz":
        kern = functools.partial(
            _xyz_fwd_kernel, k=k, ns=ns, channels=c, radius=float(radius),
            reduction=reduction)
        sx = jnp.swapaxes(support_xyz, 1, 2)  # [B, 3, Ns]
    elif mode == "sin_cos":
        kern = functools.partial(
            _sc_fwd_kernel, k=k, ns=ns, channels=c, radius=float(radius),
            reduction=reduction)
        sx = support_xyz
    else:
        raise ValueError(mode)

    qspec, sspec, fspec, ispec = _specs(tile, ns, c, k, mode == "xyz")
    out = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[qspec, sspec, fspec, ispec, ispec],
        out_specs=pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, qp.shape[1], c), features.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=_interpret(),
    )(qp, sx, features, ip, mp)
    return out[:, :nq0]


def _pospool_fwd(query_xyz, support_xyz, features, idx, mask,
                 radius, mode, reduction):
    out = _pospool_call(query_xyz, support_xyz, features, idx, mask,
                        radius, mode, reduction)
    return out, (query_xyz, support_xyz, features, idx, mask)


def _pospool_bwd(radius, mode, reduction, res, dy):
    query_xyz, support_xyz, features, idx, mask = res
    b = query_xyz.shape[0]
    ns, c = features.shape[1], features.shape[2]
    k = idx.shape[2]
    tile = _tile_for(query_xyz.shape[1], ns, mode)
    qp, _ = _pad_queries(query_xyz, tile)
    ip, _ = _pad_queries(idx, tile)
    mp, _ = _pad_queries(mask, tile)
    dyp, _ = _pad_queries(dy, tile)
    ntile = qp.shape[1] // tile

    if mode == "xyz":
        kern = functools.partial(
            _xyz_bwd_kernel, k=k, ns=ns, channels=c, radius=float(radius),
            reduction=reduction)
        sx = jnp.swapaxes(support_xyz, 1, 2)
    else:
        kern = functools.partial(
            _sc_bwd_kernel, k=k, ns=ns, channels=c, radius=float(radius),
            reduction=reduction)
        sx = support_xyz

    qspec, sspec, _, ispec = _specs(tile, ns, c, k, mode == "xyz")
    dyspec = pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0),
                          memory_space=pltpu.VMEM)
    dfeats = pl.pallas_call(
        kern,
        grid=(b, ntile),
        in_specs=[qspec, sspec, ispec, ispec, dyspec],
        out_specs=pl.BlockSpec((1, ns, c), lambda bi, ti: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ns, c), features.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=_interpret(),
    )(qp, sx, ip, mp, dyp)
    return (jnp.zeros_like(query_xyz), jnp.zeros_like(support_xyz),
            dfeats, None, None)


pospool_fused.defvjp(_pospool_fwd, _pospool_bwd)
