"""Pallas furthest-point-sampling kernel.

Parity: the reference's PointNet++-lineage FPS CUDA kernel (N1) and the
jnp reference in ops/sampling.py (identical greedy sequence, identical
tiebreaks).

Design: FPS is sequential in npoint but embarrassingly parallel over the
batch — so the whole batch runs in ONE kernel invocation with the
min-distance matrix laid out [B, N] (batch on sublanes, points on
lanes: full VPU tiles). Each greedy step is a handful of [B, N]
elementwise/reduce passes; picks accumulate into lane one-hots and the
current coordinates come from masked row-sums (no dynamic addressing).
The XLA while-loop version pays per-iteration dispatch overhead instead.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from closerlook3d_tpu.ops.pallas.aggregation import _interpret


def _fps_kernel(xyzp_ref, mask_ref, out_ref, *, n: int, npoint: int):
    # xyzp [3, B, N]; mask [B, N]; out [B, npoint]
    b = mask_ref.shape[0]
    x = xyzp_ref[0]  # [B, N]
    y = xyzp_ref[1]
    z = xyzp_ref[2]
    valid = mask_ref[:]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (b, npoint), 1)

    mindist = jnp.where(valid, 1e10, -1.0).astype(jnp.float32)
    first = jnp.min(jnp.where(valid, iota_n, n), axis=1, keepdims=True)

    def body(i, carry):
        mindist, cur, out = carry  # [B,N] f32, [B,1] i32, [B,npoint] i32
        out = out + cur * (iota_p == i).astype(jnp.int32)
        oh = (iota_n == cur).astype(jnp.float32)  # [B, N]
        selx = jnp.sum(x * oh, axis=1, keepdims=True)  # [B, 1]
        sely = jnp.sum(y * oh, axis=1, keepdims=True)
        selz = jnp.sum(z * oh, axis=1, keepdims=True)
        d2 = (x - selx) ** 2 + (y - sely) ** 2 + (z - selz) ** 2
        mindist = jnp.minimum(mindist, d2)
        dmax = jnp.max(mindist, axis=1, keepdims=True)
        # first (lowest) index on ties — the jnp argmax tiebreak
        cand = jnp.where(mindist == dmax, iota_n, n)
        cur = jnp.min(cand, axis=1, keepdims=True)
        return mindist, cur, out

    out = jnp.zeros((b, npoint), jnp.int32)
    _, _, out = jax.lax.fori_loop(0, npoint, body, (mindist, first, out))
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("npoint",))
def furthest_point_sample_pallas(xyz, npoint: int, mask=None
                                 ) -> Tuple[jax.Array, jax.Array]:
    """Drop-in for ops.sampling.furthest_point_sample."""
    b, n, _ = xyz.shape
    if mask is None:
        mask = jnp.ones((b, n), bool)
    xyzp = jnp.transpose(xyz.astype(jnp.float32), (2, 0, 1))  # [3, B, N]

    kern = functools.partial(_fps_kernel, n=n, npoint=npoint)
    idx = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, npoint), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(xyzp, mask)
    nvalid = jnp.sum(mask, axis=1)
    slot = jnp.arange(npoint, dtype=jnp.int32)[None, :]
    return idx, slot < nvalid[:, None]
