"""Fused PosPool Pallas kernel vs jnp reference (interpret mode on CPU)."""

import numpy as np
import pytest

import conftest
import jax
import jax.numpy as jnp

from closerlook3d_tpu.models.aggregation import sinusoidal_embedding
from closerlook3d_tpu.ops import ball_query
from closerlook3d_tpu.ops.grouping import (
    group_features, group_xyz, masked_avg, masked_sum)
from closerlook3d_tpu.ops.pallas.aggregation import pospool_fused

B, N, K, C = 2, 96, 6, 12
RADIUS = 0.5


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    conftest.pallas_test_mode(monkeypatch)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    xyz = jnp.array(rng.uniform(-1, 1, size=(B, N, 3)).astype(np.float32))
    feats = jnp.array(rng.normal(size=(B, N, C)).astype(np.float32))
    mask = np.ones((B, N), bool)
    mask[1, 70:] = False
    mask = jnp.array(mask)
    idx, nmask = ball_query(xyz, xyz, RADIUS, K,
                            query_mask=mask, support_mask=mask)
    return xyz, feats, idx, nmask


def jnp_pospool(feats, xyz, idx, nmask, mode, reduction):
    f = group_features(feats, idx)
    pj = group_xyz(xyz, idx)
    dp = (pj - xyz[:, :, None, :]) / RADIUS
    if mode == "xyz":
        g = C // 3
        enc = jnp.concatenate(
            [f[..., :g] * dp[..., 0:1], f[..., g:2 * g] * dp[..., 1:2],
             f[..., 2 * g:] * dp[..., 2:3]], -1)
    else:
        enc = f * sinusoidal_embedding(dp, C)
    red = masked_avg if reduction == "avg" else masked_sum
    return red(enc, nmask)


@pytest.mark.parametrize("mode", ["xyz", "sin_cos"])
@pytest.mark.parametrize("reduction", ["avg", "sum"])
def test_fused_matches_reference(data, mode, reduction):
    xyz, feats, idx, nmask = data
    ref = jnp_pospool(feats, xyz, idx, nmask, mode, reduction)
    got = pospool_fused(xyz, xyz, feats, idx, nmask, RADIUS, mode,
                        reduction)
    # sin_cos: the fused kernel factorizes via sin/cos(u-v) identities
    # on chunk-recentred absolute angles; f32 trig argument reduction
    # and the self-neighbor sin(0) cancellation cost ~1e-4 absolute vs
    # the direct small-angle form (exact math, different association) —
    # far below bf16 resolution (~4e-3 relative).
    tol = dict(rtol=1e-4, atol=1e-5) if mode == "xyz" else \
        dict(rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **tol)


@pytest.mark.parametrize("mode", ["xyz", "sin_cos"])
def test_fused_gradient_matches(data, mode):
    xyz, feats, idx, nmask = data

    def loss_ref(f):
        return jnp.sum(jnp_pospool(f, xyz, idx, nmask, mode, "avg") ** 2)

    def loss_fused(f):
        return jnp.sum(
            pospool_fused(xyz, xyz, f, idx, nmask, RADIUS, mode, "avg")**2)

    g_ref = jax.grad(loss_ref)(feats)
    g_fus = jax.grad(loss_fused)(feats)
    tol = dict(rtol=1e-4, atol=1e-5) if mode == "xyz" else \
        dict(rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(g_fus), np.asarray(g_ref),
                               **tol)


def test_fused_padding_invariance(data):
    """Garbage features at masked support slots must not leak (they can
    only be selected as shadow indices, which are masked)."""
    xyz, feats, idx, nmask = data
    a = pospool_fused(xyz, xyz, feats, idx, nmask, RADIUS, "xyz", "avg")
    f2 = np.asarray(feats).copy()
    f2[1, 70:] = 999.0
    b = pospool_fused(xyz, xyz, jnp.array(f2), idx, nmask, RADIUS,
                      "xyz", "avg")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)
