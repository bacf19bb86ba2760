"""Moments kernel + fused adaptive-weight vs jnp paths (interpret mode)."""

import numpy as np
import pytest

import conftest
import jax
import jax.numpy as jnp

from closerlook3d_tpu.ops import ball_query
from closerlook3d_tpu.ops.grouping import (
    group_features, group_xyz, masked_avg, masked_sum)
from closerlook3d_tpu.ops.pallas.moments import neighborhood_moments

B, N, K, C = 2, 80, 5, 8
RADIUS = 0.5


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    conftest.pallas_test_mode(monkeypatch)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(5)
    xyz = jnp.array(rng.uniform(-1, 1, size=(B, N, 3)).astype(np.float32))
    feats = jnp.array(rng.normal(size=(B, N, C)).astype(np.float32))
    mask = np.ones((B, N), bool)
    mask[0, 60:] = False
    mask = jnp.array(mask)
    idx, nmask = ball_query(xyz, xyz, RADIUS, K,
                            query_mask=mask, support_mask=mask)
    return xyz, feats, idx, nmask


def jnp_moments(feats, xyz, idx, nmask, reduction):
    f = group_features(feats, idx)
    pj = group_xyz(xyz, idx)
    dp = (pj - xyz[:, :, None, :]) / RADIUS
    red = masked_avg if reduction == "avg" else masked_sum
    return jnp.concatenate(
        [red(f, nmask)] + [red(f * dp[..., d:d + 1], nmask)
                           for d in range(3)], axis=-1)


@pytest.mark.parametrize("reduction", ["avg", "sum"])
def test_moments_match_reference(data, reduction):
    xyz, feats, idx, nmask = data
    ref = jnp_moments(feats, xyz, idx, nmask, reduction)
    got = neighborhood_moments(xyz, xyz, feats, idx, nmask, RADIUS,
                               reduction)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_moments_gradient(data):
    xyz, feats, idx, nmask = data

    def loss_ref(f):
        return jnp.sum(jnp_moments(f, xyz, idx, nmask, "avg") ** 2)

    def loss_fused(f):
        return jnp.sum(neighborhood_moments(
            xyz, xyz, f, idx, nmask, RADIUS, "avg") ** 2)

    g_ref = jax.grad(loss_ref)(feats)
    g_fus = jax.grad(loss_fused)(feats)
    np.testing.assert_allclose(np.asarray(g_fus), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_adaptive_weight_matches_jnp(data):
    """Same params, same inputs: fused (use_pallas=always, interpret) must
    equal the gather-based jnp path (use_pallas=never)."""
    from closerlook3d_tpu.models.aggregation import LocalAggregation
    from closerlook3d_tpu.utils.config import load_config

    xyz, feats, idx, nmask = data
    outs = {}
    for flag in ("never", "always"):
        cfg = load_config()
        cfg.local_aggregation_type = "adaptive_weight"
        cfg.use_pallas = flag
        cfg.precision = "f32"
        la = LocalAggregation(C, RADIUS, cfg)
        variables = la.init(jax.random.PRNGKey(0), xyz, xyz, feats, idx,
                            nmask)
        outs[flag] = np.asarray(
            la.apply(variables, xyz, xyz, feats, idx, nmask))
        params = jax.tree_util.tree_leaves(variables["params"])
        nparam = sum(p.size for p in params)
        outs[flag + "_nparam"] = nparam
    assert outs["never_nparam"] == outs["always_nparam"]
    np.testing.assert_allclose(outs["always"], outs["never"],
                               rtol=1e-4, atol=1e-5)


def test_fused_pseudo_grid_matches_jnp(data):
    """Fused KPConv-style correlation must equal the jnp path exactly."""
    from closerlook3d_tpu.models.aggregation import LocalAggregation
    from closerlook3d_tpu.utils.config import load_config
    import jax

    xyz, feats, idx, nmask = data
    outs = {}
    for flag in ("never", "always"):
        cfg = load_config()
        cfg.local_aggregation_type = "pseudo_grid"
        cfg.pseudo_grid.num_kernel_points = 5
        cfg.use_pallas = flag
        cfg.precision = "f32"
        la = LocalAggregation(C, RADIUS, cfg)
        variables = la.init(jax.random.PRNGKey(0), xyz, xyz, feats, idx,
                            nmask)
        outs[flag] = np.asarray(
            la.apply(variables, xyz, xyz, feats, idx, nmask))
    np.testing.assert_allclose(outs["always"], outs["never"],
                               rtol=2e-4, atol=2e-5)


def test_fused_pseudo_grid_gradients(data):
    from closerlook3d_tpu.models.aggregation import LocalAggregation
    from closerlook3d_tpu.utils.config import load_config
    import jax

    xyz, feats, idx, nmask = data
    grads = {}
    for flag in ("never", "always"):
        cfg = load_config()
        cfg.local_aggregation_type = "pseudo_grid"
        cfg.pseudo_grid.num_kernel_points = 5
        cfg.use_pallas = flag
        cfg.precision = "f32"
        la = LocalAggregation(C, RADIUS, cfg)
        variables = la.init(jax.random.PRNGKey(0), xyz, xyz, feats, idx,
                            nmask)

        def loss(params, f):
            return jnp.sum(la.apply(
                {"params": params}, xyz, xyz, f, idx, nmask) ** 2)

        grads[flag] = jax.grad(loss, argnums=(0, 1))(
            variables["params"], feats)
    for a, b_ in zip(jax.tree_util.tree_leaves(grads["never"]),
                     jax.tree_util.tree_leaves(grads["always"])):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)
