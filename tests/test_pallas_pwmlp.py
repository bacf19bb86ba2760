"""Factorized point-wise MLP vs the gather-based jnp path (interpret mode)."""

import numpy as np
import pytest

import conftest
import jax
import jax.numpy as jnp

from closerlook3d_tpu.models.aggregation import LocalAggregation
from closerlook3d_tpu.ops import ball_query
from closerlook3d_tpu.ops.pallas.gather_reduce import (
    gather_sub_minmax, neighborhood_sum, pwmlp_minmax_stats)
from closerlook3d_tpu.utils.config import load_config

B, N, K, C, COUT = 2, 64, 6, 8, 16
RADIUS = 0.5


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    conftest.pallas_test_mode(monkeypatch)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(9)
    xyz = jnp.array(rng.uniform(-1, 1, size=(B, N, 3)).astype(np.float32))
    feats = jnp.array(rng.normal(size=(B, N, C)).astype(np.float32))
    mask = np.ones((B, N), bool)
    mask[0, 50:] = False
    mask = jnp.array(mask)
    idx, nmask = ball_query(xyz, xyz, RADIUS, K,
                            query_mask=mask, support_mask=mask)
    return xyz, feats, idx, nmask


def test_neighborhood_sum(data):
    xyz, feats, idx, nmask = data
    got = np.asarray(neighborhood_sum(feats, idx, nmask))
    f = np.asarray(feats)
    i = np.asarray(idx)
    m = np.asarray(nmask)
    for b in range(B):
        for q in range(0, N, 7):
            ref = (f[b, i[b, q]] * m[b, q][:, None]).sum(0)
            np.testing.assert_allclose(got[b, q], ref, rtol=1e-4, atol=1e-5)


def test_gather_sub_minmax_fwd_bwd(data):
    xyz, feats, idx, nmask = data
    rng = np.random.default_rng(11)
    g = jnp.array(rng.normal(size=(B, N, COUT)).astype(np.float32))
    d = jnp.array(rng.normal(size=(B, N, COUT)).astype(np.float32))

    def ref_fn(g, d):
        gf = jnp.take_along_axis(
            g, idx.reshape(B, -1)[..., None], axis=1).reshape(B, N, K, COUT)
        h = gf - d[:, :, None, :]
        big = jnp.float32(3e38)
        hmax = jnp.max(jnp.where(nmask[..., None], h, -big), axis=2)
        hmin = jnp.min(jnp.where(nmask[..., None], h, big), axis=2)
        return hmax, hmin

    rmax, rmin = ref_fn(g, d)
    gmax, gmin = gather_sub_minmax(g, d, idx, nmask)
    valid = np.asarray(jnp.any(nmask, -1))
    np.testing.assert_allclose(np.asarray(gmax)[valid],
                               np.asarray(rmax)[valid], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gmin)[valid],
                               np.asarray(rmin)[valid], rtol=1e-5)

    def loss_ref(g, d):
        hmax, hmin = ref_fn(g, d)
        v = jnp.any(nmask, -1, keepdims=True)
        return jnp.sum(jnp.where(v, hmax**2 + 0.5 * hmin, 0.0))

    def loss_fused(g, d):
        hmax, hmin = gather_sub_minmax(g, d, idx, nmask)
        v = jnp.any(nmask, -1, keepdims=True)
        return jnp.sum(jnp.where(v, hmax**2 + 0.5 * hmin, 0.0))

    gr = jax.grad(loss_ref, argnums=(0, 1))(g, d)
    gf = jax.grad(loss_fused, argnums=(0, 1))(g, d)
    for a, b_ in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_pwmlp_minmax_stats_fwd_bwd(data):
    """Fused train kernel vs the composition it replaces."""
    xyz, feats, idx, nmask = data
    rng = np.random.default_rng(13)
    g = jnp.array(rng.normal(size=(B, N, COUT)).astype(np.float32))

    def ref(g):
        gf = jnp.take_along_axis(
            g, idx.reshape(B, -1)[..., None], axis=1).reshape(B, N, K, COUT)
        big = jnp.float32(3e38)
        mk = nmask[..., None]
        gmax = jnp.max(jnp.where(mk, gf, -big), axis=2)
        gmin = jnp.min(jnp.where(mk, gf, big), axis=2)
        s1 = jnp.sum(jnp.where(mk, gf, 0.0), axis=2)
        s2 = jnp.sum(jnp.where(mk, gf**2, 0.0), axis=2)
        return gmax, gmin, s1, s2

    refs = ref(g)
    got = pwmlp_minmax_stats(g, g * g, idx, nmask)
    valid = np.asarray(jnp.any(nmask, -1))
    for r, o, name in zip(refs, got, ("gmax", "gmin", "s1", "s2")):
        r, o = np.asarray(r), np.asarray(o)
        if name in ("gmax", "gmin"):
            np.testing.assert_allclose(o[valid], r[valid], rtol=1e-5,
                                       err_msg=name)
        else:
            np.testing.assert_allclose(o, r, rtol=1e-4, atol=1e-5,
                                       err_msg=name)

    v = jnp.any(nmask, -1, keepdims=True)

    def loss_ref(g):
        gmax, gmin, s1, s2 = ref(g)
        return jnp.sum(jnp.where(v, gmax**2 + 0.5 * gmin, 0.0)) \
            + jnp.sum(s1 * 0.25 + s2 * 0.125)

    def loss_fused(g):
        gmax, gmin, s1, s2 = pwmlp_minmax_stats(g, g * g, idx, nmask)
        return jnp.sum(jnp.where(v, gmax**2 + 0.5 * gmin, 0.0)) \
            + jnp.sum(s1 * 0.25 + s2 * 0.125)

    gr = jax.grad(loss_ref)(g)
    gf = jax.grad(loss_fused)(g)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("feature_type", ["dp_fi_df", "dp", "dp_fi"])
@pytest.mark.parametrize("train", [False, True])
def test_fused_pwmlp_matches_jnp(data, feature_type, train):
    xyz, feats, idx, nmask = data
    outs, stats = {}, {}
    for flag in ("never", "always"):
        cfg = load_config()
        cfg.local_aggregation_type = "pointwisemlp"
        cfg.pointwisemlp.feature_type = feature_type
        cfg.use_pallas = flag
        cfg.precision = "f32"
        la = LocalAggregation(COUT, RADIUS, cfg)
        variables = la.init(jax.random.PRNGKey(0), xyz, xyz, feats, idx,
                            nmask)
        if train:
            out, mutated = la.apply(variables, xyz, xyz, feats, idx, nmask,
                                    train=True, mutable=["batch_stats"])
            stats[flag] = jax.tree_util.tree_leaves(mutated["batch_stats"])
        else:
            out = la.apply(variables, xyz, xyz, feats, idx, nmask)
        outs[flag] = np.asarray(out)
    np.testing.assert_allclose(outs["always"], outs["never"],
                               rtol=2e-4, atol=2e-5)
    if train:
        for a, b_ in zip(stats["never"], stats["always"]):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                       rtol=2e-4, atol=2e-5)


def test_fused_pwmlp_gradients_match(data):
    xyz, feats, idx, nmask = data

    def make(flag):
        cfg = load_config()
        cfg.local_aggregation_type = "pointwisemlp"
        cfg.use_pallas = flag
        cfg.precision = "f32"
        la = LocalAggregation(COUT, RADIUS, cfg)
        variables = la.init(jax.random.PRNGKey(0), xyz, xyz, feats, idx,
                            nmask)
        def loss(params, f):
            out, _ = la.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                xyz, xyz, f, idx, nmask, train=True,
                mutable=["batch_stats"])
            return jnp.sum(out**2)
        return variables["params"], loss

    p_ref, loss_ref = make("never")
    p_fus, loss_fus = make("always")
    gr = jax.grad(loss_ref, argnums=(0, 1))(p_ref, feats)
    gf = jax.grad(loss_fus, argnums=(0, 1))(p_fus, feats)
    for a, b_ in zip(jax.tree_util.tree_leaves(gr),
                     jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("occ", [1, 13, 26])
def test_occupancy_paths(occ):
    """The reduction kernels pick a dense (wide one-hot) or sparse
    (unrolled slot groups) path per tile on the tile's true occupancy;
    sweep sparse / boundary (2*hi == k) / saturated against numpy."""
    from closerlook3d_tpu.ops.pallas.gather_reduce import neighborhood_max

    rng = np.random.default_rng(occ)
    b, nq, ns, c, k = 1, 256, 512, 8, 26
    f = jnp.asarray(rng.normal(size=(b, ns, c)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, ns, (b, nq, k)), jnp.int32)
    cnt = rng.integers(0, occ + 1, (b, nq))
    mask = jnp.asarray(np.arange(k)[None, None] < cnt[..., None])
    idx = jnp.where(mask, idx, idx[:, :, :1])
    m0 = np.asarray(mask)[0]
    fm = np.where(m0[..., None], np.asarray(f)[0][np.asarray(idx)[0]],
                  -np.inf)
    anyv = m0.any(-1)[..., None]
    ref_max = np.where(anyv, fm.max(1), 0.0)
    got = np.asarray(neighborhood_max(f, idx, mask))[0]
    np.testing.assert_allclose(got, ref_max, atol=1e-5)

    gmax, gmin, s1, s2 = pwmlp_minmax_stats(f, f * f, idx, mask)
    fmn = np.where(m0[..., None], np.asarray(f)[0][np.asarray(idx)[0]],
                   np.inf)
    np.testing.assert_allclose(
        np.where(anyv, np.asarray(gmax)[0], 0),
        np.where(anyv, fm.max(1), 0), atol=1e-5)
    np.testing.assert_allclose(
        np.where(anyv, np.asarray(gmin)[0], 0),
        np.where(anyv, fmn.min(1), 0), atol=1e-5)
    fz = np.where(m0[..., None], np.asarray(f)[0][np.asarray(idx)[0]], 0)
    np.testing.assert_allclose(np.asarray(s1)[0], fz.sum(1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2)[0], (fz * fz).sum(1),
                               atol=1e-4)

    # gradient routing stays exact on every path
    def loss(f):
        out = neighborhood_max(f, idx, mask)
        return jnp.sum(out * jnp.arange(c, dtype=jnp.float32))

    g = jax.grad(loss)(f)
    assert np.all(np.isfinite(np.asarray(g)))
