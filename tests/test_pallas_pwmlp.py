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
        v = jnp.any(nmask, -1, keepdims=True)
        hmax = jnp.max(jnp.where(nmask[..., None], h, -big), axis=2)
        hmin = jnp.min(jnp.where(nmask[..., None], h, big), axis=2)
        # empty-neighborhood convention: 0, never the sentinel
        return jnp.where(v, hmax, 0.0), jnp.where(v, hmin, 0.0)

    rmax, rmin = ref_fn(g, d)
    gmax, gmin = gather_sub_minmax(g, d, idx, nmask)
    # full-array compare: empty queries must be EXACTLY 0 (a ±3e38
    # sentinel that escapes overflows downstream — VERDICT r4 item 1a)
    np.testing.assert_allclose(np.asarray(gmax), np.asarray(rmax),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gmin), np.asarray(rmin),
                               rtol=1e-5)

    # deliberately UNMASKED loss: with the old sentinel convention this
    # produced 0*inf = NaN cotangents on TPU (compiled), poisoning the
    # backward dot_generals — the regression this pins
    def loss_ref(g, d):
        hmax, hmin = ref_fn(g, d)
        return jnp.sum(hmax**2 + 0.5 * hmin)

    def loss_fused(g, d):
        hmax, hmin = gather_sub_minmax(g, d, idx, nmask)
        return jnp.sum(hmax**2 + 0.5 * hmin)

    gr = jax.grad(loss_ref, argnums=(0, 1))(g, d)
    gf = jax.grad(loss_fused, argnums=(0, 1))(g, d)
    for a, b_ in zip(gr, gf):
        assert np.all(np.isfinite(np.asarray(b_)))
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
        v = jnp.any(nmask, -1, keepdims=True)
        gmax = jnp.where(v, jnp.max(jnp.where(mk, gf, -big), axis=2), 0.0)
        gmin = jnp.where(v, jnp.min(jnp.where(mk, gf, big), axis=2), 0.0)
        s1 = jnp.sum(jnp.where(mk, gf, 0.0), axis=2)
        s2 = jnp.sum(jnp.where(mk, gf**2, 0.0), axis=2)
        return gmax, gmin, s1, s2

    refs = ref(g)
    got = pwmlp_minmax_stats(g, g * g, idx, nmask)
    for r, o, name in zip(refs, got, ("gmax", "gmin", "s1", "s2")):
        r, o = np.asarray(r), np.asarray(o)
        if name in ("gmax", "gmin"):
            np.testing.assert_allclose(o, r, rtol=1e-5, err_msg=name)
        else:
            np.testing.assert_allclose(o, r, rtol=1e-4, atol=1e-5,
                                       err_msg=name)

    # unmasked loss: pins the empty->0 convention end to end (the old
    # ±3e38 convention NaN'd the compiled VJP through 0*inf cotangents)
    def loss_ref(g):
        gmax, gmin, s1, s2 = ref(g)
        return jnp.sum(gmax**2 + 0.5 * gmin) \
            + jnp.sum(s1 * 0.25 + s2 * 0.125)

    def loss_fused(g):
        gmax, gmin, s1, s2 = pwmlp_minmax_stats(g, g * g, idx, nmask)
        return jnp.sum(gmax**2 + 0.5 * gmin) \
            + jnp.sum(s1 * 0.25 + s2 * 0.125)

    gr = jax.grad(loss_ref)(g)
    gf = jax.grad(loss_fused)(g)
    assert np.all(np.isfinite(np.asarray(gf)))
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


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_minmax_all_masked_unaligned(dtype):
    """Empty neighborhoods + unaligned shapes at production dtypes
    (VERDICT r4 item 1a): outputs must be exactly 0 at empty queries and
    gradients finite under an UNMASKED consumer — the sentinel-escape
    regression, at bf16 as well as f32."""
    dt = jnp.dtype(dtype)
    rng = np.random.default_rng(3)
    b, nq, ns, c, k = 2, 100, 70, 16, 6  # nq deliberately not 8/128-mult
    g = jnp.asarray(rng.normal(size=(b, ns, c)), dt)
    d = jnp.asarray(rng.normal(size=(b, nq, c)), dt)
    idx = jnp.asarray(rng.integers(0, ns, (b, nq, k)), jnp.int32)
    cnt = rng.integers(0, k + 1, (b, nq))
    cnt[0, :17] = 0   # a run of fully-masked queries
    cnt[1, -9:] = 0   # incl. at the padded tail
    mask = jnp.asarray(np.arange(k)[None, None] < cnt[..., None])

    hmax, hmin = gather_sub_minmax(g, d, idx, mask)
    empty = ~np.asarray(mask).any(-1)
    assert np.all(np.asarray(hmax)[empty] == 0.0)
    assert np.all(np.asarray(hmin)[empty] == 0.0)

    def loss(g, d):
        hmax, hmin = gather_sub_minmax(g, d, idx, mask)
        return jnp.sum(hmax.astype(jnp.float32) ** 2
                       + 0.5 * hmin.astype(jnp.float32))

    dg, dd = jax.grad(loss, argnums=(0, 1))(g, d)
    assert np.all(np.isfinite(np.asarray(dg, np.float32)))
    assert np.all(np.isfinite(np.asarray(dd, np.float32)))

    gmax, gmin, s1, s2 = pwmlp_minmax_stats(g, g * g, idx, mask)
    for o in (gmax, gmin, s1, s2):
        o = np.asarray(o)
        assert np.all(np.isfinite(o))
        assert np.all(o[empty] == 0.0)

    def loss2(g):
        gmax, gmin, s1, s2 = pwmlp_minmax_stats(g, g * g, idx, mask)
        return jnp.sum(gmax**2 + 0.5 * gmin + 0.25 * s1 + 0.125 * s2)

    dg2 = jax.grad(loss2)(g)
    assert np.all(np.isfinite(np.asarray(dg2, np.float32)))


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
