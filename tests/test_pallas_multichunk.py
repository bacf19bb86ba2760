"""Multi-chunk parity for every chunk-skipping kernel family.

The support sets here exceed one _NS_CHUNK so the chunk loop + active-
chunk flags + chunk-restricted one-hot paths are all exercised (the
per-family single-chunk tests cannot reach them). Interpret mode on CPU;
references are straight jnp gathers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import conftest

B, NQ, NS, K, C = 1, 260, 2600, 7, 12  # NS spans 2 chunks (cs=2048)
RADIUS = 0.35


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    conftest.pallas_test_mode(monkeypatch)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(17)
    q = jnp.asarray(rng.uniform(-1, 1, (B, NQ, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(-1, 1, (B, NS, 3)), jnp.float32)
    f = jnp.asarray(rng.normal(size=(B, NS, C)), jnp.float32)
    # distinct slots per row (like ball query): duplicate neighbor
    # indices make extremum ties whose subgradient routing is
    # implementation-defined (fused: all ties; jnp: even split)
    idx = jnp.asarray(
        np.argsort(rng.random((B, NQ, NS)), axis=-1)[..., :K], jnp.int32)
    mask = jnp.asarray(rng.uniform(size=(B, NQ, K)) < 0.8)
    mask = mask.at[0, :3].set(False)  # some all-padding neighborhoods
    return q, s, f, idx, mask


def gather(x, idx):
    return jnp.stack([x[b][idx[b]] for b in range(B)])


def check_grads(fused_fn, ref_fn, f):
    gf = jax.grad(lambda f: jnp.sum(fused_fn(f) ** 2))(f)
    gr = jax.grad(lambda f: jnp.sum(ref_fn(f) ** 2))(f)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=2e-4, atol=2e-5)


def test_pospool_sincos_multichunk(data):
    from closerlook3d_tpu.models.aggregation import sinusoidal_embedding
    from closerlook3d_tpu.ops.pallas.aggregation import pospool_fused
    q, s, f, idx, mask = data

    def ref(f):
        dp = (gather(s, idx) - q[:, :, None, :]) / RADIUS
        emb = sinusoidal_embedding(dp, C)
        enc = jnp.where(mask[..., None], gather(f, idx) * emb, 0.0)
        cnt = jnp.maximum(mask.sum(-1, keepdims=True).astype(jnp.float32),
                          1.0)
        return enc.sum(2) / cnt

    fused = lambda f: pospool_fused(q, s, f, idx, mask, RADIUS,
                                    "sin_cos", "avg")
    # sin/cos evaluated on different hw paths: slightly looser tolerance
    np.testing.assert_allclose(np.asarray(fused(f)), np.asarray(ref(f)),
                               rtol=5e-3, atol=1e-4)
    gf = jax.grad(lambda f: jnp.sum(fused(f) ** 2))(f)
    gr = jax.grad(lambda f: jnp.sum(ref(f) ** 2))(f)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=5e-3, atol=1e-4)


def test_pseudo_grid_multichunk(data):
    from closerlook3d_tpu.models.aggregation import (
        _typical_spacing, kernel_point_layout)
    from closerlook3d_tpu.ops.pallas.pseudo_grid import pseudo_grid_fused
    q, s, f, idx, mask = data
    kp_np = kernel_point_layout(5, "center")
    extent = float(1.0 * _typical_spacing(kp_np))
    kp = jnp.asarray(kp_np)

    def ref(f):
        dp = (gather(s, idx) - q[:, :, None, :]) / RADIUS
        d = jnp.linalg.norm(dp[..., None, :] - kp, axis=-1)  # [B,Nq,K,Kp]
        infl = jnp.maximum(1.0 - d / extent, 0.0)
        infl = infl * mask[..., None]
        h = jnp.einsum("bnkp,bnkc->bnpc", infl, gather(f, idx))
        return h.reshape(B, NQ, -1)

    fused = lambda f: pseudo_grid_fused(q, s, f, idx, mask, kp, RADIUS,
                                        extent, "linear")
    np.testing.assert_allclose(np.asarray(fused(f)), np.asarray(ref(f)),
                               rtol=2e-4, atol=2e-5)
    check_grads(fused, ref, f)


def test_minmax_multichunk(data):
    from closerlook3d_tpu.ops.pallas.gather_reduce import gather_sub_minmax
    q, s, f, idx, mask = data
    d = jnp.asarray(np.random.default_rng(3).normal(size=(B, NQ, C)),
                    jnp.float32)

    def ref_pair(f, d):
        h = gather(f, idx) - d[:, :, None, :]
        big = jnp.float32(3e38)
        v = jnp.any(mask, -1, keepdims=True)
        hmax = jnp.where(v, jnp.where(mask[..., None], h, -big).max(2), 0.)
        hmin = jnp.where(v, jnp.where(mask[..., None], h, big).min(2), 0.)
        return hmax, hmin

    hmax, hmin = gather_sub_minmax(f, d, idx, mask)
    rmax, rmin = ref_pair(f, d)
    np.testing.assert_allclose(np.asarray(hmax), np.asarray(rmax),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hmin), np.asarray(rmin),
                               rtol=1e-5, atol=1e-6)
    # gradient through both outputs and both inputs
    gf, gd = jax.grad(
        lambda f, d: jnp.sum(jnp.stack(
            gather_sub_minmax(f, d, idx, mask)) ** 2), argnums=(0, 1))(f, d)

    def ref_loss(f, d):
        hmax, hmin = ref_pair(f, d)
        return jnp.sum(hmax**2) + jnp.sum(hmin**2)

    rf, rd = jax.grad(ref_loss, argnums=(0, 1))(f, d)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(rf),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(rd),
                               rtol=2e-4, atol=2e-4)


def test_moments_multichunk(data):
    from closerlook3d_tpu.ops.pallas.moments import neighborhood_moments
    q, s, f, idx, mask = data

    def ref(f):
        dp = (gather(s, idx) - q[:, :, None, :]) / RADIUS
        fj = gather(f, idx)
        m = mask[..., None].astype(jnp.float32)
        cnt = jnp.maximum(mask.sum(-1, keepdims=True).astype(jnp.float32),
                          1.0)
        parts = [jnp.sum(fj * m, 2) / cnt]
        for di in range(3):
            parts.append(jnp.sum(fj * dp[..., di:di + 1] * m, 2) / cnt)
        return jnp.concatenate(parts, axis=-1)

    fused = lambda f: neighborhood_moments(q, s, f, idx, mask, RADIUS,
                                           "avg")
    np.testing.assert_allclose(np.asarray(fused(f)), np.asarray(ref(f)),
                               rtol=2e-4, atol=2e-5)
    check_grads(fused, ref, f)


def test_neighborhood_sum_multichunk(data):
    from closerlook3d_tpu.ops.pallas.gather_reduce import neighborhood_sum
    q, s, f, idx, mask = data

    def ref(f):
        fj = gather(f, idx)
        return jnp.sum(fj * mask[..., None], 2)

    fused = lambda f: neighborhood_sum(f, idx, mask)
    np.testing.assert_allclose(np.asarray(fused(f)), np.asarray(ref(f)),
                               rtol=1e-5, atol=1e-6)
    check_grads(fused, ref, f)


def test_neighborhood_max_matches_jnp():
    """Fused gather+max kernel vs the jnp reference (fwd + grad)."""
    import jax
    import jax.numpy as jnp
    from closerlook3d_tpu.ops.grouping import group_features, masked_max
    from closerlook3d_tpu.ops.pallas.gather_reduce import neighborhood_max

    rng = np.random.default_rng(21)
    B, Ns, Nq, K, C = 2, 600, 160, 9, 24
    feats = jnp.array(rng.normal(size=(B, Ns, C)).astype(np.float32))
    idx = jnp.array(rng.integers(0, Ns, size=(B, Nq, K)).astype(np.int32))
    mask = jnp.array(rng.uniform(size=(B, Nq, K)) < 0.7)
    # one query with zero valid neighbors (empty -> 0 convention)
    mask = mask.at[0, 3].set(False)

    ref = masked_max(group_features(feats, idx), mask)
    out = neighborhood_max(feats, idx, mask)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-6, atol=1e-6)
    assert not np.asarray(out)[0, 3].any()

    # gradients (values are distinct floats -> no argmax ties, so the
    # kernel's first-wins routing matches jnp's even tie-split)
    dy = jnp.array(rng.normal(size=ref.shape).astype(np.float32))
    gref = jax.grad(lambda f: jnp.vdot(
        masked_max(group_features(f, idx), mask), dy))(feats)
    gout = jax.grad(lambda f: jnp.vdot(
        neighborhood_max(f, idx, mask), dy))(feats)
    np.testing.assert_allclose(np.asarray(gref), np.asarray(gout),
                               rtol=1e-5, atol=1e-5)


def test_pseudo_grid_tiny_folded_stage():
    """Deep-stage shape (nq=2 x b=16 folds to 32 queries): the slot-
    group reshapes need a lane-aligned tile, so the wrapper must pad
    tiny tiles up to 128 — Mosaic rejects the [K,T]->[1,K*T] shape
    cast at t=32 (round-5 parity probe, partseg stage 4). Compiled in
    TPU mode, interpret on CPU."""
    from closerlook3d_tpu.models.aggregation import kernel_point_layout
    from closerlook3d_tpu.ops.pallas.pseudo_grid import pseudo_grid_fused

    rng = np.random.default_rng(2)
    b, nq, ns, c, k = 16, 2, 8, 8, 16
    q = jnp.asarray(rng.uniform(-1, 1, (b, nq, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(-1, 1, (b, ns, 3)), jnp.float32)
    f = jnp.asarray(rng.normal(size=(b, ns, c)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, ns, (b, nq, k)), jnp.int32)
    mask = jnp.asarray(rng.random((b, nq, k)) < 0.7)
    kp = jnp.asarray(kernel_point_layout(5), jnp.float32)

    out = pseudo_grid_fused(q, s, f, idx, mask, kp, 0.5, 0.6, "linear")
    assert out.shape == (b, nq, 5 * c)

    def ref(f):
        fj = jnp.take_along_axis(
            f, idx.reshape(b, -1)[..., None], axis=1).reshape(b, nq, k, c)
        pj = jnp.take_along_axis(
            s, idx.reshape(b, -1)[..., None], axis=1).reshape(b, nq, k, 3)
        u = (pj - q[:, :, None, :]) / 0.5
        d = jnp.linalg.norm(u[:, :, :, None, :] - kp[None, None, None],
                            axis=-1)
        w = jnp.maximum(1.0 - d / 0.6, 0.0) * mask[..., None]
        h = jnp.einsum("bnkp,bnkc->bnpc", w, fj)
        return h.reshape(b, nq, -1)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(f)),
                               rtol=2e-4, atol=2e-5)

    g = jax.grad(lambda f: jnp.sum(
        pseudo_grid_fused(q, s, f, idx, mask, kp, 0.5, 0.6, "linear")
        ** 2))(f)
    assert np.all(np.isfinite(np.asarray(g)))
