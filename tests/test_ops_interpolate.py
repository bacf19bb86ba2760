"""Op-level tests: grouping, masked reductions, 3-NN interpolation."""

import numpy as np
import jax.numpy as jnp

from closerlook3d_tpu.ops import (
    group_features,
    masked_avg,
    masked_max,
    masked_sum,
    nearest_upsample,
    three_interpolate,
)


def test_group_features(rng):
    f = rng.normal(size=(2, 10, 4)).astype(np.float32)
    idx = rng.integers(0, 10, size=(2, 5, 3)).astype(np.int32)
    out = np.asarray(group_features(jnp.array(f), jnp.array(idx)))
    for b in range(2):
        for q in range(5):
            for k in range(3):
                np.testing.assert_array_equal(out[b, q, k], f[b, idx[b, q, k]])


def test_masked_reductions(rng):
    v = rng.normal(size=(2, 4, 6, 3)).astype(np.float32)
    m = rng.random(size=(2, 4, 6)) > 0.4
    m[0, 0] = False  # one empty neighborhood
    got_max = np.asarray(masked_max(jnp.array(v), jnp.array(m)))
    got_avg = np.asarray(masked_avg(jnp.array(v), jnp.array(m)))
    got_sum = np.asarray(masked_sum(jnp.array(v), jnp.array(m)))
    for b in range(2):
        for q in range(4):
            sel = v[b, q][m[b, q]]
            if sel.size == 0:
                np.testing.assert_array_equal(got_max[b, q], 0.0)
                np.testing.assert_array_equal(got_avg[b, q], 0.0)
                np.testing.assert_array_equal(got_sum[b, q], 0.0)
            else:
                np.testing.assert_allclose(got_max[b, q], sel.max(0), rtol=1e-6)
                np.testing.assert_allclose(
                    got_avg[b, q], sel.mean(0), rtol=1e-5, atol=1e-6)
                np.testing.assert_allclose(
                    got_sum[b, q], sel.sum(0), rtol=1e-5, atol=1e-6)


def test_three_interpolate_exact_at_support(rng):
    """Query exactly at a support point -> (near) that support's feature."""
    s = rng.uniform(-1, 1, size=(1, 20, 3)).astype(np.float32)
    f = rng.normal(size=(1, 20, 5)).astype(np.float32)
    out = np.asarray(three_interpolate(jnp.array(s), jnp.array(s), jnp.array(f)))
    np.testing.assert_allclose(out, f, rtol=1e-3, atol=1e-3)


def test_three_interpolate_matches_numpy(rng):
    q = rng.uniform(-1, 1, size=(2, 7, 3)).astype(np.float32)
    s = rng.uniform(-1, 1, size=(2, 15, 3)).astype(np.float32)
    f = rng.normal(size=(2, 15, 4)).astype(np.float32)
    smask = np.ones((2, 15), bool)
    smask[1, 10:] = False
    got = np.asarray(three_interpolate(
        jnp.array(q), jnp.array(s), jnp.array(f), jnp.array(smask)))
    for b in range(2):
        for qi in range(7):
            d2 = ((s[b] - q[b, qi]) ** 2).sum(-1)
            d2[~smask[b]] = np.inf
            order = np.argsort(d2)[:3]
            w = 1.0 / np.maximum(d2[order], 1e-10)
            w = w / w.sum()
            ref = (f[b, order] * w[:, None]).sum(0)
            np.testing.assert_allclose(got[b, qi], ref, rtol=1e-4, atol=1e-5)


def test_nearest_upsample(rng):
    q = rng.uniform(-1, 1, size=(1, 9, 3)).astype(np.float32)
    s = rng.uniform(-1, 1, size=(1, 6, 3)).astype(np.float32)
    f = rng.normal(size=(1, 6, 2)).astype(np.float32)
    got = np.asarray(nearest_upsample(jnp.array(q), jnp.array(s), jnp.array(f)))
    for qi in range(9):
        d2 = ((s[0] - q[0, qi]) ** 2).sum(-1)
        np.testing.assert_array_equal(got[0, qi], f[0, d2.argmin()])
