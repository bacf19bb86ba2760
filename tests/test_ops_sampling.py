"""Op-level tests: FPS and grid subsampling vs numpy references."""

import numpy as np
import jax.numpy as jnp

from closerlook3d_tpu.ops import furthest_point_sample, grid_subsample


def np_fps(xyz, npoint, mask):
    b, n, _ = xyz.shape
    out = np.zeros((b, npoint), np.int32)
    for bi in range(b):
        valid = mask[bi]
        mind = np.where(valid, 1e10, -1.0)
        cur = int(np.argmax(valid))
        for i in range(npoint):
            out[bi, i] = cur
            d = ((xyz[bi] - xyz[bi, cur]) ** 2).sum(-1)
            mind = np.minimum(mind, d)
            cur = int(np.argmax(mind))
    return out


def test_fps_matches_reference(rng):
    xyz = rng.uniform(-1, 1, size=(2, 40, 3)).astype(np.float32)
    mask = np.ones((2, 40), bool)
    mask[1, 30:] = False
    idx, smask = furthest_point_sample(jnp.array(xyz), 10, jnp.array(mask))
    ref = np_fps(xyz, 10, mask)
    np.testing.assert_array_equal(np.asarray(idx), ref)
    assert np.asarray(smask).all()


def test_fps_never_selects_padding(rng):
    xyz = rng.uniform(-1, 1, size=(1, 32, 3)).astype(np.float32)
    mask = np.zeros((1, 32), bool)
    mask[0, :20] = True
    idx, smask = furthest_point_sample(jnp.array(xyz), 16, jnp.array(mask))
    assert np.all(np.asarray(idx) < 20)
    assert np.asarray(smask).all()


def test_fps_exhausted_cloud_marks_padding(rng):
    xyz = rng.uniform(-1, 1, size=(1, 16, 3)).astype(np.float32)
    mask = np.zeros((1, 16), bool)
    mask[0, :5] = True
    idx, smask = furthest_point_sample(jnp.array(xyz), 8, jnp.array(mask))
    assert np.all(np.asarray(idx) < 5)
    np.testing.assert_array_equal(
        np.asarray(smask)[0], np.array([1, 1, 1, 1, 1, 0, 0, 0], bool)
    )


def test_fps_coverage_property(rng):
    """FPS picks are spread: each selected point is far from the others."""
    xyz = rng.uniform(-1, 1, size=(1, 256, 3)).astype(np.float32)
    idx, _ = furthest_point_sample(jnp.array(xyz), 32)
    sel = xyz[0, np.asarray(idx)[0]]
    assert len(np.unique(np.asarray(idx)[0])) == 32
    # min pairwise distance among FPS picks beats random picks (strongly)
    def min_pair(p):
        d = ((p[:, None] - p[None]) ** 2).sum(-1)
        np.fill_diagonal(d, np.inf)
        return d.min()
    rnd = xyz[0, rng.choice(256, 32, replace=False)]
    assert min_pair(sel) > min_pair(rnd)


def np_morton(cells):
    """Bit-interleaved Morton code per row of [N, 3] cell coords."""
    out = np.zeros(len(cells), np.int64)
    for bit in range(10):
        out |= ((cells[:, 0] >> bit) & 1) << (3 * bit)
        out |= ((cells[:, 1] >> bit) & 1) << (3 * bit + 1)
        out |= ((cells[:, 2] >> bit) & 1) << (3 * bit + 2)
    return out


def np_grid_subsample(xyz, cell, mask):
    """Voxel barycenters, in Morton-key order (matches the op)."""
    mins = xyz[mask].min(0)
    cells = np.floor((xyz - mins) / cell).astype(np.int64).clip(0, 1023)
    key = np_morton(cells)
    out = []
    for k in np.unique(key[mask]):
        sel = mask & (key == k)
        out.append(xyz[sel].mean(0))
    return np.stack(out)


def test_grid_subsample_matches_reference(rng):
    xyz = rng.uniform(0, 1, size=(1, 200, 3)).astype(np.float32)
    mask = np.zeros((1, 200), bool)
    mask[0, :150] = True
    sub, smask = grid_subsample(jnp.array(xyz), 0.25, 64, jnp.array(mask))
    ref = np_grid_subsample(xyz[0], 0.25, mask[0])
    got = np.asarray(sub)[0][np.asarray(smask)[0]]
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_grid_subsample_padding_invariance(rng):
    xyz = rng.uniform(0, 1, size=(2, 100, 3)).astype(np.float32)
    mask = np.zeros((2, 100), bool)
    mask[:, :70] = True
    a = grid_subsample(jnp.array(xyz), 0.3, 40, jnp.array(mask))
    xyz2 = xyz.copy()
    xyz2[~mask] = -55.0
    b = grid_subsample(jnp.array(xyz2), 0.3, 40, jnp.array(mask))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_allclose(
        np.asarray(a[0])[np.asarray(a[1])],
        np.asarray(b[0])[np.asarray(b[1])],
        rtol=1e-5, atol=1e-6,
    )


def test_grid_subsample_overflow_truncates(rng):
    xyz = rng.uniform(0, 1, size=(1, 64, 3)).astype(np.float32)
    sub, smask = grid_subsample(jnp.array(xyz), 0.01, 16)  # every pt own voxel
    assert np.asarray(smask).sum() == 16  # budget filled, excess dropped
