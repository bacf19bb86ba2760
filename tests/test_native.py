"""Native C++ ops vs numpy/scipy references (N7 grid subsample, N8 kd-tree)."""

import numpy as np
import pytest

from closerlook3d_tpu.native import HAVE_NATIVE

pytestmark = pytest.mark.skipif(
    not HAVE_NATIVE,
    reason="native extension not built (python -m closerlook3d_tpu.native.build)")


def test_grid_subsample_matches_numpy(rng):
    from closerlook3d_tpu.native import grid_subsample_cpu

    pts = rng.uniform(0, 2, size=(500, 3)).astype(np.float32)
    feats = rng.normal(size=(500, 4)).astype(np.float32)
    labels = rng.integers(0, 5, size=500).astype(np.int32)
    cell = 0.4
    sp, sf, sl = grid_subsample_cpu(pts, cell, feats, labels)

    mins = pts.min(0)
    keys = tuple(map(tuple, np.floor((pts - mins) / cell).astype(int)))
    groups = {}
    for i, k in enumerate(keys):
        groups.setdefault(k, []).append(i)
    assert len(sp) == len(groups)
    # match each voxel barycenter irrespective of output order
    ref = sorted(
        (tuple(np.round(pts[g].mean(0), 4)), tuple(np.round(feats[g].mean(0), 4)))
        for g in (np.array(v) for v in groups.values()))
    got = sorted(
        (tuple(np.round(p, 4)), tuple(np.round(f, 4))) for p, f in zip(sp, sf))
    for (rp, rf), (gp, gf) in zip(ref, got):
        np.testing.assert_allclose(rp, gp, atol=2e-3)
        np.testing.assert_allclose(rf, gf, atol=2e-3)
    assert sl.shape == (len(sp),)
    assert sl.min() >= 0 and sl.max() < 5


def test_kdtree_knn_matches_bruteforce(rng):
    from closerlook3d_tpu.native import KDTree

    pts = rng.uniform(-1, 1, size=(400, 3)).astype(np.float32)
    q = rng.uniform(-1, 1, size=(50, 3)).astype(np.float32)
    tree = KDTree(pts)
    dist, idx = tree.query(q, k=5)
    d2 = ((q[:, None, :] - pts[None]) ** 2).sum(-1)
    ref_idx = np.argsort(d2, axis=1)[:, :5]
    ref_d = np.sqrt(np.take_along_axis(d2, ref_idx, axis=1))
    np.testing.assert_allclose(dist, ref_d, rtol=1e-4, atol=1e-5)
    # indices may permute under exact ties; distances fully determine them here
    np.testing.assert_array_equal(idx, ref_idx)


def test_kdtree_radius_matches_bruteforce(rng):
    from closerlook3d_tpu.native import KDTree

    pts = rng.uniform(-1, 1, size=(300, 3)).astype(np.float32)
    tree = KDTree(pts)
    for _ in range(5):
        c = rng.uniform(-1, 1, size=3).astype(np.float32)
        r = 0.5
        got = set(tree.query_ball_point(c, r).tolist())
        ref = set(np.flatnonzero(((pts - c) ** 2).sum(-1) <= r * r).tolist())
        assert got == ref


def test_native_kdtree_matches_scipy_return_convention():
    """k=1 must return squeezed [M] arrays exactly like scipy.cKDTree
    (callers index with the result; a [M,1] index array would silently
    broadcast np.add.at confusion indices — caught by the S3DIS
    voting-eval oracle test)."""
    import numpy as np
    import pytest
    from scipy.spatial import cKDTree
    from closerlook3d_tpu.native import HAVE_NATIVE, KDTree

    if not HAVE_NATIVE:
        pytest.skip("native extension not built")
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, size=(50, 3)).astype(np.float32)
    q = rng.uniform(-1, 1, size=(9, 3)).astype(np.float32)
    for k in (1, 3):
        dn, idxn = KDTree(pts).query(q, k=k)
        ds, idxs = cKDTree(pts).query(q, k=k)
        assert idxn.shape == idxs.shape and dn.shape == ds.shape
        np.testing.assert_array_equal(idxn, idxs)
        np.testing.assert_allclose(dn, ds, rtol=1e-5, atol=1e-6)
