"""Pallas ball-query and FPS kernels vs jnp references (interpret mode)."""

import numpy as np
import pytest
import jax.numpy as jnp

import conftest
from closerlook3d_tpu.ops.neighbors import ball_query
from closerlook3d_tpu.ops.sampling import furthest_point_sample
from closerlook3d_tpu.ops.pallas.neighbors import ball_query_pallas
from closerlook3d_tpu.ops.pallas.sampling import furthest_point_sample_pallas


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    # reference entry points stay jnp in both CPU and TPU modes
    conftest.pallas_test_mode(monkeypatch, ops_impl="jnp")


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(4)
    xyz = rng.uniform(-1, 1, size=(2, 96, 3)).astype(np.float32)
    mask = np.ones((2, 96), bool)
    mask[1, 80:] = False
    return jnp.array(xyz), jnp.array(mask)


def test_ball_query_pallas_matches_jnp(cloud):
    xyz, mask = cloud
    ri, rm = ball_query(xyz, xyz, 0.5, 8, query_mask=mask,
                        support_mask=mask)
    pi, pm = ball_query_pallas(xyz, xyz, 0.5, 8, query_mask=mask,
                               support_mask=mask)
    np.testing.assert_array_equal(np.asarray(rm), np.asarray(pm))
    rm_ = np.asarray(rm)
    np.testing.assert_array_equal(np.asarray(ri)[rm_], np.asarray(pi)[rm_])


def test_ball_query_pallas_shadow_padding(cloud):
    xyz, mask = cloud
    pi, pm = ball_query_pallas(xyz, xyz, 0.3, 6, query_mask=mask,
                               support_mask=mask)
    pi, pm = np.asarray(pi), np.asarray(pm)
    # invalid slots repeat the nearest neighbor (slot 0)
    for b in range(2):
        for q in range(96):
            if pm[b, q, 0] and not pm[b, q].all():
                bad = ~pm[b, q]
                np.testing.assert_array_equal(pi[b, q][bad],
                                              pi[b, q, 0])


def test_fps_pallas_matches_jnp(cloud):
    xyz, mask = cloud
    ri, rm = furthest_point_sample(xyz, 24, mask)
    pi, pm = furthest_point_sample_pallas(xyz, 24, mask)
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(pi))
    np.testing.assert_array_equal(np.asarray(rm), np.asarray(pm))


def test_fps_pallas_no_mask(cloud):
    xyz, _ = cloud
    ri, _ = furthest_point_sample(xyz, 16)
    pi, _ = furthest_point_sample_pallas(xyz, 16)
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(pi))


def test_ball_query_chunked_matches_jnp():
    from closerlook3d_tpu.ops.pallas.neighbors import (
        ball_query_pallas_chunked)
    from closerlook3d_tpu.data.spatial_host import morton_sort_batch

    rng = np.random.default_rng(11)
    xyz = rng.uniform(-1, 1, size=(2, 1200, 3)).astype(np.float32)
    mask = np.ones((2, 1200), bool)
    mask[1, 1000:] = False
    b = morton_sort_batch({"xyz": xyz, "mask": mask})
    x, m = jnp.array(b["xyz"]), jnp.array(b["mask"])
    cases = [
        (x, m, x, m, 0.25, 8),           # same-res
        (x[:, :256], m[:, :256], x, m, 0.4, 16),  # strided
        (x, m, x[:, :512], m[:, :512], 0.3, 4),   # upscale-style
    ]
    for q, qm, s, sm, r, k in cases:
        ri, rm = ball_query(q, s, r, k, query_mask=qm, support_mask=sm)
        pi, pm = ball_query_pallas_chunked(q, s, r, k, query_mask=qm,
                                           support_mask=sm)
        np.testing.assert_array_equal(np.asarray(rm), np.asarray(pm))
        rm_ = np.asarray(rm)
        np.testing.assert_array_equal(np.asarray(ri)[rm_],
                                      np.asarray(pi)[rm_])
        pi_ = np.asarray(pi)
        assert (pi_ >= 0).all() and (pi_ < s.shape[1]).all()


def test_ball_query_chunked_unsorted_still_exact():
    """bbox pruning must stay correct for arbitrary (unsorted) input."""
    from closerlook3d_tpu.ops.pallas.neighbors import (
        ball_query_pallas_chunked)

    rng = np.random.default_rng(12)
    xyz = jnp.array(rng.uniform(-1, 1, size=(1, 640, 3)).astype(np.float32))
    ri, rm = ball_query(xyz, xyz, 0.35, 6)
    pi, pm = ball_query_pallas_chunked(xyz, xyz, 0.35, 6)
    np.testing.assert_array_equal(np.asarray(rm), np.asarray(pm))
    rm_ = np.asarray(rm)
    np.testing.assert_array_equal(np.asarray(ri)[rm_], np.asarray(pi)[rm_])


def test_knn1_chunked_matches_jnp():
    from closerlook3d_tpu.ops.neighbors import knn
    from closerlook3d_tpu.ops.pallas.neighbors import knn1_pallas_chunked
    from closerlook3d_tpu.data.spatial_host import morton_sort_batch

    rng = np.random.default_rng(31)
    q = rng.uniform(-1, 1, size=(2, 900, 3)).astype(np.float32)
    s = rng.uniform(-1, 1, size=(2, 1200, 3)).astype(np.float32)
    smask = np.ones((2, 1200), bool)
    smask[1, 1000:] = False
    bs = morton_sort_batch({"xyz": s, "mask": smask})
    s, smask = jnp.array(bs["xyz"]), jnp.array(bs["mask"])
    q = jnp.array(morton_sort_batch({"xyz": q,
                                     "mask": np.ones((2, 900), bool)})["xyz"])
    ri, rd = knn(q, s, 1, support_mask=smask)
    pi, pd = knn1_pallas_chunked(q, s, support_mask=smask)
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(pi))
    np.testing.assert_allclose(np.asarray(rd), np.asarray(pd),
                               rtol=1e-5, atol=1e-6)


def test_knn1_chunked_unsorted_still_exact():
    from closerlook3d_tpu.ops.neighbors import knn
    from closerlook3d_tpu.ops.pallas.neighbors import knn1_pallas_chunked

    rng = np.random.default_rng(32)
    q = jnp.array(rng.uniform(-1, 1, size=(1, 300, 3)).astype(np.float32))
    s = jnp.array(rng.uniform(-1, 1, size=(1, 1100, 3)).astype(np.float32))
    ri, _ = knn(q, s, 1)
    pi, _ = knn1_pallas_chunked(q, s)
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(pi))


def test_ball_query_folded_matches_unfolded():
    """Deep-stage shapes (b>1, nq<128) take the batch-folded kernel;
    outputs must EXACTLY match the unfolded path (selection and
    tiebreaks are batch-local), incl. masked queries, empty
    neighborhoods, and a batch with no valid support."""
    import conftest  # noqa: F401  (interpret-mode env via module fixture)
    from closerlook3d_tpu.ops.pallas.neighbors import (
        _bq_folded, ball_query_pallas)

    rng = np.random.default_rng(31)
    b, nq, ns, k, radius = 4, 88, 304, 41, 0.8
    q = jnp.asarray(rng.uniform(-2, 2, (b, nq, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(-2, 2, (b, ns, 3)), jnp.float32)
    qm = jnp.asarray(rng.random((b, nq)) < 0.9)
    sm = jnp.asarray(rng.random((b, ns)) < 0.9)
    sm = sm.at[2].set(False)  # batch with zero valid supports

    fi, fm = _bq_folded(q, s, radius, k, qm, sm)
    # the unfolded reference: bypass the dispatch by making nq >= 128
    # via padding, then slice
    pad = 128 - nq
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    qmp = jnp.pad(qm, ((0, 0), (0, pad)))
    ui, um = ball_query_pallas(qp, s, radius, k, query_mask=qmp,
                               support_mask=sm)
    ui, um = ui[:, :nq], um[:, :nq]
    np.testing.assert_array_equal(np.asarray(fm), np.asarray(um))
    # FULL equality incl. shadow slots: slot 0 carries the nearest
    # index even out-of-radius (pwmlp df nearest-carrier reads it)
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(ui))
    assert np.asarray(fi).min() >= 0 and np.asarray(fi).max() < ns
