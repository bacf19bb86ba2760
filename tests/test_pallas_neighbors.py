"""Pallas ball-query and FPS kernels vs jnp references (interpret mode)."""

import numpy as np
import pytest
import jax.numpy as jnp

from closerlook3d_tpu.ops.neighbors import ball_query
from closerlook3d_tpu.ops.sampling import furthest_point_sample
from closerlook3d_tpu.ops.pallas.neighbors import ball_query_pallas
from closerlook3d_tpu.ops.pallas.sampling import furthest_point_sample_pallas


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("CL3D_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("CL3D_OPS_IMPL", "jnp")  # reference entry points


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
