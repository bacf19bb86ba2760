"""Op-level tests: ball query / knn vs brute-force numpy references."""

import numpy as np
import jax.numpy as jnp

from closerlook3d_tpu.ops import ball_query, knn, pairwise_dist2


def np_dist2(q, s):
    return ((q[:, :, None, :] - s[:, None, :, :]) ** 2).sum(-1)


def np_ball_query(q, s, radius, k, qmask, smask):
    """Brute-force reference: k nearest within radius, ascending distance."""
    b, nq, _ = q.shape
    idx = np.zeros((b, nq, k), np.int32)
    mask = np.zeros((b, nq, k), bool)
    d2 = np_dist2(q, s)
    d2[~np.broadcast_to(smask[:, None, :], d2.shape)] = np.inf
    for bi in range(b):
        for qi in range(nq):
            order = np.argsort(d2[bi, qi], kind="stable")[:k]
            dk = d2[bi, qi, order]
            ok = dk <= radius * radius
            sel = np.where(ok, order, order[0])
            idx[bi, qi] = sel
            mask[bi, qi] = ok & qmask[bi, qi]
    return idx, mask


def make_cloud(rng, b=2, n=64, frac_valid=0.8):
    pts = rng.uniform(-1, 1, size=(b, n, 3)).astype(np.float32)
    nvalid = int(n * frac_valid)
    mask = np.zeros((b, n), bool)
    mask[:, :nvalid] = True
    return pts, mask


def test_pairwise_dist2_matches_numpy(rng):
    q = rng.normal(size=(2, 8, 3)).astype(np.float32)
    s = rng.normal(size=(2, 12, 3)).astype(np.float32)
    got = np.asarray(pairwise_dist2(jnp.array(q), jnp.array(s)))
    np.testing.assert_allclose(got, np_dist2(q, s), rtol=1e-4, atol=1e-4)


def test_ball_query_matches_reference(rng):
    q, qmask = make_cloud(rng, n=32)
    s, smask = make_cloud(rng, n=64)
    radius, k = 0.6, 8
    idx, mask = ball_query(
        jnp.array(q), jnp.array(s), radius, k,
        query_mask=jnp.array(qmask), support_mask=jnp.array(smask),
    )
    ridx, rmask = np_ball_query(q, s, radius, k, qmask, smask)
    np.testing.assert_array_equal(np.asarray(mask), rmask)
    # indices must agree wherever the slot is valid (ties can permute
    # equal distances; random float coords make exact ties measure-zero)
    np.testing.assert_array_equal(
        np.asarray(idx)[rmask], ridx[rmask]
    )


def test_ball_query_sorted_by_distance(rng):
    q, qmask = make_cloud(rng, n=16, frac_valid=1.0)
    idx, mask = ball_query(jnp.array(q), jnp.array(q), 0.9, 6)
    d2 = np_dist2(q, q)
    got = np.take_along_axis(d2, np.asarray(idx), axis=2)
    m = np.asarray(mask)
    for bi in range(q.shape[0]):
        for qi in range(q.shape[1]):
            dk = got[bi, qi][m[bi, qi]]
            assert np.all(np.diff(dk) >= -1e-6)
    # self is always the nearest neighbor of itself
    assert np.all(np.asarray(idx)[..., 0] == np.arange(q.shape[1])[None, :])


def test_ball_query_padding_invariance(rng):
    """Garbage in padded support slots must not change valid outputs."""
    q, qmask = make_cloud(rng, n=16)
    s, smask = make_cloud(rng, n=32)
    idx1, m1 = ball_query(
        jnp.array(q), jnp.array(s), 0.7, 5,
        query_mask=jnp.array(qmask), support_mask=jnp.array(smask),
    )
    s2 = s.copy()
    s2[~smask] = 123.0  # scribble on padding
    idx2, m2 = ball_query(
        jnp.array(q), jnp.array(s2), 0.7, 5,
        query_mask=jnp.array(qmask), support_mask=jnp.array(smask),
    )
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(
        np.asarray(idx1)[np.asarray(m1)], np.asarray(idx2)[np.asarray(m2)]
    )


def test_ball_query_chunked_equals_unchunked(rng):
    q, qmask = make_cloud(rng, n=64)
    s, smask = make_cloud(rng, n=64)
    a = ball_query(jnp.array(q), jnp.array(s), 0.5, 4,
                   query_mask=jnp.array(qmask), support_mask=jnp.array(smask))
    b = ball_query(jnp.array(q), jnp.array(s), 0.5, 4,
                   query_mask=jnp.array(qmask), support_mask=jnp.array(smask),
                   chunk_size=16)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_knn_basic(rng):
    q, _ = make_cloud(rng, n=8, frac_valid=1.0)
    s, smask = make_cloud(rng, n=24)
    idx, d2 = knn(jnp.array(q), jnp.array(s), 3, support_mask=jnp.array(smask))
    ref = np_dist2(q, s)
    ref[~np.broadcast_to(smask[:, None, :], ref.shape)] = np.inf
    ridx = np.argsort(ref, axis=2, kind="stable")[..., :3]
    np.testing.assert_array_equal(np.asarray(idx), ridx)


def test_ball_query_slot0_is_self_at_same_resolution(rng):
    """Same-resolution blocks: the query IS a support point, d=0 sorts
    first -> slot 0 is the query itself. PointWiseMLP's df term
    (models/aggregation.py) relies on this to recover the reference's
    exact f_j - f_i center-feature semantics."""
    pts, mask = make_cloud(rng, n=48)
    idx, nmask = ball_query(jnp.array(pts), jnp.array(pts), 0.4, 8,
                            query_mask=jnp.array(mask),
                            support_mask=jnp.array(mask))
    idx, nmask = np.asarray(idx), np.asarray(nmask)
    valid = mask & nmask[..., 0]
    want = np.broadcast_to(np.arange(48)[None], (2, 48))
    np.testing.assert_array_equal(idx[..., 0][valid], want[valid])


def test_ball_query_slot0_is_1nn_when_strided(rng):
    """Strided blocks (queries not in the support set): slot 0 is the
    in-radius 1-NN, i.e. knn(k=1) wherever any neighbor is in radius —
    the same nearest-carrier convention the reference's
    MaskedNearestQuery (N3) uses at stage transitions."""
    q, qmask = make_cloud(rng, b=2, n=16, frac_valid=1.0)
    s, smask = make_cloud(rng, b=2, n=64)
    radius = 0.7
    idx, nmask = ball_query(jnp.array(q), jnp.array(s), radius, 8,
                            query_mask=jnp.array(qmask),
                            support_mask=jnp.array(smask))
    nn_idx, nn_d2 = knn(jnp.array(q), jnp.array(s), 1,
                        support_mask=jnp.array(smask))
    idx, nmask = np.asarray(idx), np.asarray(nmask)
    nn_idx, nn_d2 = np.asarray(nn_idx), np.asarray(nn_d2)
    has_in_radius = nn_d2[..., 0] <= radius * radius
    assert has_in_radius.any()
    np.testing.assert_array_equal(idx[..., 0][has_in_radius],
                                  nn_idx[..., 0][has_in_radius])
    # and ball-query marks exactly those queries as having neighbors
    np.testing.assert_array_equal(nmask[..., 0], has_in_radius & qmask)
