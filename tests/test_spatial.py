"""Spatial ordering (Morton sort) + chunk-skipping kernel parity.

The sort is a pure performance device: every fused kernel must produce
identical results for ANY point ordering, and the models must return
per-point outputs in the caller's order regardless of internal sorting.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import conftest

from closerlook3d_tpu.ops.spatial import (
    apply_permutation,
    morton_code,
    morton_keys,
    morton_sort,
)


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(7)
    b, n = 2, 700
    xyz = rng.uniform(-3, 3, (b, n, 3)).astype(np.float32)
    mask = rng.uniform(size=(b, n)) < 0.9
    return jnp.asarray(xyz), jnp.asarray(mask)


def test_morton_code_matches_bit_interleave():
    rng = np.random.default_rng(0)
    cells = rng.integers(0, 1024, (50, 3)).astype(np.int32)
    got = np.asarray(morton_code(jnp.asarray(cells)))
    for (cx, cy, cz), code in zip(cells, got):
        expect = 0
        for bit in range(10):
            expect |= ((cx >> bit) & 1) << (3 * bit)
            expect |= ((cy >> bit) & 1) << (3 * bit + 1)
            expect |= ((cz >> bit) & 1) << (3 * bit + 2)
        assert code == expect


def test_morton_sort_is_permutation_and_invalid_last(cloud):
    xyz, mask = cloud
    perm, inv = morton_sort(xyz, mask)
    b, n = perm.shape
    for bi in range(b):
        assert sorted(np.asarray(perm[bi]).tolist()) == list(range(n))
    # inv really inverts
    ident = apply_permutation(apply_permutation(xyz, perm), inv)
    np.testing.assert_array_equal(np.asarray(ident), np.asarray(xyz))
    # invalid points occupy the tail
    msort = np.asarray(apply_permutation(mask, perm))
    for bi in range(b):
        nv = msort[bi].sum()
        assert msort[bi, :nv].all() and not msort[bi, nv:].any()


def test_morton_keys_sorted_means_local(cloud):
    """Sorted order must beat random order on tile spatial spread."""
    xyz, mask = cloud
    perm, _ = morton_sort(xyz, mask)
    xs = np.asarray(apply_permutation(xyz, perm))[0]
    xr = np.asarray(xyz)[0]
    tile = 64

    def mean_tile_spread(pts):
        spreads = []
        for i in range(0, len(pts) - tile, tile):
            t = pts[i:i + tile]
            spreads.append(np.linalg.norm(t.max(0) - t.min(0)))
        return np.mean(spreads)

    assert mean_tile_spread(xs) < 0.7 * mean_tile_spread(xr)


def test_chunk_flags_cover_all_indices():
    from closerlook3d_tpu.ops.pallas.aggregation import _chunk_flags
    rng = np.random.default_rng(3)
    b, nq, k, cs, nchunks = 2, 300, 8, 512, 4
    idx = jnp.asarray(rng.integers(0, cs * nchunks, (b, nq, k)), jnp.int32)
    mask = jnp.asarray(rng.uniform(size=(b, nq, k)) < 0.8)
    tile = 128
    flags = np.asarray(_chunk_flags(idx, mask, tile, cs, nchunks))
    idxp = np.full((b, 384, k), 0, np.int32)
    idxp[:, :nq] = np.asarray(idx)
    maskp = np.zeros((b, 384, k), bool)
    maskp[:, :nq] = np.asarray(mask)
    for bi in range(b):
        for ti in range(384 // tile):
            ids = idxp[bi, ti * tile:(ti + 1) * tile]
            ms = maskp[bi, ti * tile:(ti + 1) * tile]
            want = np.zeros(nchunks, bool)
            for c in np.unique(ids[ms] // cs):
                want[c] = True
            np.testing.assert_array_equal(flags[bi, ti] != 0, want)


def test_pospool_fused_invariant_to_support_order(monkeypatch):
    """Chunk-skipping kernel: sorted vs shuffled support, same answer."""
    conftest.pallas_test_mode(monkeypatch)
    from closerlook3d_tpu.ops.pallas.aggregation import pospool_fused

    rng = np.random.default_rng(5)
    b, nq, ns, k, c = 1, 256, 2100, 8, 6
    q = jnp.asarray(rng.uniform(-1, 1, (b, nq, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(-1, 1, (b, ns, 3)), jnp.float32)
    f = jnp.asarray(rng.normal(size=(b, ns, c)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, ns, (b, nq, k)), jnp.int32)
    mask = jnp.asarray(rng.uniform(size=(b, nq, k)) < 0.8)

    out1 = pospool_fused(q, s, f, idx, mask, 0.4, "xyz", "avg")

    shuf = jnp.asarray(rng.permutation(ns).astype(np.int32))[None]
    s2 = apply_permutation(s, shuf)
    f2 = apply_permutation(f, shuf)
    inv = jnp.argsort(shuf, axis=1).astype(jnp.int32)
    idx2 = inv[0][idx]
    out2 = pospool_fused(q, s2, f2, idx2, mask, 0.4, "xyz", "avg")
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("task", ["scene_segmentation"])
def test_model_output_invariant_to_spatial_sort(task):
    """spatial_sort always vs never: identical logits in caller order."""
    from closerlook3d_tpu.models import build_model
    from closerlook3d_tpu.utils.config import load_config

    rng = np.random.default_rng(11)
    b, n = 1, 512
    xyz = jnp.asarray(rng.uniform(-2, 2, (b, n, 3)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(b, n)) < 0.95)
    feats = jnp.concatenate(
        [jnp.ones((b, n, 1)), xyz[..., 2:3]], axis=-1).astype(jnp.float32)

    outs = {}
    for mode in ("never", "always"):
        cfg = load_config()
        cfg.task = task
        cfg.num_classes = 9
        cfg.num_points = n
        cfg.npoints = [n, 128, 32]
        cfg.nsamples = [8, 8, 8]
        cfg.sampling = "grid"
        cfg.width = 24
        cfg.depth = 1
        cfg.precision = "f32"
        cfg.use_pallas = "never"
        cfg.spatial_sort = mode
        cfg.input_features_dim = 2
        model, _ = build_model(cfg)
        variables = model.init(jax.random.PRNGKey(0), xyz, mask, feats)
        outs[mode] = np.asarray(
            model.apply(variables, xyz, mask, feats))
    # masked positions may differ (padding is arbitrary); valid must match
    m = np.asarray(mask)[..., None]
    np.testing.assert_allclose(
        np.where(m, outs["always"], 0.0), np.where(m, outs["never"], 0.0),
        rtol=2e-4, atol=2e-4)


def test_host_morton_sort_matches_device_keys():
    """data/spatial_host numpy keys == ops/spatial jnp keys."""
    from closerlook3d_tpu.data.spatial_host import morton_keys_np
    from closerlook3d_tpu.ops.spatial import morton_keys

    rng = np.random.default_rng(3)
    xyz = rng.uniform(-3, 5, (2, 300, 3)).astype(np.float32)
    mask = rng.uniform(size=(2, 300)) < 0.9
    np.testing.assert_array_equal(
        morton_keys_np(xyz, mask),
        np.asarray(morton_keys(jnp.asarray(xyz), jnp.asarray(mask))))


def test_host_morton_sort_batch_consistency():
    """All per-point arrays are permuted consistently; per-cloud keys
    pass through; invalid points end up last."""
    from closerlook3d_tpu.data.spatial_host import morton_sort_batch

    rng = np.random.default_rng(4)
    b, n = 2, 257
    xyz = rng.uniform(-1, 1, (b, n, 3)).astype(np.float32)
    mask = rng.uniform(size=(b, n)) < 0.8
    labels = rng.integers(0, 13, (b, n)).astype(np.int32)
    point_idx = np.tile(np.arange(n, dtype=np.int64), (b, 1))
    label = rng.integers(0, 40, (b,)).astype(np.int32)
    batch = {"xyz": xyz, "mask": mask, "labels": labels,
             "point_idx": point_idx, "label": label,
             "batch_pad": np.zeros(b, bool)}
    out = morton_sort_batch({k: v.copy() for k, v in batch.items()})

    np.testing.assert_array_equal(out["label"], label)
    for bb in range(b):
        # point_idx recovers the permutation; every array must follow it
        perm = out["point_idx"][bb]
        np.testing.assert_array_equal(out["xyz"][bb], xyz[bb][perm])
        np.testing.assert_array_equal(out["mask"][bb], mask[bb][perm])
        np.testing.assert_array_equal(out["labels"][bb], labels[bb][perm])
        # invalid points moved to the end
        v = out["mask"][bb]
        first_invalid = np.argmin(v) if not v.all() else n
        assert not v[first_invalid:].any()


def test_model_host_sorted_equals_unsorted():
    """Feeding a host-sorted batch (spatial_sort=host, the default) gives
    the same valid-point logits as the unsorted cloud, modulo the
    permutation recorded in point_idx."""
    from closerlook3d_tpu.data.spatial_host import morton_sort_batch
    from closerlook3d_tpu.models import build_model
    from closerlook3d_tpu.utils.config import load_config

    rng = np.random.default_rng(12)
    b, n = 1, 512
    xyz = rng.uniform(-2, 2, (b, n, 3)).astype(np.float32)
    mask = rng.uniform(size=(b, n)) < 0.95
    feats = np.concatenate(
        [np.ones((b, n, 1)), xyz[..., 2:3]], axis=-1).astype(np.float32)

    cfg = load_config()
    cfg.task = "scene_segmentation"
    cfg.num_classes = 9
    cfg.num_points = n
    cfg.npoints = [n, 128, 32]
    cfg.nsamples = [8, 8, 8]
    cfg.sampling = "grid"
    cfg.width = 24
    cfg.depth = 1
    cfg.precision = "f32"
    cfg.use_pallas = "never"
    cfg.spatial_sort = "host"
    cfg.input_features_dim = 2
    model, _ = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(xyz), jnp.asarray(mask),
                           jnp.asarray(feats))

    ref = np.asarray(model.apply(variables, jnp.asarray(xyz),
                                 jnp.asarray(mask), jnp.asarray(feats)))

    sb = morton_sort_batch({"xyz": xyz, "mask": mask, "features": feats,
                            "point_idx": np.tile(np.arange(n), (b, 1))})
    out = np.asarray(model.apply(
        variables, jnp.asarray(sb["xyz"]), jnp.asarray(sb["mask"]),
        jnp.asarray(sb["features"])))
    for bb in range(b):
        perm = sb["point_idx"][bb]
        valid = sb["mask"][bb]
        np.testing.assert_allclose(out[bb][valid], ref[bb][perm][valid],
                                   rtol=2e-4, atol=2e-4)
