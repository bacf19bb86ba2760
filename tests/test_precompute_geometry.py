"""Host-precomputed geometry pipeline (the reference TF architecture).

Parity requirement: with identical point order, the precomputed path
must produce EXACTLY the on-device path's logits — both call the same
models/backbone.compute_geometry.
"""

import jax
import jax.numpy as jnp
import numpy as np

from closerlook3d_tpu.models import build_model
from closerlook3d_tpu.models.backbone import compute_geometry
from closerlook3d_tpu.utils.config import load_config


def seg_cfg():
    cfg = load_config()
    cfg.task = "scene_segmentation"
    cfg.num_classes = 9
    cfg.num_points = 384
    cfg.npoints = [384, 96, 24]
    cfg.nsamples = [8, 8, 8]
    cfg.sampling = "grid"
    cfg.width = 24
    cfg.depth = 1
    cfg.precision = "f32"
    cfg.use_pallas = "never"
    cfg.spatial_sort = "never"
    cfg.input_features = "ones,height"
    return cfg


def make_inputs(cfg, b=2):
    rng = np.random.default_rng(5)
    n = cfg.num_points
    xyz = jnp.asarray(rng.uniform(-2, 2, (b, n, 3)), jnp.float32)
    mask = np.ones((b, n), bool)
    mask[1, 300:] = False
    feats = jnp.concatenate(
        [jnp.ones((b, n, 1)), xyz[..., 2:3]], -1).astype(jnp.float32)
    return xyz, jnp.asarray(mask), feats


def test_precomputed_geometry_matches_on_device():
    cfg = seg_cfg()
    xyz, mask, feats = make_inputs(cfg)
    model, _ = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), xyz, mask, feats)

    on_device = model.apply(variables, xyz, mask, feats)
    geom = compute_geometry(cfg, xyz, mask, need_up=True)
    precomp = model.apply(variables, xyz, mask, feats, geometry=geom)
    np.testing.assert_array_equal(np.asarray(on_device),
                                  np.asarray(precomp))


def test_precompute_batch_transform_trains():
    """One smoke epoch through the Trainer with precompute_geometry on."""
    import tempfile

    from closerlook3d_tpu.train.loop import Trainer

    cfg = load_config("configs/synthetic/smoke_cls.yaml")
    cfg.epochs = 1
    cfg.precompute_geometry = True
    with tempfile.TemporaryDirectory() as d:
        trainer = Trainer(cfg, d)
        best = trainer.fit()
    assert best > 0.2  # learned something


def test_precompute_sorts_labels_consistently():
    from closerlook3d_tpu.data.geometry import precompute_batch_geometry

    cfg = seg_cfg()
    cfg.spatial_sort = "auto"
    rng = np.random.default_rng(3)
    b, n = 2, cfg.num_points
    xyz = rng.uniform(-2, 2, (b, n, 3)).astype(np.float32)
    labels = rng.integers(0, 9, (b, n)).astype(np.int32)
    batch = {
        "xyz": xyz.copy(),
        "mask": np.ones((b, n), bool),
        "features": xyz.copy(),
        "labels": labels.copy(),
        "batch_pad": np.zeros(b, bool),
    }
    out = precompute_batch_geometry(batch, cfg)
    # (xyz, label) pairing preserved under the permutation
    for bi in range(b):
        orig = {tuple(np.round(p, 5)): l for p, l in zip(xyz[bi], labels[bi])}
        for p, l in zip(out["xyz"][bi], out["labels"][bi]):
            assert orig[tuple(np.round(p, 5))] == l
    assert "geom_xyz_1" in out and "geom_up_0" in out
