"""Serving export roundtrip: artifact logits == in-process apply."""

import numpy as np
import pytest


def _tiny_cfg():
    from closerlook3d_tpu.utils.config import load_config

    cfg = load_config()
    cfg.task = "classification"
    cfg.local_aggregation_type = "pospool"
    cfg.num_points = 64
    cfg.num_classes = 6
    cfg.width = 24
    cfg.depth = 1
    cfg.nsamples = [8, 8, 8]
    cfg.npoints = []
    cfg.radius = 0.4
    cfg.precision = "f32"
    cfg.batch_size = 8
    cfg.cls_head_dims = [16]
    return cfg


def test_export_roundtrip(tmp_path):
    import jax

    from closerlook3d_tpu.models import build_model
    from closerlook3d_tpu.parallel.mesh import make_mesh
    from closerlook3d_tpu.serving import export_forward, load_forward
    from closerlook3d_tpu.train.schedules import make_optimizer
    from closerlook3d_tpu.train.state import create_train_state

    cfg = _tiny_cfg()
    rng = np.random.default_rng(0)
    batch = {
        "xyz": rng.uniform(-1, 1, (8, 64, 3)).astype(np.float32),
        "mask": np.arange(64)[None] < np.array(
            [64, 50, 64, 10, 64, 64, 32, 64])[:, None],
        "features": rng.normal(size=(8, 64, 3)).astype(np.float32),
        "label": np.zeros(8, np.int32),
    }
    mesh = make_mesh(-1, 1)
    model, _ = build_model(cfg)
    optimizer, _ = make_optimizer(cfg, 10)
    state = create_train_state(cfg, model, optimizer,
                               jax.random.PRNGKey(0), batch, mesh)

    out = export_forward(cfg, state, str(tmp_path / "artifact"))
    predictor, meta = load_forward(out)
    assert meta["num_points"] == 64 and meta["task"] == "classification"

    got = np.asarray(predictor(batch["xyz"], batch["mask"],
                               batch["features"]))
    want = np.asarray(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["xyz"], batch["mask"], batch["features"], train=False))
    assert got.shape == (8, 6)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # wrong shapes must be rejected, not silently miscomputed
    with pytest.raises(Exception):
        predictor(batch["xyz"][:, :32], batch["mask"][:, :32],
                  batch["features"][:, :32])
