"""Export a trained checkpoint to a serving artifact.

    python -m closerlook3d_tpu.cli.export --cfg <yaml> \
        --load_path runs/x/ckpt --out serve/model

The artifact (see serving/export.py) contains the AOT-serialized
eval forward + weights and is platform-pinned to the device this
command runs on.
"""

from __future__ import annotations

import argparse

import jax

from closerlook3d_tpu.cli.train import parse_overrides
from closerlook3d_tpu.data import BatchIterator, build_dataset
from closerlook3d_tpu.data.loader import feature_dim
from closerlook3d_tpu.models import build_model
from closerlook3d_tpu.parallel.mesh import make_mesh
from closerlook3d_tpu.serving import export_forward
from closerlook3d_tpu.train.checkpoints import CheckpointManager
from closerlook3d_tpu.train.loop import device_batch
from closerlook3d_tpu.train.schedules import make_optimizer
from closerlook3d_tpu.train.state import create_train_state
from closerlook3d_tpu.utils.config import load_config


def main(argv=None):
    p = argparse.ArgumentParser(description="CloserLook3D-TPU export")
    p.add_argument("--cfg", default=None)
    p.add_argument("--load_path", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    cfg = load_config(args.cfg, parse_overrides(args.overrides))
    cfg.input_features_dim = feature_dim(cfg.input_features)
    mesh = make_mesh(cfg.data_parallel, cfg.model_parallel)
    model, _ = build_model(cfg)
    optimizer, _ = make_optimizer(cfg, 1)
    dataset = build_dataset(cfg, "test")
    it = BatchIterator(dataset, cfg.batch_size, shuffle=False,
                       feature_spec=cfg.input_features, drop_last=False,
                       spatial_sort=cfg.spatial_sort == "host")
    sample = device_batch(next(iter(it)), mesh)
    state = create_train_state(cfg, model, optimizer,
                               jax.random.PRNGKey(0), sample, mesh)
    state, _, step = CheckpointManager(args.load_path).restore(state)
    if state is None:
        raise SystemExit(f"no checkpoint found in {args.load_path}")
    out = export_forward(cfg, state, args.out)
    print(f"exported checkpoint @ step {step} -> {out}")


if __name__ == "__main__":
    main()
