"""Evaluation entry point (reference: function/evaluate_*_dist.py).

    python -m closerlook3d_tpu.cli.evaluate --cfg <yaml> --load_path runs/x/ckpt
"""

from __future__ import annotations

import argparse
import json

import jax

from closerlook3d_tpu.cli.train import parse_overrides
from closerlook3d_tpu.data import BatchIterator, build_dataset
from closerlook3d_tpu.data.loader import feature_dim
from closerlook3d_tpu.models import build_model
from closerlook3d_tpu.parallel.mesh import (
    make_mesh,
    maybe_initialize_distributed,
)
from closerlook3d_tpu.train.checkpoints import CheckpointManager
from closerlook3d_tpu.train.evaluate import (
    evaluate_classification,
    evaluate_partseg,
    evaluate_s3dis_voting,
)
from closerlook3d_tpu.train.loop import device_batch
from closerlook3d_tpu.train.schedules import make_optimizer
from closerlook3d_tpu.train.state import create_train_state
from closerlook3d_tpu.utils.config import load_config
from closerlook3d_tpu.utils.logger import setup_logger


def main(argv=None):
    p = argparse.ArgumentParser(description="CloserLook3D-TPU evaluation")
    p.add_argument("--cfg", default=None)
    p.add_argument("--log_dir", default="runs/eval")
    p.add_argument("--load_path", required=True)
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    maybe_initialize_distributed()  # multi-host: before any backend use
    cfg = load_config(args.cfg, parse_overrides(args.overrides))
    logger = setup_logger(args.log_dir)
    dataset = build_dataset(cfg, "test")
    cfg.input_features_dim = feature_dim(cfg.input_features)
    mesh = make_mesh(cfg.data_parallel, cfg.model_parallel)
    model, loss_fn = build_model(cfg)
    optimizer, _ = make_optimizer(cfg, 1)

    # multi-host: each process evaluates its sample shard (the
    # evaluators reduce counts/confusions across processes)
    it = BatchIterator(dataset, cfg.batch_size, shuffle=False,
                       feature_spec=cfg.input_features, drop_last=False,
                       spatial_sort=cfg.spatial_sort == "host",
                       process_index=jax.process_index(),
                       process_count=jax.process_count())
    sample = device_batch(next(iter(it)), mesh)
    state = create_train_state(cfg, model, optimizer,
                               jax.random.PRNGKey(0), sample, mesh)
    ckpt = CheckpointManager(args.load_path)
    state, _, step = ckpt.restore(state)
    if state is None:
        raise SystemExit(f"no checkpoint found in {args.load_path}")
    logger.info("evaluating checkpoint @ step %s", step)

    def logits_fn(state, batch):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["xyz"], batch["mask"], batch["features"], train=False)

    _jitted = jax.jit(logits_fn)

    def jitted_logits(state, batch):
        # assemble the process-local host batch into a GLOBAL sharded
        # array (collective under process_count > 1); the evaluators
        # read back only their local shard rows (_fetch_local)
        return _jitted(state, device_batch(batch, mesh))

    if cfg.task == "scene_segmentation" and cfg.datasets == "s3dis":
        results = evaluate_s3dis_voting(cfg, dataset, state, jitted_logits,
                                        logger)
    elif cfg.task == "part_segmentation":
        results = evaluate_partseg(cfg, dataset, state, jitted_logits, it)
    else:
        results = evaluate_classification(cfg, state, jitted_logits, it)

    logger.info("results: %s", json.dumps(results))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
