"""Train entry point.

Parity (SURVEY.md §2.1 "Entry scripts"): the reference ships one
train/eval script per dataset (train_modelnet_dist.py, ...); here a
single CLI dispatches on the config's ``datasets`` field with the same
flags (--cfg, --log_dir, --load_path) plus dotted key=value overrides:

    python -m closerlook3d_tpu.cli.train --cfg configs/modelnet40/pospool_xyz_avg.yaml
    python -m closerlook3d_tpu.cli.train --cfg ... epochs=10 pospool.reduction=max
"""

from __future__ import annotations

import argparse

import yaml

from closerlook3d_tpu.train.loop import Trainer
from closerlook3d_tpu.utils.config import load_config


def parse_overrides(tokens):
    out = {}
    for tok in tokens:
        if "=" not in tok:
            raise SystemExit(f"override must be key=value, got: {tok}")
        k, v = tok.split("=", 1)
        out[k] = yaml.safe_load(v)  # typed parse: ints/floats/bools/lists
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description="CloserLook3D-TPU training")
    p.add_argument("--cfg", required=False, default=None,
                   help="YAML experiment config")
    p.add_argument("--log_dir", default="runs/default")
    p.add_argument("--load_path", default=None,
                   help="checkpoint dir to warm-start weights from")
    p.add_argument("--check_data", action="store_true",
                   help="validate the on-disk dataset tree and exit")
    p.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = p.parse_args(argv)

    if args.check_data:
        from closerlook3d_tpu.data.check import check_data
        cfg = load_config(args.cfg, parse_overrides(args.overrides))
        rep = check_data(cfg)
        print(rep.render())
        raise SystemExit(1 if rep.has_errors else 0)

    from closerlook3d_tpu.parallel.mesh import maybe_initialize_distributed
    maybe_initialize_distributed()  # multi-host: before any backend use

    cfg = load_config(args.cfg, parse_overrides(args.overrides))
    trainer = Trainer(cfg, args.log_dir, load_path=args.load_path)
    trainer.fit()


if __name__ == "__main__":
    main()
