"""End-to-end CLI tests: train entry -> checkpoint -> evaluate entry.

The reference's user surface is its entry scripts (SURVEY.md §2.1);
these tests drive ours exactly as a user would — argv in, metrics out —
on the synthetic dataset (no data files).
"""

import json
import os

OVERRIDES = [
    "datasets=synthetic", "num_points=64", "num_classes=4", "width=24",
    "depth=1", "nsamples=[8, 8]", "radius=0.4", "npoints=[]",
    "precision=f32", "batch_size=8", "cls_head_dims=[32, 16]",
    "base_learning_rate=0.05", "warmup_epoch=0", "epochs=2",
    "label_smoothing=0.0", "save_interval=1", "val_interval=2",
    "log_interval=1000000", "use_pallas=never",
]


def test_cli_train_then_evaluate(tmp_path, capsys):
    from closerlook3d_tpu.cli.evaluate import main as eval_main
    from closerlook3d_tpu.cli.train import main as train_main

    log_dir = str(tmp_path / "run")
    train_main(["--log_dir", log_dir] + OVERRIDES)
    assert os.path.isdir(os.path.join(log_dir, "ckpt"))

    eval_main(["--log_dir", str(tmp_path / "eval"),
               "--load_path", os.path.join(log_dir, "ckpt")] + OVERRIDES)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    results = json.loads(out)
    # 2 epochs on an easy 4-class task: clearly above the 0.25 chance
    assert results["accuracy"] > 0.5, results


def test_cli_override_parsing():
    from closerlook3d_tpu.cli.train import parse_overrides

    out = parse_overrides(["epochs=3", "nsamples=[8, 8]",
                           "pospool.reduction=max", "use_pallas=never"])
    assert out == {"epochs": 3, "nsamples": [8, 8],
                   "pospool.reduction": "max", "use_pallas": "never"}
