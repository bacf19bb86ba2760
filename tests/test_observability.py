"""Profiling harness + scalar writer (SURVEY.md §5 tracing/logging rows)."""

import json
import os

import jax.numpy as jnp
import numpy as np


def test_timeit_and_cost_analysis():
    from closerlook3d_tpu.utils.profiling import cost_analysis, timeit

    def f(x):
        return (x @ x).sum()

    x = jnp.ones((64, 64))
    stats = timeit(f, x, iters=3, warmup=1)
    assert stats["mean_ms"] > 0 and stats["best_ms"] <= stats["mean_ms"]
    costs = cost_analysis(f, x)
    assert isinstance(costs, dict)


def test_scalar_writer_jsonl(tmp_path):
    from closerlook3d_tpu.utils.tb import ScalarWriter

    w = ScalarWriter(str(tmp_path))
    w.scalars({"loss": 1.5, "acc": 0.5}, step=10, prefix="train/")
    w.scalar("val/miou", 0.25, step=20)
    w.close()
    lines = [json.loads(ln) for ln in
             open(tmp_path / "scalars.jsonl").read().splitlines()]
    tags = {ln["tag"] for ln in lines}
    assert tags == {"train/loss", "train/acc", "val/miou"}
    assert all(np.isfinite(ln["value"]) for ln in lines)


def test_trainer_writes_scalars(tmp_path):
    """Smoke-train one epoch and check scalars.jsonl appears."""
    from closerlook3d_tpu.train.loop import Trainer
    from closerlook3d_tpu.utils.config import load_config

    cfg = load_config("configs/synthetic/smoke_cls.yaml")
    cfg.epochs = 1
    cfg.log_interval = 8
    trainer = Trainer(cfg, str(tmp_path))
    trainer.fit()
    assert os.path.exists(tmp_path / "scalars.jsonl")
    lines = [json.loads(ln) for ln in
             open(tmp_path / "scalars.jsonl").read().splitlines()]
    tags = {ln["tag"] for ln in lines}
    assert "train/loss" in tags and "val/acc" in tags


def test_bench_cell_cfg_matrix_ops():
    """bench.py's operator matrix must map to valid configs (the sincos
    variant rides the pospool family with a position_embedding flip)."""
    import bench

    for name, _ in bench.MATRIX_OPS:
        cfg = bench._cell_cfg("cls", name)
        if name == "pospool_sincos":
            assert cfg.local_aggregation_type == "pospool"
            assert cfg.pospool.position_embedding == "sin_cos"
        else:
            assert cfg.local_aggregation_type == name
    seg = bench._cell_cfg("seg", "pospool")
    assert seg.task == "scene_segmentation" and seg.sampling == "grid"
    assert seg.npoints[0] == seg.num_points


def test_readme_bench_section_in_sync():
    """README's benchmark tables are GENERATED from BENCH_MATRIX.json
    (tools/gen_readme_bench.py); a re-bench that changes the artifact
    must fail here until the section is re-rendered — no stale numbers
    reachable from the front door (VERDICT r4 weak #3)."""
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from tools.gen_readme_bench import BEGIN, END, render

    readme = open(os.path.join(repo, "README.md")).read()
    assert BEGIN in readme and END in readme
    current = readme.split(BEGIN, 1)[1].split(END, 1)[0]
    expected = render().split(BEGIN, 1)[1].split(END, 1)[0]
    assert current == expected, (
        "README bench section out of sync — run tools/gen_readme_bench.py")


def test_bench_matrix_budget_and_streaming(tmp_path, monkeypatch, capsys):
    """Driver-window machinery (VERDICT r4 item 2): priority order,
    per-cell streaming, incremental BENCH_MATRIX.json writes, budget
    stop with cells_completed, headline printed first AND last."""
    import time as _time

    import bench

    calls = []

    def fake_run_cell(task, op, steps, measure_infer, num_points=None,
                      batch=None, flops_pins=None):
        calls.append((task, op))
        _time.sleep(0.01)
        return {"train_pps": 1000.0, "train_step_ms": 10.0,
                "points": 1024, "batch": 32}

    monkeypatch.setattr(bench, "run_cell", fake_run_cell)
    monkeypatch.setattr(bench, "_REPO", str(tmp_path))
    monkeypatch.setenv("BENCH_MATRIX", "1")
    for var in ("BENCH_TASK", "BENCH_OP", "BENCH_POINTS", "BENCH_BATCH"):
        monkeypatch.delenv(var, raising=False)

    # run 1: generous budget -> all 15 cells, partial=False
    monkeypatch.setenv("BENCH_BUDGET_S", "100")
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert calls[:3] == [("cls", "pospool"), ("seg", "pospool"),
                         ("partseg", "pospool")]
    assert len(calls) == 15
    mat = json.loads(open(tmp_path / "BENCH_MATRIX.json").read())
    assert mat["partial"] is False and len(mat["matrix"]) == 15
    head = json.loads(out[-1])
    assert head["metric"] == "points_per_sec_per_chip_train"
    assert head["cells_completed"] == 15
    # the headline also printed right after the first cell: line 2
    early = json.loads(out[1])
    assert early["metric"] == "points_per_sec_per_chip_train"

    # run 2: budget forces a stop after the headline cell (the next
    # cell's estimated cost exceeds the remaining budget)
    calls.clear()
    monkeypatch.setenv("BENCH_BUDGET_S", "0.001")
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert calls == [("cls", "pospool")]  # headline always runs
    stop = next(json.loads(ln) for ln in out
                if "bench_budget_stop" in ln)
    assert stop["cells_completed"] == 1
    mat = json.loads(open(tmp_path / "BENCH_MATRIX.json").read())
    assert mat["partial"] is True and len(mat["matrix"]) == 1
    head = json.loads(out[-1])
    assert head["cells_completed"] == 1 and head["cells_total"] == 15


def test_bench_fetch_loss_nan_guard():
    import bench

    assert bench._fetch_loss({"loss": 1.5}, "x") == 1.5
    import pytest as _pytest
    with _pytest.raises(FloatingPointError, match="seg/pospool train"):
        bench._fetch_loss({"loss": float("nan")}, "seg/pospool train")
