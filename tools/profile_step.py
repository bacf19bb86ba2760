"""XPlane device-time breakdown of a train step (VERDICT r1 item 10).

Captures a trace of N steps of the benchmark train step (same setup as
bench.py) and prints per-op and per-phase device-time attribution:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_step.py seg pospool

Phases are attributed by XLA op-name patterns: the Pallas kernels carry
their python function names inside custom-call fusions; sorts and
scatters (grid_subsample's argsort + segment-sum) and gathers/matmul
fusions are XLA-generated. Requires the tensorflow XPlane protos
(PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python to dodge the converter
crash — set automatically below).
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 3
PHASES = [
    # (phase label, substring patterns matched against the XLA op name)
    ("ball_query", ["ball_query", "bq_"]),
    ("fps", ["furthest", "fps"]),
    ("knn/upsample", ["knn", "nearest"]),
    ("aggregation", ["pospool", "pseudo_grid", "_sc_", "_xyz_",
                     "moments", "pwmlp", "pointwisemlp", "gather_sub",
                     "neighborhood", "adaptive", "localaggregation",
                     "bottleneck"]),
    ("sort (grid_subsample)", ["sort"]),
    ("scatter (grid_subsample)", ["scatter"]),
    ("conv/matmul fusions", ["fusion", "convolution", "dot"]),
    ("copies/transposes", ["copy", "transpose", "bitcast"]),
]


def run_and_trace(task: str, op: str, logdir: str):
    import jax
    import numpy as np

    import bench

    cfg = bench._cell_cfg(task, op)
    rng = np.random.default_rng()
    host_batch = bench._make_host_batch(cfg, rng)

    from closerlook3d_tpu.models import build_model
    from closerlook3d_tpu.parallel.mesh import make_mesh, shard_batch
    from closerlook3d_tpu.train.schedules import make_optimizer
    from closerlook3d_tpu.train.state import create_train_state
    from closerlook3d_tpu.train.step import make_train_step

    mesh = make_mesh(data_parallel=len(jax.devices()), model_parallel=1)
    model, loss_fn = build_model(cfg)
    optimizer, _ = make_optimizer(cfg, steps_per_epoch=100)
    db = shard_batch(host_batch, mesh)
    state = create_train_state(cfg, model, optimizer,
                               jax.random.PRNGKey(0), db, mesh)
    ts = make_train_step(model, loss_fn, cfg.task, mesh)
    key = jax.random.PRNGKey(1)
    state, m = ts(state, db, key)
    float(m["loss"])  # compile + true sync (host fetch)
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(STEPS):
        state, m = ts(state, db, key)
    float(m["loss"])
    jax.profiler.stop_trace()


def parse(logdir: str):
    import glob
    from collections import defaultdict

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    sp = xplane_pb2.XSpace()
    sp.ParseFromString(open(files[0], "rb").read())
    agg = defaultdict(float)
    for plane in sp.planes:
        if "TPU" not in plane.name:
            continue
        evmeta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                agg[evmeta.get(ev.metadata_id, "?")] += ev.duration_ps / 1e9

    total = sum(agg.values())
    print(f"total device: {total / STEPS:.1f} ms/step "
          f"({len(agg)} distinct ops)\n")
    phase_ms = {label: 0.0 for label, _ in PHASES}
    phase_ops = {label: [] for label, _ in PHASES}
    phase_ops["other"] = []
    other = 0.0
    for name, ms in agg.items():
        # match on the instruction NAME only — the full string carries
        # operand names ("%fusion.12"), which cross-contaminate phases
        low = name.split(" = ")[0].lower()
        for label, pats in PHASES:
            if any(p in low for p in pats):
                phase_ms[label] += ms
                phase_ops[label].append((ms, name))
                break
        else:
            other += ms
            phase_ops["other"].append((ms, name))
    print("phase attribution (ms/step):")
    for label, ms in sorted(phase_ms.items(), key=lambda x: -x[1]):
        print(f"  {ms / STEPS:8.2f}  {label}")
    print(f"  {other / STEPS:8.2f}  other")
    print("\ntop ops (ms/step):")
    for ms, name in sorted(((v, k) for k, v in agg.items()),
                           reverse=True)[:25]:
        print(f"  {ms / STEPS:8.3f}  {name[:100]}")
    for label in [l for l, _ in PHASES] + ["other"]:
        ops = sorted(phase_ops[label], reverse=True)[:6]
        if not ops or phase_ms.get(label, other) < 1.0 * STEPS:
            continue
        print(f"\ntop {label} ops (ms/step):")
        for ms, name in ops:
            print(f"  {ms / STEPS:8.3f}  {name[:110]}")


if __name__ == "__main__":
    task = sys.argv[1] if len(sys.argv) > 1 else "seg"
    op = sys.argv[2] if len(sys.argv) > 2 else "pospool"
    logdir = f"/tmp/xplane_{task}_{op}"
    run_and_trace(task, op, logdir)
    parse(logdir)
