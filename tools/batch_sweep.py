"""Batch-size throughput sweep (VERDICT r2 item 2).

Measures points/s/chip for the headline cells across batch sizes to
answer "does a bigger batch fill the chip?":

    PYTHONPATH=/root/repo:/root/.axon_site python tools/batch_sweep.py

Measured result (v5e, 2026-08-18): throughput is batch-INVARIANT —
cls/pospool 32/64/128 -> 1.72/1.58/1.69 Mpps, seg/pospool B=8 is
exactly 2x the B=4 step time. The bottleneck is HBM bandwidth and
irregular (neighbor/gather) work that scales linearly with points, not
MXU underfill; per-phase attribution (tools/profile_step.py) is the
lever, not batch.
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import bench  # noqa: E402

SWEEP = {
    ("cls", "pospool"): [32, 64, 128],
    ("seg", "pospool"): [4, 8],
    ("partseg", "pospool"): [32, 64],
}


def main():
    rows = {}
    for (task, op), batches in SWEEP.items():
        for b in batches:
            cell = bench.run_cell(task, op, steps=8, measure_infer=False,
                                  batch=b,
                                  flops_pins=bench.load_flops_pins())
            key = f"{task}/{op}/b{b}"
            rows[key] = cell
            print(f"{key}: {cell['train_step_ms']} ms, "
                  f"{cell['train_pps'] / 1e6:.2f} Mpps", flush=True)
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
