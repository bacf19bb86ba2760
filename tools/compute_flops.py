"""Pin per-cell model FLOP counts for bench.py's MFU accounting.

For every benchmark matrix cell, compile the UNFUSED (use_pallas=never,
pure-XLA) train and eval programs and record XLA's compiled cost-analysis
flop counts into BENCH_FLOPS.json. Unfused counts are the honest "useful
algorithmic work" proxy: Pallas kernels are opaque to the HLO flop
counter, and the factorized fused kernels need fewer flops than the
reference algorithm anyway (so MFU computed from these counts is an
upper bound on itself, not an undercount).

FLOP counts are deterministic program properties — they change only when
the model math or the benchmark shapes change. Re-run this after either:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/compute_flops.py
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402

import bench  # noqa: E402


def main():
    pins = {"_meta": {
        "source": "xla_compiled_cost_analysis_unfused",
        "device": jax.devices()[0].device_kind,
        "jax": jax.__version__,
        "note": "regenerate with tools/compute_flops.py after model or "
                "benchmark-shape changes",
    }}
    key = jax.random.PRNGKey(1)
    for task in ("cls", "seg", "partseg"):
        for op, _ in bench.MATRIX_OPS:
            cfg = bench._cell_cfg(task, op)
            cfg.use_pallas = "never"
            s = bench.cell_setup(cfg)
            state, dbatch = s["state"], s["dbatch"]
            tcomp = s["train_step"].lower(state, dbatch, key).compile()
            ecomp = s["eval_step"].lower(state, dbatch).compile()
            cell = {
                "train_flops": bench.compiled_flops(tcomp),
                "infer_flops": bench.compiled_flops(ecomp),
                "points": cfg.num_points,
                "batch": cfg.batch_size,
            }
            pins[f"{task}/{op}"] = cell
            print(f"{task}/{op}: train "
                  f"{(cell['train_flops'] or 0) / 1e9:.1f} GF, infer "
                  f"{(cell['infer_flops'] or 0) / 1e9:.1f} GF", flush=True)
    out = os.path.join(_REPO, "BENCH_FLOPS.json")
    with open(out, "w") as f:
        json.dump(pins, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
