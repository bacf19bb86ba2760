"""Real-data readiness drill (VERDICT r3 item 8).

Every accuracy number in BASELINE.md is recalled and every loader format
was written without real files (SURVEY.md §6 provenance warning). The
moment real data or the reference mount appears, this script compresses
"first contact" into one command:

    python tools/first_contact.py --data_root /path/to/datasets [--launch]

1. Runs the fail-fast ``check_data`` validator for all four datasets
   against --data_root and prints a per-dataset readiness verdict.
2. If ``/root/reference`` (override: --reference) has content, scans its
   README/markdown for the model-zoo accuracy tables and pins what it
   finds into BASELINE.json.published (provenance: file + line), so the
   recalled (r) numbers in BASELINE.md get replaced by verified ones.
3. For each READY dataset prints — or with --launch runs — the shortest
   real parity run (ModelNet40 cls/pospool first: smallest model,
   fastest signal), logging under runs/first_contact_<dataset>/.

Dry-runnable against the test fixtures (tests/test_datasets.py writes
miniature dataset trees); tests/test_first_contact.py pins that flow.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# dataset -> (config used for the readiness check + shortest parity run,
#             extra overrides for that first run)
DATASETS = {
    "modelnet40": ("configs/modelnet40/pospool_xyz_avg.yaml", []),
    "shapenetpart": ("configs/shapenetpart/pospool_xyz_avg.yaml", []),
    "partnet": ("configs/partnet/pospool_xyz_avg.yaml", []),
    "s3dis": ("configs/s3dis/pospool_xyz_avg.yaml", []),
}

# model-zoo table rows we can pin from the reference README: metric key
# in BASELINE.json.published -> regex capturing the five operator
# columns (PointWiseMLP, PseudoGrid, AdaptWeight, PosPool, PosPool*)
_ZOO_PATTERNS = {
    "modelnet40_oa": r"ModelNet40[^|\n]*\|([^|\n]+)\|([^|\n]+)\|([^|\n]+)\|([^|\n]+)\|([^|\n]+)\|",
    "s3dis_area5_miou": r"S3DIS[^|\n]*\|([^|\n]+)\|([^|\n]+)\|([^|\n]+)\|([^|\n]+)\|([^|\n]+)\|",
    "shapenetpart_ins_miou": r"ShapeNetPart[^|\n]*ins[^|\n]*\|([^|\n]+)\|([^|\n]+)\|([^|\n]+)\|([^|\n]+)\|([^|\n]+)\|",
    "partnet_miou": r"PartNet[^|\n]*\|([^|\n]+)\|([^|\n]+)\|([^|\n]+)\|([^|\n]+)\|([^|\n]+)\|",
}
_OPS = ["pointwisemlp", "pseudo_grid", "adaptive_weight", "pospool",
        "pospool_sincos"]


def check_all(data_root: str):
    """Run check_data per dataset; returns {name: (ready, findings)}."""
    from closerlook3d_tpu.data.check import check_data
    from closerlook3d_tpu.utils.config import load_config

    out = {}
    for name, (cfg_path, _) in DATASETS.items():
        cfg = load_config(os.path.join(REPO, cfg_path))
        cfg.data_root = data_root
        rep = check_data(cfg)
        out[name] = (not rep.has_errors, rep.findings)
    return out


def pin_baseline(reference_dir: str, baseline_path: str) -> int:
    """Scan reference markdown for zoo tables; pin numeric cells into
    BASELINE.json.published. Returns the number of metrics pinned."""
    docs = []
    for dirpath, _, files in os.walk(reference_dir):
        for f in files:
            if f.lower().endswith((".md", ".rst", ".txt")):
                docs.append(os.path.join(dirpath, f))
    if not docs:
        return 0
    with open(baseline_path) as f:
        baseline = json.load(f)
    pinned = 0
    for doc in docs:
        try:
            text = open(doc, errors="replace").read()
        except OSError:
            continue
        for key, pat in _ZOO_PATTERNS.items():
            m = re.search(pat, text, re.IGNORECASE)
            if not m:
                continue
            vals = {}
            for op, cell in zip(_OPS, m.groups()):
                num = re.search(r"\d+\.\d+", cell)
                if num:
                    vals[op] = float(num.group(0))
            if vals:
                baseline.setdefault("published", {})[key] = {
                    "values": vals,
                    "source": os.path.relpath(doc, reference_dir),
                }
                pinned += 1
    if pinned:
        with open(baseline_path, "w") as f:
            json.dump(baseline, f, indent=2)
    return pinned


def launch_cmd(name: str, data_root: str):
    cfg_path, extra = DATASETS[name]
    return [sys.executable, "-m", "closerlook3d_tpu.cli.train",
            "--cfg", os.path.join(REPO, cfg_path),
            "--log_dir", os.path.join(REPO, f"runs/first_contact_{name}"),
            f"data_root={data_root}"] + extra


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--data_root", required=True)
    p.add_argument("--reference", default="/root/reference")
    p.add_argument("--launch", action="store_true",
                   help="actually start the first ready parity run")
    args = p.parse_args(argv)

    results = check_all(args.data_root)
    ready = []
    for name, (ok, findings) in results.items():
        verdict = "READY" if ok else "missing/broken"
        print(f"[{verdict:>14s}] {name}")
        for level, msg in findings:
            if level != "ok":
                print(f"    {level}: {msg}")
        if ok:
            ready.append(name)

    if os.path.isdir(args.reference):
        n = pin_baseline(args.reference,
                         os.path.join(REPO, "BASELINE.json"))
        if n:
            print(f"pinned {n} published metric set(s) from "
                  f"{args.reference} into BASELINE.json")
        else:
            print(f"reference at {args.reference}: no zoo tables found "
                  "(empty mount?) — BASELINE.json unchanged")

    if not ready:
        print("no dataset ready; fix the findings above and re-run")
        return 1
    for name in ready:
        cmd = launch_cmd(name, args.data_root)
        print(f"first parity run for {name}:\n    {' '.join(cmd)}")
    if args.launch:
        first = ready[0]
        print(f"launching {first} ...")
        return subprocess.call(launch_cmd(first, args.data_root))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
