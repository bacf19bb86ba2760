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

# Zoo-table pinning (orientation-robust, VERDICT r4 item 8): the
# reference README may lay tables out either with operators as COLUMNS
# (one row per dataset) or — as the actual CloserLook3D README does —
# with operators as ROWS under per-dataset headings. pin_baseline
# parses markdown tables generically and matches operator names by
# alias in whichever orientation they appear; the metric key comes from
# the nearest heading/context above the table (or the row label).
# Order matters: 'pospool*'/sin-cos aliases must be tested before the
# plain 'pospool' substring.
_OP_ALIASES = [
    ("pospool_sincos", ("pospool*", "pospool (sin/cos)", "pospool-sincos",
                        "pospool_sincos", "sinpospool", "sin/cos")),
    ("pospool", ("pospool", "pos pool", "pos-pool")),
    ("pointwisemlp", ("point-wise mlp", "pointwise mlp", "pointwisemlp",
                      "point-wise-mlp", "pointwise-mlp", "pw-mlp")),
    ("pseudo_grid", ("pseudo grid", "pseudo-grid", "pseudogrid",
                     "pseudo_grid")),
    ("adaptive_weight", ("adapt weights", "adaptive weight",
                         "adapt-weights", "adaptive_weight",
                         "adaptweight", "adapt weight")),
]

_METRIC_KEYS = [
    # (key, all-of substrings to find in context/heading/row label)
    ("shapenetpart_ins_miou", ("shapenetpart",)),
    ("partnet_miou", ("partnet",)),
    ("modelnet40_oa", ("modelnet40",)),
    ("s3dis_area5_miou", ("s3dis",)),
]


def _op_of(cell: str):
    low = cell.lower()
    for op, aliases in _OP_ALIASES:
        if any(a in low for a in aliases):
            return op
    return None


def _metric_of(text: str):
    low = text.lower().replace(" ", "").replace("-", "")
    for key, needles in _METRIC_KEYS:
        if all(n in low for n in needles):
            # ShapeNetPart rows explicitly labeled class-mIoU are a
            # DIFFERENT metric than the instance-mIoU zoo headline;
            # don't mispin them
            if key == "shapenetpart_ins_miou" and (
                    "cls" in low or "cat" in low or "classm" in low):
                return None
            return key
    return None


def _first_float(cell: str):
    m = re.search(r"\d+\.\d+", cell)
    return float(m.group(0)) if m else None


def _md_tables(text: str):
    """Yield (context, rows) per markdown table: rows are stripped cell
    lists; context is the nearest preceding heading + preceding prose
    line (where the dataset name usually lives)."""
    lines = text.splitlines()
    context, prose = "", ""
    i = 0
    while i < len(lines):
        ln = lines[i]
        if ln.lstrip().startswith("#"):
            context = ln
        elif "|" in ln and ln.strip().startswith("|"):
            rows = []
            while i < len(lines) and "|" in lines[i] \
                    and lines[i].strip().startswith("|"):
                cells = [c.strip() for c in
                         lines[i].strip().strip("|").split("|")]
                if not all(set(c) <= set(":- ") for c in cells):
                    rows.append(cells)
                i += 1
            yield context + "\n" + prose, rows
            continue
        elif ln.strip():
            prose = ln
        i += 1


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
        for context, rows in _md_tables(text):
            if len(rows) < 2:
                continue
            header = rows[0]
            table_metric = _metric_of(context) or _metric_of(header[0])
            found: dict[str, dict] = {}  # metric key -> {op: value}
            op_cols = {ci: op for ci, op in
                       ((ci, _op_of(c)) for ci, c in enumerate(header))
                       if op}
            if op_cols:
                # operators as COLUMNS: one row per dataset/metric
                for row in rows[1:]:
                    key = _metric_of(row[0]) or table_metric
                    if not key:
                        continue
                    vals = {}
                    for ci, op in op_cols.items():
                        if ci < len(row):
                            v = _first_float(row[ci])
                            if v is not None:
                                vals[op] = v
                    if vals:
                        found.setdefault(key, {}).update(vals)
            else:
                # operators as ROWS (the reference README's layout):
                # first numeric cell in each operator row is the metric
                for row in rows[1:]:
                    op = _op_of(row[0])
                    if not op or not table_metric:
                        continue
                    for cell in row[1:]:
                        v = _first_float(cell)
                        if v is not None:
                            found.setdefault(table_metric, {})[op] = v
                            break
            for key, vals in found.items():
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
