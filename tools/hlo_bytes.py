"""HBM byte accounting for a compiled XLA executable (roofline input).

XLA's ``cost_analysis()["bytes accessed"]`` models post-fusion HBM
traffic (each fusion reads its operands and writes its outputs), but
treats custom calls — i.e. every Pallas kernel — as zero bytes. This
module closes that hole by parsing the optimized HLO text: it maps
instruction names to their shapes and charges every ``custom-call``
its operand + result bytes (what the Pallas kernel actually streams
through HBM, since kernel I/O lives in HBM and is staged via VMEM).

The result is an *estimate*: XLA's number itself is analytic (it
assumes no cache reuse between fusions and charges multi-consumer
buffers once per consumer), and instruction names are assumed unique
module-wide (true for XLA's SSA-style dumps). Good to ~10-20%, which
is what a roofline needs.

Reference has no analogue (SURVEY §5 tracing: none beyond timing
meters); this is the bandwidth half of VERDICT r3 item 1.
"""

from __future__ import annotations

import re

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1,
    "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4,
    "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
    "token": 0, "s4": 1, "u4": 1,
}

# one array shape: dtype[d0,d1,...] with optional {layout...} suffix
_SHAPE_RE = re.compile(r"(pred|[suf]\d+|bf16|c64|c128|token)\[([0-9,]*)\]")
# an instruction definition line: "  %name = <shape-spec> opcode(...)"
_DEF_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\(?[^=]*?)\s"
                     r"([a-z][\w\-]*)\(")
_OPERAND_RE = re.compile(r"%([\w.\-]+)")


def _shape_bytes(spec: str) -> int:
    """Total bytes of every array shape appearing in ``spec`` (handles
    tuples by summing the leaves)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(spec):
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES.get(dtype, 4)
    return total


_OPNAME_RE = re.compile(r'op_name="([^"]+)"')
_TARGET_RE = re.compile(r'custom_call_target="([^"]+)"')
_JIT_RE = re.compile(r"jit\(([^)]+)\)/pallas_call")


def _call_label(line: str) -> str:
    """Kernel label for one custom-call line. Pallas calls
    (custom_call_target="tpu_custom_call") are labeled by the wrapping
    jit scope (e.g. ball_query_pallas_chunked); XLA-internal custom
    calls (ConcatBitcast, GatherScatterIndicesBitpacked, ...) by their
    target name."""
    t = _TARGET_RE.search(line)
    target = t.group(1) if t else "custom-call"
    if target != "tpu_custom_call":
        return target
    m = _OPNAME_RE.search(line)
    if m:
        op_name = m.group(1)
        j = _JIT_RE.search(op_name)
        if j:
            return j.group(1)
        # custom_vjp kernels inside flax modules carry no jit(<fn>)
        # scope; label by the owning module (Bottleneck_3/
        # LocalAggregation_0/pallas_call -> LocalAggregation), split
        # fwd/bwd by the transpose scope
        parts = op_name.split("/")
        owner = next((re.sub(r"_\d+$", "", p) for p in parts[-2::-1]
                      if not p.startswith(("jit(", "jvp(", "transpose("))
                      and p != "pallas_call"), "pallas")
        side = "bwd" if "transpose(" in op_name else "fwd"
        return f"{owner}:{side}"
    return target


def custom_call_list(hlo_text: str) -> list[dict]:
    """Per-custom-call byte accounting from the optimized HLO text:
    [{"name", "label", "bytes"}] with bytes = operands + result (what
    the Pallas kernel streams through HBM). The per-kernel view VERDICT
    r4 item 4 asks for — diff it against the phase attribution to find
    which kernel streams the most excess bytes."""
    shapes: dict[str, int] = {}
    calls: list[tuple[str, list[str], str]] = []
    for line in hlo_text.splitlines():
        m = _DEF_RE.match(line)
        if not m:
            continue
        name, spec, opcode = m.groups()
        shapes[name] = _shape_bytes(spec)
        if opcode == "custom-call":
            # operands: %refs inside the first paren group after opcode
            body = line[m.end():]
            depth, end = 1, 0
            for i, ch in enumerate(body):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        end = i
                        break
            operands = _OPERAND_RE.findall(body[:end])
            calls.append((name, operands, _call_label(line)))
    out = []
    for name, operands, label in calls:
        by = shapes.get(name, 0)
        for op in operands:
            by += shapes.get(op, 0)
        out.append({"name": name, "label": label, "bytes": by})
    return out


def custom_call_bytes(hlo_text: str) -> int:
    """Sum of operand + result bytes over every custom-call in the
    optimized HLO module text (``compiled.as_text()``)."""
    return sum(c["bytes"] for c in custom_call_list(hlo_text))


def grouped_call_bytes(hlo_text: str) -> dict[str, dict]:
    """label -> {"bytes": total, "count": n} over all custom-calls."""
    groups: dict[str, dict] = {}
    for c in custom_call_list(hlo_text):
        g = groups.setdefault(c["label"], {"bytes": 0, "count": 0})
        g["bytes"] += c["bytes"]
        g["count"] += 1
    return groups


def executable_bytes(compiled) -> dict:
    """Roofline byte accounting for a ``jax.stages.Compiled``.

    Returns {"xla": bytes from cost_analysis (fusions etc.),
             "custom_call": bytes through Pallas/custom-call I/O,
             "total": sum}.
    """
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    xla = float((ca or {}).get("bytes accessed") or 0.0)
    cc = float(custom_call_bytes(compiled.as_text()))
    return {"xla": xla, "custom_call": cc, "total": xla + cc}


def main():
    """Per-kernel HBM byte table of one bench cell's TRAIN executable.

    Usage: python tools/hlo_bytes.py [task] [op]   (default seg pospool)
    """
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    import bench

    task = sys.argv[1] if len(sys.argv) > 1 else "seg"
    op = sys.argv[2] if len(sys.argv) > 2 else "pospool"
    cfg = bench._cell_cfg(task, op)
    s = bench.cell_setup(cfg)
    key = jax.random.PRNGKey(1)
    comp = s["train_step"].lower(s["state"], s["dbatch"], key).compile()
    text = comp.as_text()
    dump = os.environ.get("HLO_DUMP")
    if dump:
        with open(dump, "w") as f:
            f.write(text)
    by = executable_bytes(comp)
    print(f"{task}/{op} train: xla {by['xla'] / 1e9:.2f} GB + "
          f"custom-call {by['custom_call'] / 1e9:.2f} GB = "
          f"{by['total'] / 1e9:.2f} GB/step")
    groups = sorted(grouped_call_bytes(text).items(),
                    key=lambda kv: -kv[1]["bytes"])
    print(f"{'label':<44} {'calls':>5} {'GB':>8}")
    for label, g in groups:
        print(f"{label:<44} {g['count']:>5} {g['bytes'] / 1e9:>8.3f}")


if __name__ == "__main__":
    main()
