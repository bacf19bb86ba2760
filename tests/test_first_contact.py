"""Dry-run of the real-data readiness drill (tools/first_contact.py)
against the miniature dataset fixtures, so the flow is proven BEFORE any
real data appears (VERDICT r3 item 8)."""

import json
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_check_all_against_fixture(tmp_path):
    from tests.test_datasets import _write_modelnet40

    import first_contact as fc

    _write_modelnet40(str(tmp_path))
    results = fc.check_all(str(tmp_path))
    assert set(results) == {"modelnet40", "shapenetpart", "partnet",
                            "s3dis"}
    ok, findings = results["modelnet40"]
    assert ok, findings
    for other in ("shapenetpart", "partnet", "s3dis"):
        assert not results[other][0]  # absent trees must NOT be ready


def test_main_reports_and_commands(tmp_path, capsys):
    from tests.test_datasets import _write_modelnet40

    import first_contact as fc

    _write_modelnet40(str(tmp_path))
    rc = fc.main(["--data_root", str(tmp_path),
                  "--reference", str(tmp_path / "no_such_reference")])
    out = capsys.readouterr().out
    assert rc == 0
    assert "READY] modelnet40" in out
    assert "configs/modelnet40/pospool_xyz_avg.yaml" in out
    # the launch command carries the data_root override
    assert f"data_root={tmp_path}" in out


def test_main_no_ready_dataset(tmp_path, capsys):
    import first_contact as fc

    rc = fc.main(["--data_root", str(tmp_path / "empty"),
                  "--reference", str(tmp_path / "none")])
    assert rc == 1
    assert "no dataset ready" in capsys.readouterr().out


def test_pin_baseline_from_reference_readme(tmp_path):
    import first_contact as fc

    ref = tmp_path / "reference"
    ref.mkdir()
    (ref / "README.md").write_text(
        "# Model zoo\n\n"
        "| Task | PointWiseMLP | PseudoGrid | AdaptWeight | PosPool | PosPool* |\n"
        "|---|---|---|---|---|---|\n"
        "| ModelNet40 OA | 92.8 | 93.0 | 93.0 | 92.9 | 93.2 |\n"
        "| S3DIS Area-5 mIoU | 66.2 | 65.9 | 66.9 | 66.5 | 66.7 |\n")
    bl = tmp_path / "BASELINE.json"
    bl.write_text(json.dumps({"published": {}}))
    n = fc.pin_baseline(str(ref), str(bl))
    assert n == 2
    d = json.loads(bl.read_text())
    assert d["published"]["modelnet40_oa"]["values"]["pospool"] == 92.9
    assert d["published"]["s3dis_area5_miou"]["values"][
        "pseudo_grid"] == 65.9
    assert d["published"]["modelnet40_oa"]["source"] == "README.md"


def test_pin_baseline_empty_reference(tmp_path):
    import first_contact as fc

    ref = tmp_path / "reference"
    ref.mkdir()  # empty mount — today's situation
    bl = tmp_path / "BASELINE.json"
    bl.write_text(json.dumps({"published": {}}))
    assert fc.pin_baseline(str(ref), str(bl)) == 0
    assert json.loads(bl.read_text()) == {"published": {}}


def test_pin_baseline_row_oriented_zoo(tmp_path):
    """The actual CloserLook3D README lays the zoo out with operators
    as ROWS under per-dataset headings (VERDICT r4 item 8: the old
    5-column regexes were brittle); pin_baseline must handle both
    orientations."""
    import first_contact as fc

    ref = tmp_path / "reference"
    ref.mkdir()
    (ref / "README.md").write_text(
        "# CloserLook3D\n\n"
        "## ModelNet40\n\n"
        "| Method | OA | model |\n"
        "|---|---|---|\n"
        "| Point-wise MLP | 92.8 | [ckpt](a) |\n"
        "| Pseudo Grid | 93.0 | [ckpt](b) |\n"
        "| Adapt Weights | 93.0 | [ckpt](c) |\n"
        "| PosPool | 92.9 | [ckpt](d) |\n"
        "| PosPool* | 93.2 | [ckpt](e) |\n\n"
        "## S3DIS Area-5\n\n"
        "| Method | mIoU |\n"
        "|---|---|\n"
        "| PosPool | 66.5 |\n"
        "| PosPool* | 66.7 |\n\n"
        "## ShapeNetPart\n\n"
        "instance mIoU (ins. mIoU):\n\n"
        "| Method | ins. mIoU | cls. mIoU |\n"
        "|---|---|---|\n"
        "| PosPool | 85.9 | 84.5 |\n")
    bl = tmp_path / "BASELINE.json"
    bl.write_text(json.dumps({"published": {}}))
    n = fc.pin_baseline(str(ref), str(bl))
    d = json.loads(bl.read_text())
    assert n == 3, d
    mn = d["published"]["modelnet40_oa"]["values"]
    assert mn == {"pointwisemlp": 92.8, "pseudo_grid": 93.0,
                  "adaptive_weight": 93.0, "pospool": 92.9,
                  "pospool_sincos": 93.2}
    assert d["published"]["s3dis_area5_miou"]["values"][
        "pospool_sincos"] == 66.7
    # first numeric column (ins. mIoU) wins for the ShapeNetPart row
    assert d["published"]["shapenetpart_ins_miou"]["values"][
        "pospool"] == 85.9
