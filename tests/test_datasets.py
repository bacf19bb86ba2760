"""Loader tests against tiny generated on-disk fixtures.

Each real-dataset loader parses a specific on-disk format (txt trees,
json splits, h5, raw Annotations). These tests generate miniature
fixtures in that exact format and drive ``__getitem__`` end-to-end
(VERDICT r1 item 2a). Formats per SURVEY.md §2.1: reference
pytorch/datasets/{ModelNet40,ShapeNetPart,PartNet,S3DIS}.py.
"""

import json
import os

import numpy as np
import pytest

from closerlook3d_tpu.utils.config import load_config


# ---------------------------------------------------------------- ModelNet40


def _write_modelnet40(root, n_points=64):
    base = os.path.join(root, "modelnet40_normal_resampled")
    rng = np.random.default_rng(0)
    ids = {"train": [], "test": []}
    for cls in ("airplane", "night_stand"):
        os.makedirs(os.path.join(base, cls), exist_ok=True)
        for i, split in ((1, "train"), (2, "train"), (3, "test")):
            sid = f"{cls}_{i:04d}"
            pts = rng.uniform(-1, 1, size=(n_points, 6)).astype(np.float32)
            np.savetxt(os.path.join(base, cls, sid + ".txt"), pts,
                       delimiter=",", fmt="%.6f")
            ids[split].append(sid)
    for split, sids in ids.items():
        with open(os.path.join(base, f"modelnet40_{split}.txt"), "w") as f:
            f.write("\n".join(sids) + "\n")
    return base


def test_modelnet40_fixture(tmp_path):
    from closerlook3d_tpu.data.modelnet40 import ModelNet40

    _write_modelnet40(str(tmp_path))
    cfg = load_config()
    cfg.data_root = str(tmp_path)
    cfg.num_points = 48

    train = ModelNet40(cfg, "train")
    test = ModelNet40(cfg, "test")
    assert len(train) == 4 and len(test) == 2

    s = train[0]
    assert s["xyz"].shape == (48, 3) and s["xyz"].dtype == np.float32
    assert s["normals"].shape == (48, 3)
    assert s["mask"].shape == (48,) and s["mask"].all()
    # label comes from the class-name prefix (multi-token names included)
    labels = sorted({int(train[i]["label"]) for i in range(len(train))})
    assert labels == [0, 23]  # airplane=0, night_stand=23

    # test split is deterministic (no augmentation, no random sampling)
    a, b = test[0], test[0]
    np.testing.assert_array_equal(a["xyz"], b["xyz"])

    # second read hits the .npy cache and must agree
    c = ModelNet40(cfg, "test")[0]
    np.testing.assert_array_equal(a["xyz"], c["xyz"])


def test_modelnet40_pads_short_clouds(tmp_path):
    from closerlook3d_tpu.data.modelnet40 import ModelNet40

    _write_modelnet40(str(tmp_path), n_points=20)
    cfg = load_config()
    cfg.data_root = str(tmp_path)
    cfg.num_points = 32
    s = ModelNet40(cfg, "test")[0]
    assert s["xyz"].shape == (32, 3)
    assert s["mask"].sum() == 20 and not s["mask"][20:].any()


# -------------------------------------------------------------- ShapeNetPart


def _write_shapenetpart(root, n_points=80):
    base = os.path.join(
        root, "shapenetcore_partanno_segmentation_benchmark_v0_normal")
    rng = np.random.default_rng(1)
    # Airplane (synset 02691156, parts 0-3), Chair (03001627, parts 12-15)
    shapes = {
        "02691156": [("a1", 0, 4), ("a2", 0, 4)],
        "03001627": [("c1", 12, 4)],
    }
    tokens = []
    for synset, items in shapes.items():
        os.makedirs(os.path.join(base, synset), exist_ok=True)
        for sid, lo, n in items:
            data = np.concatenate([
                rng.uniform(-1, 1, size=(n_points, 6)),
                rng.integers(lo, lo + n, size=(n_points, 1)),
            ], axis=1)
            np.savetxt(os.path.join(base, synset, sid + ".txt"), data,
                       fmt="%.6f")
            tokens.append(f"shape_data/{synset}/{sid}")
    os.makedirs(os.path.join(base, "train_test_split"), exist_ok=True)
    for split, toks in (("train", tokens[:2]), ("val", tokens[2:]),
                        ("test", tokens)):
        with open(os.path.join(base, "train_test_split",
                               f"shuffled_{split}_file_list.json"),
                  "w") as f:
            json.dump(toks, f)
    return base


def test_shapenetpart_fixture(tmp_path):
    from closerlook3d_tpu.data.shapenetpart import NUM_PARTS, ShapeNetPart

    assert sum(NUM_PARTS) == 50  # official benchmark invariant
    _write_shapenetpart(str(tmp_path))
    cfg = load_config()
    cfg.data_root = str(tmp_path)
    cfg.num_points = 64

    train = ShapeNetPart(cfg, "trainval")  # train+val lists
    test = ShapeNetPart(cfg, "test")
    assert len(train) == 3 and len(test) == 3

    cats = set()
    for i in range(len(test)):
        s = test[i]
        assert s["xyz"].shape == (64, 3)
        assert s["labels"].shape == (64,)
        cat = int(s["category"])
        cats.add(cat)
        lo = {0: 0, 4: 12}[cat] if cat in (0, 4) else None
        assert lo is not None
        valid = s["mask"]
        assert ((s["labels"][valid] >= lo)
                & (s["labels"][valid] < lo + 4)).all()
    assert cats == {0, 4}  # Airplane, Chair


# ------------------------------------------------------------------- PartNet


def _write_partnet(root, level, cats, n_parts, n_points=100):
    base = os.path.join(root, "sem_seg_h5")
    import h5py
    rng = np.random.default_rng(2)
    for cat, npart in zip(cats, n_parts):
        d = os.path.join(base, f"{cat}-{level}")
        os.makedirs(d, exist_ok=True)
        for split, rows in (("train", 3), ("val", 1), ("test", 2)):
            with h5py.File(os.path.join(d, f"{split}-00.h5"), "w") as f:
                f["data"] = rng.uniform(
                    -1, 1, size=(rows, n_points, 3)).astype(np.float32)
                f["label_seg"] = rng.integers(
                    0, npart, size=(rows, n_points)).astype(np.int64)
    return base


def test_partnet_fixture_levels(tmp_path):
    from closerlook3d_tpu.data.partnet import PartNet

    _write_partnet(str(tmp_path), 3, ["Chair", "Lamp"], [4, 3])
    _write_partnet(str(tmp_path), 1, ["Chair"], [2])
    cfg = load_config()
    cfg.data_root = str(tmp_path)
    cfg.num_points = 64

    ds3 = PartNet(cfg, "train", level=3)
    assert ds3.categories == ["Chair-3", "Lamp-3"]
    assert ds3.num_parts == [4, 3]
    assert len(ds3) == 6  # 3 rows per category
    # labels are offset to global ids by category order
    seen = {0: set(), 1: set()}
    for i in range(len(ds3)):
        s = ds3[i]
        assert s["xyz"].shape == (64, 3)
        cat = int(s["category"])
        seen[cat].update(s["labels"][s["mask"]].tolist())
    assert seen[0] <= set(range(0, 4))
    assert seen[1] <= set(range(4, 7))

    ds1 = PartNet(cfg, "test", level=1)
    assert ds1.categories == ["Chair-1"] and ds1.num_parts == [2]
    assert len(ds1) == 2


def test_partnet_level_config_wiring(tmp_path):
    """cfg.partnet_level reaches the loader via build_dataset."""
    from closerlook3d_tpu.data.build import build_dataset

    _write_partnet(str(tmp_path), 1, ["Chair"], [2])
    cfg = load_config()
    cfg.datasets = "partnet"
    cfg.data_root = str(tmp_path)
    cfg.num_points = 64
    cfg.partnet_level = 1
    ds = build_dataset(cfg, "train")
    assert ds.categories == ["Chair-1"]
    assert cfg.num_parts == [2]


# --------------------------------------------------------------------- S3DIS


def _write_s3dis_raw(root, rng, n_per_obj=300):
    """Two areas, one room each; classes spatially separated with a gap
    so voxel-majority labels and 1-NN projection are unambiguous."""
    raw = os.path.join(root, "Stanford3dDataset_v1.2_Aligned_Version")
    for area, room in (("Area_1", "office_1"), ("Area_5", "office_5")):
        ann = os.path.join(raw, area, room, "Annotations")
        os.makedirs(ann, exist_ok=True)
        # floor: z in [0, 0.1], x in [0, 2]; ceiling: z in [2, 2.1]
        floor = np.concatenate([
            rng.uniform([0, 0, 0], [2, 2, 0.1], size=(n_per_obj, 3)),
            rng.uniform(0, 255, size=(n_per_obj, 3)),
        ], axis=1)
        ceil = np.concatenate([
            rng.uniform([0, 0, 2.0], [2, 2, 2.1], size=(n_per_obj, 3)),
            rng.uniform(0, 255, size=(n_per_obj, 3)),
        ], axis=1)
        np.savetxt(os.path.join(ann, "floor_1.txt"), floor, fmt="%.4f")
        np.savetxt(os.path.join(ann, "ceiling_1.txt"), ceil, fmt="%.4f")
    return raw


def _s3dis_cfg(tmp_path):
    cfg = load_config()
    cfg.data_root = str(tmp_path)
    cfg.first_subsampling_dl = 0.08
    cfg.num_points = 128
    cfg.in_radius = 1.5
    cfg.num_steps = 2
    cfg.batch_size = 2
    cfg.input_features = "ones,rgb,height"
    return cfg


def test_s3dis_prep_and_loader(tmp_path):
    from closerlook3d_tpu.data.s3dis import CLASS_NAMES, S3DIS, prepare_rooms

    rng = np.random.default_rng(3)
    _write_s3dis_raw(str(tmp_path), rng)
    cache = prepare_rooms(str(tmp_path), cell=0.08)
    files = sorted(os.listdir(cache))
    assert files == ["Area_1__office_1.npz", "Area_5__office_5.npz"]
    z = np.load(os.path.join(cache, files[0]))
    assert len(z["sub_xyz"]) < len(z["full_xyz"])  # actually subsampled
    assert set(np.unique(z["sub_labels"])) == {
        CLASS_NAMES.index("floor"), CLASS_NAMES.index("ceiling")}

    cfg = _s3dis_cfg(tmp_path)
    train = S3DIS(cfg, "train")
    test = S3DIS(cfg, "test")
    assert train.room_names == ["Area_1__office_1"]  # test area excluded
    assert test.room_names == ["Area_5__office_5"]
    assert len(train) == cfg.num_steps * cfg.batch_size

    s = train[0]
    assert s["xyz"].shape == (128, 3)
    assert s["rgb"].shape == (128, 3) and s["rgb"].max() <= 1.0
    assert s["height"].shape == (128, 1)
    assert s["labels"].shape == (128,)
    assert s["mask"].any()
    # xyz is recentred; height keeps absolute z
    assert abs(float(s["xyz"][s["mask"]].mean())) < 1.5
    assert float(s["height"].max()) > 1.5 or float(s["height"].max()) < 0.5


# --------------------------------------------------------------- check_data


def test_check_data_reports(tmp_path):
    """--check_data: good fixtures pass; broken trees fail with
    actionable messages (VERDICT r2 item 8)."""
    from closerlook3d_tpu.data.check import check_data

    cfg = load_config()
    cfg.data_root = str(tmp_path / "nothing_here")

    # synthetic: always fine, nothing on disk
    cfg.datasets = "synthetic"
    assert not check_data(cfg).has_errors

    # missing roots: every real dataset errors with the expected path
    for name in ("modelnet40", "shapenetpart", "partnet", "s3dis"):
        cfg.datasets = name
        rep = check_data(cfg)
        assert rep.has_errors
        assert str(cfg.data_root) in rep.render()

    # good fixtures: warnings (tiny split sizes) but no errors
    root = tmp_path / "good"
    _write_modelnet40(str(root))
    _write_shapenetpart(str(root))
    _write_partnet(str(root), 3, ["Chair"], [4])
    _write_s3dis_raw(str(root), np.random.default_rng(5))
    cfg.data_root = str(root)
    for name in ("modelnet40", "shapenetpart", "partnet", "s3dis"):
        cfg.datasets = name
        rep = check_data(cfg)
        assert not rep.has_errors, (name, rep.render())

    # S3DIS processed cache is checked in preference to the raw tree
    from closerlook3d_tpu.data.s3dis import prepare_rooms
    prepare_rooms(str(root), cell=0.08)
    cfg.first_subsampling_dl = 0.08
    cfg.datasets = "s3dis"
    rep = check_data(cfg)
    assert not rep.has_errors and "processed cache" in rep.render()
    # wrong test area → error naming the config knob
    cfg.s3dis_test_area = 4
    rep = check_data(cfg)
    assert rep.has_errors and "s3dis_test_area" in rep.render()
    cfg.s3dis_test_area = 5

    # a listed-but-missing shape file is an error that names the file
    base = os.path.join(root, "modelnet40_normal_resampled", "airplane",
                        "airplane_0001")
    for ext in (".txt", ".npy"):
        if os.path.exists(base + ext):
            os.remove(base + ext)
    cfg.datasets = "modelnet40"
    rep = check_data(cfg)
    assert rep.has_errors and "airplane_0001" in rep.render()

    # corrupt split json → parse error, not a crash
    jf = os.path.join(
        root, "shapenetcore_partanno_segmentation_benchmark_v0_normal",
        "train_test_split", "shuffled_train_file_list.json")
    with open(jf, "w") as f:
        f.write("{not json")
    cfg.datasets = "shapenetpart"
    rep = check_data(cfg)
    assert rep.has_errors and "unparseable" in rep.render()


def test_check_data_cli(tmp_path):
    """`--check_data` exits 0 on a valid tree, 1 on errors."""
    from closerlook3d_tpu.cli.train import main

    root = tmp_path / "d"
    _write_modelnet40(str(root))
    with pytest.raises(SystemExit) as e:
        main(["--check_data", f"data_root={root}", "datasets=modelnet40"])
    assert e.value.code == 0
    with pytest.raises(SystemExit) as e:
        main(["--check_data", f"data_root={tmp_path}/absent",
              "datasets=modelnet40"])
    assert e.value.code == 1


def test_s3dis_potential_coverage(tmp_path):
    """Min-potential picking must spread spheres across the room."""
    from closerlook3d_tpu.data.s3dis import S3DIS, prepare_rooms

    rng = np.random.default_rng(4)
    _write_s3dis_raw(str(tmp_path), rng)
    prepare_rooms(str(tmp_path), cell=0.08)
    cfg = _s3dis_cfg(tmp_path)
    ds = S3DIS(cfg, "train")
    covered = np.zeros(len(ds.xyz[0]), bool)
    for _ in range(12):
        room_idx, center, idx = ds.pick_center()
        assert room_idx == 0
        covered[idx] = True
    assert covered.mean() > 0.9  # near-total coverage after a few picks
