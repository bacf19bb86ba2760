"""End-to-end tests for the protocol evaluators (VERDICT r1 item 2b/2c).

evaluate_s3dis_voting: drive the full vote-accumulation / termination /
1-NN-projection / confusion bookkeeping on procedural rooms with an
ORACLE logits function (logits = one-hot of the true labels). The oracle
isolates the protocol from model quality: with spatially separated
classes the protocol must return mIoU == 1 exactly, and terminate in a
bounded number of sphere batches.

evaluate_partseg: oracle gives all-ones mIoU; a constant-part predictor
gives a hand-computable instance mIoU.

Reference: SURVEY.md §3.3 (evaluate_s3dis_dist.py vote loop + KDTree
projection), §2.1 metrics.
"""

import os

import numpy as np
import pytest

from tests.test_datasets import _s3dis_cfg, _write_s3dis_raw
from closerlook3d_tpu.utils.config import load_config


def _oracle_logits_factory(num_classes):
    def fn(state, batch):
        del state
        lab = np.asarray(batch["labels"])
        return np.eye(num_classes, dtype=np.float32)[lab] * 10.0
    return fn


def test_evaluate_s3dis_voting_oracle(tmp_path):
    from closerlook3d_tpu.data.s3dis import S3DIS, prepare_rooms
    from closerlook3d_tpu.train.evaluate import evaluate_s3dis_voting

    rng = np.random.default_rng(5)
    _write_s3dis_raw(str(tmp_path), rng)
    prepare_rooms(str(tmp_path), cell=0.08)
    cfg = _s3dis_cfg(tmp_path)
    cfg.num_votes = 2
    ds = S3DIS(cfg, "test")

    res = evaluate_s3dis_voting(cfg, ds, state=None,
                                eval_logits_fn=_oracle_logits_factory(13))

    # termination: potentials reach num_votes in bounded batches
    # (~ num_votes * room_points / (taper * sphere_points) — far under
    # this generous cap; non-termination would hang, the cap documents
    # the expected scale)
    assert res["sphere_batches"] < 200
    # the oracle must score perfectly on covered points, sub and full
    assert res["subcloud_miou"] == pytest.approx(1.0)
    assert res["subcloud_oa"] == pytest.approx(1.0)
    assert res["miou"] == pytest.approx(1.0)
    assert res["oa"] == pytest.approx(1.0)
    # per-class IoU: only floor(1)/ceiling(0) appear; others are 0-denom
    iou = np.array(res["iou_per_class"])
    assert iou[0] == pytest.approx(1.0) and iou[1] == pytest.approx(1.0)


def test_evaluate_s3dis_voting_vote_coverage(tmp_path):
    """Every sub-point must receive >= num_votes worth of potential, and
    the score buffers must actually cover the room."""
    from closerlook3d_tpu.data.s3dis import S3DIS, prepare_rooms
    from closerlook3d_tpu.train import evaluate as ev

    rng = np.random.default_rng(6)
    _write_s3dis_raw(str(tmp_path), rng)
    prepare_rooms(str(tmp_path), cell=0.08)
    cfg = _s3dis_cfg(tmp_path)
    cfg.num_votes = 1
    ds = S3DIS(cfg, "test")

    real_fn = _oracle_logits_factory(13)
    calls = {"n": 0}

    def counting_fn(state, batch):
        calls["n"] += 1
        return real_fn(state, batch)

    res = ev.evaluate_s3dis_voting(cfg, ds, None, counting_fn)
    assert calls["n"] == res["sphere_batches"]
    assert calls["n"] >= 1
    # after termination every potential is >= num_votes
    assert min(p.min() for p in ds.potentials) >= cfg.num_votes


class _TinyPartDataset:
    """Two categories (2 and 3 parts); labels split by x-coordinate."""

    num_parts = [2, 3]

    def __init__(self, n_shapes=5, n_points=64):
        self.n_points = n_points
        rng = np.random.default_rng(7)
        self.samples = []
        starts = [0, 2]
        for i in range(n_shapes):
            cat = i % 2
            xyz = rng.uniform(-1, 1, size=(n_points, 3)).astype(np.float32)
            # deterministic labels: part by x sign (2 parts) / thirds (3)
            if cat == 0:
                lab = (xyz[:, 0] > 0).astype(np.int32)
            else:
                lab = np.digitize(xyz[:, 0], [-0.33, 0.33]).astype(np.int32)
            self.samples.append({
                "xyz": xyz,
                "mask": np.ones(n_points, bool),
                "labels": lab + starts[cat],
                "category": np.int32(cat),
            })

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


def test_evaluate_partseg_oracle():
    from closerlook3d_tpu.data.loader import BatchIterator
    from closerlook3d_tpu.train.evaluate import evaluate_partseg

    ds = _TinyPartDataset()
    cfg = load_config()
    cfg.num_parts = list(ds.num_parts)
    # batch of 2 over 5 shapes -> final batch is padded (batch_pad path)
    it = BatchIterator(ds, 2, shuffle=False, feature_spec="xyz",
                       drop_last=False)
    res = evaluate_partseg(cfg, ds, None, _oracle_logits_factory(5),
                           iter(it))
    assert res["ins_miou"] == pytest.approx(1.0)
    assert res["cls_miou"] == pytest.approx(1.0)
    assert res["category_miou"] == pytest.approx(1.0)


def test_vote_augment():
    """Vote 0 is the clean pass; later votes rotate+scale per cloud,
    rotate normals with the cloud, and rebuild features."""
    from closerlook3d_tpu.train.evaluate import vote_augment

    cfg = load_config()
    cfg.augment_rotation = "so3"
    cfg.input_features = "xyz"
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-1, 1, size=(3, 16, 3)).astype(np.float32)
    nrm = rng.normal(size=(3, 16, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    batch = {"xyz": xyz, "normals": nrm,
             "mask": np.ones((3, 16), bool), "features": xyz.copy()}

    assert vote_augment(batch, cfg, np.random.default_rng(1), 0) is batch
    out = vote_augment(batch, cfg, np.random.default_rng(1), 1)
    assert not np.allclose(out["xyz"], xyz)  # actually augmented
    np.testing.assert_array_equal(batch["xyz"], xyz)  # input untouched
    # normals rotate rigidly: unit norm preserved
    np.testing.assert_allclose(
        np.linalg.norm(out["normals"], axis=-1), 1.0, rtol=1e-5)
    # features rebuilt from the augmented xyz
    np.testing.assert_array_equal(out["features"], out["xyz"])
    # per-cloud randomness: clouds get different transforms
    r0 = out["xyz"][0] @ np.linalg.pinv(xyz[0])
    r1 = out["xyz"][1] @ np.linalg.pinv(xyz[1])
    assert not np.allclose(r0, r1, atol=1e-3)


def test_evaluate_partseg_vote_averaging():
    """cfg.vote_eval honors num_votes outside S3DIS: the logits fn runs
    num_votes times per batch and a label-oracle stays perfect."""
    from closerlook3d_tpu.data.loader import BatchIterator
    from closerlook3d_tpu.train.evaluate import evaluate_partseg

    ds = _TinyPartDataset()
    cfg = load_config()
    cfg.num_parts = list(ds.num_parts)
    cfg.vote_eval = True
    cfg.num_votes = 3
    calls = {"n": 0}
    oracle = _oracle_logits_factory(5)

    def fn(state, batch):
        calls["n"] += 1
        return oracle(state, batch)

    it = BatchIterator(ds, 2, shuffle=False, feature_spec="xyz",
                       drop_last=False)
    n_batches = len(it)
    res = evaluate_partseg(cfg, ds, None, fn, iter(it))
    assert calls["n"] == n_batches * 3
    assert res["ins_miou"] == pytest.approx(1.0)


class _TinyClsDataset:
    """Label is encoded in the valid-point count (vote-invariant)."""

    def __init__(self, n=6, n_points=32, n_classes=3):
        rng = np.random.default_rng(11)
        self.samples = []
        for i in range(n):
            label = i % n_classes
            mask = np.zeros(n_points, bool)
            mask[:10 + label] = True
            self.samples.append({
                "xyz": rng.uniform(-1, 1, (n_points, 3)).astype(np.float32),
                "mask": mask,
                "label": np.int32(label),
            })

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


def test_evaluate_classification_voting():
    from closerlook3d_tpu.data.loader import BatchIterator
    from closerlook3d_tpu.train.evaluate import evaluate_classification

    ds = _TinyClsDataset()
    cfg = load_config()
    cfg.input_features = "xyz"
    calls = {"n": 0}

    def mask_oracle(state, batch):
        calls["n"] += 1
        n_valid = np.asarray(batch["mask"]).sum(-1)
        return np.eye(3, dtype=np.float32)[n_valid - 10] * 10.0

    # default: single clean pass
    it = BatchIterator(ds, 4, shuffle=False, feature_spec="xyz",
                       drop_last=False)
    res = evaluate_classification(cfg, None, mask_oracle, iter(it))
    assert res["accuracy"] == pytest.approx(1.0)
    assert res["num_votes"] == 1 and calls["n"] == len(it)

    # voting on: num_votes augmented passes, oracle stays perfect
    cfg.vote_eval = True
    cfg.num_votes = 4
    calls["n"] = 0
    it = BatchIterator(ds, 4, shuffle=False, feature_spec="xyz",
                       drop_last=False)
    res = evaluate_classification(cfg, None, mask_oracle, iter(it))
    assert res["accuracy"] == pytest.approx(1.0)
    assert res["num_votes"] == 4 and calls["n"] == len(it) * 4


def test_evaluate_partseg_constant_predictor():
    """Predictor that always answers the first part of the category slice:
    hand-computed instance mIoU per shape = mean over the category's
    parts of [IoU(part0), 0, ...]."""
    from closerlook3d_tpu.data.loader import BatchIterator
    from closerlook3d_tpu.train.evaluate import evaluate_partseg

    ds = _TinyPartDataset(n_shapes=2)
    cfg = load_config()
    cfg.num_parts = list(ds.num_parts)

    def const_fn(state, batch):
        b, n = np.asarray(batch["labels"]).shape
        logits = np.zeros((b, n, 5), np.float32)
        # highest score on global part 0 and on global part 2 (first
        # parts of each category slice); the evaluator restricts to the
        # category slice so the other category's column is irrelevant
        logits[..., 0] = 5.0
        logits[..., 2] = 4.0
        return logits

    it = BatchIterator(ds, 2, shuffle=False, feature_spec="xyz",
                       drop_last=False)
    res = evaluate_partseg(cfg, ds, None, const_fn, iter(it))

    # shape 0 (cat 0, 2 parts): pred all part0. IoU(part0) = frac0,
    # IoU(part1) = 0 -> per-shape = frac0/2. shape 1 (cat 1, 3 parts):
    # per-shape = frac_first_third/3.
    s0 = ds[0]
    frac0 = (s0["labels"] == 0).mean()
    s1 = ds[1]
    frac1 = (s1["labels"] == 2).mean()
    expect_ins = np.mean([frac0 / 2, frac1 / 3])
    assert res["ins_miou"] == pytest.approx(expect_ins)
    assert res["cls_miou"] == pytest.approx(
        np.mean([frac0 / 2, frac1 / 3]))
