"""Task evaluators, including S3DIS sliding-sphere voting.

Parity (SURVEY.md §3.3 evaluate_s3dis_dist.py): repeatedly extract
low-potential spheres until every sub-point is covered ~num_votes times,
accumulate softmax scores per sub-point (running vote), project to the
full cloud by 1-NN (host KDTree), then confusion-matrix IoU. The per-
sphere forward is the same jitted eval step as validation; only the vote
bookkeeping lives on host.

ShapeNetPart/PartNet evaluators compute the reference's instance/class
mIoU and per-category part mIoU from whole-shape predictions.
"""

from __future__ import annotations

from typing import List

import jax
import numpy as np

from closerlook3d_tpu.data import transforms as T
from closerlook3d_tpu.data.loader import build_features
from closerlook3d_tpu.parallel.collectives import (
    all_processes_concat,
    all_processes_min,
    all_processes_sum,
    process_local_rows,
)
from closerlook3d_tpu.train.metrics import (
    iou_from_confusion,
    miou_from_shape_ious,
    partnet_miou,
    shapenetpart_shape_iou,
)


def _fetch_local(x) -> np.ndarray:
    """Host copy of the rows this process may read: for a batch-sharded
    global jax.Array the process-local shard rows (they line up 1:1 with
    the local host batch — parallel/collectives.py::process_local_rows);
    identity host copy for numpy/replicated arrays (oracle test fns)."""
    if hasattr(x, "addressable_shards"):
        return process_local_rows(x)
    return np.asarray(x)


def _shape_votes(cfg) -> int:
    """Vote count for shape-task eval (cls/partseg); 1 = single clean
    pass. Gated by cfg.vote_eval — [U] unverified vs the reference mount
    (SURVEY.md §3.3 pins vote accumulation for S3DIS only)."""
    if not getattr(cfg, "vote_eval", False):
        return 1
    return max(int(cfg.num_votes), 1)


def vote_augment(batch, cfg, rng, vote: int):
    """Per-vote augmented copy of an eval batch (vote 0 = clean pass).

    Mirrors the train-time augmentation family: per-cloud random
    rotation (cfg.augment_rotation) + anisotropic scale, no jitter
    noise; normals rotate with the cloud and features are rebuilt.
    """
    if vote == 0:
        return batch
    out = dict(batch)
    xyz = batch["xyz"]
    normals = batch.get("normals")
    new_xyz = np.empty_like(xyz)
    new_nrm = np.empty_like(normals) if normals is not None else None
    for b in range(xyz.shape[0]):
        rot = T.rotation_matrix(cfg.augment_rotation, rng)
        p, n = T.rotate(xyz[b], rot,
                        None if normals is None else normals[b])
        scale = rng.uniform(cfg.augment_scale_min, cfg.augment_scale_max,
                            size=(3,)).astype(np.float32)
        new_xyz[b] = p * scale
        if new_nrm is not None:
            new_nrm[b] = n
    out["xyz"] = new_xyz.astype(np.float32)
    if new_nrm is not None:
        out["normals"] = new_nrm
    out["features"] = build_features(out, cfg.input_features)
    return out


def evaluate_classification(cfg, state, eval_logits_fn, batch_iter):
    """ModelNet40-style eval; optional vote averaging (cfg.vote_eval)."""
    votes = _shape_votes(cfg)
    rng = np.random.default_rng(cfg.rng_seed)
    correct = total = 0
    for batch in batch_iter:
        keep = ~batch["batch_pad"]
        prob = None
        for v in range(votes):
            vb = vote_augment(batch, cfg, rng, v)
            db = {k: vb[k] for k in ("xyz", "mask", "features")}
            logits = _fetch_local(eval_logits_fn(state, db))
            p = _softmax(logits)
            prob = p if prob is None else prob + p
        pred = prob.argmax(-1)
        correct += int((pred[keep] == batch["label"][keep]).sum())
        total += int(keep.sum())
    # multi-host: each process saw its sample shard; reduce the counts
    correct, total = all_processes_sum((correct, total))
    return {"accuracy": correct / max(total, 1), "num_votes": votes}


def evaluate_s3dis_voting(cfg, dataset, state, eval_logits_fn, logger=None):
    """Full S3DIS protocol. Returns dict with mIoU/OA + per-class IoU.

    eval_logits_fn(state, batch) -> [B, N, C] logits (jitted).
    """
    nroom = len(dataset.xyz)
    # multi-host: rooms are sharded round-robin across processes; each
    # process votes only on its rooms (unowned potentials pinned to +inf
    # so pick_center never selects them) and the confusion matrices are
    # summed across processes at the end.
    pidx, pcnt = jax.process_index(), jax.process_count()
    owned = list(range(pidx, nroom, pcnt))
    scores = [np.zeros((len(x), dataset.num_classes), np.float32)
              for x in dataset.xyz]
    counts = [np.zeros(len(x), np.float32) for x in dataset.xyz]
    # fresh potentials for deterministic covering
    pots = [np.random.default_rng(7 + i).random(len(x)).astype(np.float32)
            * 1e-3 for i, x in enumerate(dataset.xyz)]
    for r in range(nroom):
        if r not in owned:
            pots[r][:] = np.inf
    dataset.potentials = pots

    bs = cfg.batch_size
    vote_round = 0
    while True:
        # lockstep bound: eval_logits_fn is a COLLECTIVE under
        # process_count > 1 (global batch assembly + sharded forward), so
        # every process must run the same number of rounds — the loop
        # continues until the GLOBAL min potential is covered, processes
        # whose own rooms finished early keep voting (harmless extra
        # votes on their rooms; a process owning no rooms sends +inf)
        local_min = (min(pots[r].min() for r in owned) if owned
                     else float("inf"))
        if all_processes_min(local_min) >= cfg.num_votes:
            break
        samples = []
        rooms = []
        for _ in range(bs):
            room_idx, center, idx = dataset.pick_center()
            s = dataset.extract_sphere(room_idx, center, idx, train=False)
            samples.append(s)
            rooms.append(room_idx)
        batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
        batch["features"] = build_features(batch, cfg.input_features)
        if getattr(cfg, "spatial_sort", "host") == "host":
            from closerlook3d_tpu.data.spatial_host import morton_sort_batch
            batch = morton_sort_batch(batch)  # permutes point_idx/mask too
        metas = [(rooms[b], batch["point_idx"][b], batch["mask"][b])
                 for b in range(bs)]
        device_batch = {k: batch[k] for k in
                        ("xyz", "mask", "features", "labels")}
        logits = _fetch_local(eval_logits_fn(state, device_batch))
        prob = _softmax(logits)
        for b, (room_idx, pidx, mask) in enumerate(metas):
            v = mask
            np.add.at(scores[room_idx], pidx[v], prob[b][v])
            np.add.at(counts[room_idx], pidx[v], 1.0)
        vote_round += 1
        if logger and vote_round % 50 == 0:
            logger.info("s3dis eval: %d sphere batches, min potential %.2f",
                        vote_round, min_pot)

    # project sub-cloud scores onto full clouds via 1-NN and accumulate
    conf = np.zeros((dataset.num_classes, dataset.num_classes), np.float64)
    sub_conf = np.zeros_like(conf)
    for r in owned:
        seen = counts[r] > 0
        sub_pred = scores[r].argmax(1)
        lab = dataset.labels[r]
        np.add.at(sub_conf, (lab[seen], sub_pred[seen]), 1)
        full_xyz, full_labels = dataset.full_cloud(r)
        nn = dataset.trees[r].query(full_xyz, k=1)[1]
        full_pred = sub_pred[nn]
        np.add.at(conf, (full_labels, full_pred), 1)
    conf, sub_conf, vote_round = all_processes_sum(
        (conf, sub_conf, vote_round))
    iou, miou, oa = iou_from_confusion(conf)
    _, sub_miou, sub_oa = iou_from_confusion(sub_conf)
    return {"miou": miou, "oa": oa, "iou_per_class": iou.tolist(),
            "subcloud_miou": sub_miou, "subcloud_oa": sub_oa,
            "sphere_batches": vote_round}


def evaluate_partseg(cfg, dataset, state, eval_logits_fn, batch_iter):
    """ShapeNetPart / PartNet whole-shape evaluation (masked argmax);
    optional vote averaging over augmented passes (cfg.vote_eval)."""
    preds: List[np.ndarray] = []
    labels: List[np.ndarray] = []
    cats: List[int] = []
    num_parts = list(cfg.num_parts)
    starts = np.concatenate([[0], np.cumsum(num_parts)[:-1]]).astype(int)
    votes = _shape_votes(cfg)
    rng = np.random.default_rng(cfg.rng_seed)
    for batch in batch_iter:
        prob = None
        for v in range(votes):
            vb = vote_augment(batch, cfg, rng, v)
            db = {k: vb[k] for k in ("xyz", "mask", "features", "labels",
                                     "category")}
            lg = _fetch_local(eval_logits_fn(state, db))
            p = _softmax(lg)
            prob = p if prob is None else prob + p
        logits = prob  # softmax averages; argmax below is unchanged
        keep = ~batch["batch_pad"]
        for b in range(logits.shape[0]):
            if not keep[b]:
                continue
            cat = int(batch["category"][b])
            s, n = starts[cat], num_parts[cat]
            sl = logits[b][:, s:s + n]  # restrict to category slice
            pred = sl.argmax(-1) + s
            m = batch["mask"][b]
            preds.append(pred[m])
            labels.append(batch["labels"][b][m])
            cats.append(cat)
    # per-shape IoUs reduce to scalars BEFORE the cross-process gather
    # (point counts per shape are ragged; the scalar list is cheap)
    shape_ious = np.array([
        shapenetpart_shape_iou(p, l, c, num_parts)
        for p, l, c in zip(preds, labels, cats)], np.float64)
    # per-category confusions for the PartNet protocol
    confs = []
    for c in range(len(num_parts)):
        s, n = starts[c], num_parts[c]
        cc = np.zeros((n, n), np.float64)
        for p, l, cat in zip(preds, labels, cats):
            if cat == c:
                np.add.at(cc, (l - s, p - s), 1)
        confs.append(cc)
    # multi-host: each process evaluated its shard; gather/reduce
    shape_ious = all_processes_concat(shape_ious)
    cats = all_processes_concat(np.asarray(cats, np.int64)).tolist()
    confs = all_processes_sum(confs)
    ins_miou, cls_miou = miou_from_shape_ious(shape_ious, cats,
                                              len(num_parts))
    pn_miou = partnet_miou(confs)
    per_cat = []
    for cc in confs:
        if cc.sum() == 0:
            per_cat.append(None)  # category absent from this split
        else:
            _, m, _ = iou_from_confusion(cc)
            per_cat.append(round(float(m), 4))
    return {"ins_miou": ins_miou, "cls_miou": cls_miou,
            "category_miou": pn_miou,
            # PartNet protocol: per-(category, level) part mIoU — the
            # level is fixed by cfg.partnet_level (one model per level,
            # as the reference trains them)
            "per_category_miou": per_cat}


def _softmax(x):
    x = x - x.max(-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(-1, keepdims=True)
