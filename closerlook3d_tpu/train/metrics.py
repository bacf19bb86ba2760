"""Metrics: device-side confusion accumulation + host-side IoU reductions.

Parity (SURVEY.md §2.1 "Metrics & misc"; reference pytorch/utils/util.py):
AverageMeter, overall accuracy, confusion-matrix IoU (S3DIS per-class
IoU/mIoU), ShapeNetPart instance/class mIoU, PartNet per-category mIoU.

The confusion matrix is accumulated on device as a one-hot matmul
(labels^T @ preds rides the MXU); IoU reductions run on host numpy.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class AverageMeter:
    """Running average (reference utils.AverageMeter)."""

    def __init__(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value, n: int = 1):
        self.sum += float(value) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


@functools.partial(jax.jit, static_argnames=("num_classes",))
def confusion_matrix(preds: jax.Array, labels: jax.Array, num_classes: int,
                     mask: Optional[jax.Array] = None) -> jax.Array:
    """[C, C] confusion (rows = true, cols = pred), mask-aware."""
    p = preds.reshape(-1)
    t = labels.reshape(-1)
    if mask is not None:
        w = mask.reshape(-1).astype(jnp.float32)
    else:
        w = jnp.ones_like(p, dtype=jnp.float32)
    w = w * (t >= 0) * (t < num_classes)
    t = jnp.clip(t, 0, num_classes - 1)
    oh_t = jax.nn.one_hot(t, num_classes, dtype=jnp.float32) * w[:, None]
    oh_p = jax.nn.one_hot(p, num_classes, dtype=jnp.float32)
    return oh_t.T @ oh_p


def iou_from_confusion(conf: np.ndarray):
    """(per_class_iou [C], mIoU, OA) from a confusion matrix."""
    conf = np.asarray(conf, dtype=np.float64)
    tp = np.diag(conf)
    fp = conf.sum(0) - tp
    fn = conf.sum(1) - tp
    denom = np.maximum(tp + fp + fn, 1e-9)
    iou = tp / denom
    present = conf.sum(1) > 0  # classes that appear in ground truth
    miou = float(iou[present].mean()) if present.any() else 0.0
    oa = float(tp.sum() / max(conf.sum(), 1e-9))
    return iou, miou, oa


def shapenetpart_shape_iou(pred: np.ndarray, label: np.ndarray, cat: int,
                           num_parts: Sequence[int]) -> float:
    """One shape's part-averaged IoU (GLOBAL part ids; category slice).

    Reference convention: parts absent from both pred and gt count IoU 1.
    """
    starts = np.concatenate([[0], np.cumsum(num_parts)[:-1]])
    s, n = int(starts[cat]), int(num_parts[cat])
    ious = []
    for part in range(s, s + n):
        pi = pred == part
        ti = label == part
        union = np.logical_or(pi, ti).sum()
        ious.append(1.0 if union == 0
                    else np.logical_and(pi, ti).sum() / union)
    return float(np.mean(ious))


def miou_from_shape_ious(shape_ious: np.ndarray,
                         category_list: Sequence[int],
                         num_categories: int):
    """(instance mIoU, class mIoU) from per-shape IoUs + categories.

    Split out from the per-shape computation so multi-host eval can
    gather per-shape scalars across processes before reducing.
    """
    cats = np.asarray(category_list, np.int64)
    shape_ious = np.asarray(shape_ious, np.float64)
    ins_miou = float(shape_ious.mean()) if len(shape_ious) else 0.0
    cat_mious = [shape_ious[cats == c].mean()
                 for c in range(num_categories) if (cats == c).any()]
    cls_miou = float(np.mean(cat_mious)) if cat_mious else 0.0
    return ins_miou, cls_miou


def shapenetpart_miou(pred_list: List[np.ndarray],
                      label_list: List[np.ndarray],
                      category_list: Sequence[int],
                      num_parts: Sequence[int]):
    """Instance mIoU and class mIoU over per-shape predictions."""
    per_shape = np.array([
        shapenetpart_shape_iou(p, l, int(c), num_parts)
        for p, l, c in zip(pred_list, label_list, category_list)])
    return miou_from_shape_ious(per_shape, category_list, len(num_parts))


def partnet_miou(confusions_per_category: Sequence[np.ndarray]):
    """Mean over categories of per-category part mIoU (PartNet protocol).

    Each entry is that category's [P_c, P_c] confusion over its test set.
    """
    mious = []
    for conf in confusions_per_category:
        if np.asarray(conf).sum() == 0:
            continue
        _, miou, _ = iou_from_confusion(conf)
        mious.append(miou)
    return float(np.mean(mious)) if mious else 0.0
