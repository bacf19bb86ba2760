"""Model factories mapping config -> (flax module, loss_fn).

Parity: reference build_classification / build_multi_part_segmentation /
build_scene_segmentation returning (model, criterion) (SURVEY.md §2.1).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Tuple

import flax.linen as nn

from closerlook3d_tpu.models.backbone import ResNetBackbone
from closerlook3d_tpu.models.heads import (
    ClassifierHead,
    MultiPartSegHead,
    SceneSegHead,
)
from closerlook3d_tpu.models.losses import (
    label_smoothing_cross_entropy,
    masked_cross_entropy,
    multi_shape_cross_entropy,
)


def _maybe_sort(cfg, xyz, mask, features):
    """Morton-sort the input cloud for kernel tile locality (pure perf;
    see ops/spatial). Returns possibly-permuted inputs + the inverse
    permutation for restoring per-point outputs (None = unsorted).

    Mode "host" (default) means the data pipeline already sorted the
    batch on CPU (data/spatial_host.py) — no device sort here."""
    mode = getattr(cfg, "spatial_sort", "host")
    if mode in ("never", "host") or (mode == "auto"
                                     and xyz.shape[1] <= 2048):
        return xyz, mask, features, None
    from closerlook3d_tpu.ops.spatial import apply_permutation, morton_sort
    perm, inv = morton_sort(xyz, mask)
    return (apply_permutation(xyz, perm), apply_permutation(mask, perm),
            apply_permutation(features, perm), inv)


class ClassificationModel(nn.Module):
    config: Any

    @nn.compact
    def __call__(self, xyz, mask, features, train: bool = False,
                 geometry=None):
        # global pooled head: no inverse permutation needed. Precomputed
        # geometry binds indices to the caller's point order -> no sort.
        if geometry is None:
            xyz, mask, features, _ = _maybe_sort(
                self.config, xyz, mask, features)
        stages = ResNetBackbone(self.config)(xyz, mask, features,
                                             train=train, geometry=geometry)
        return ClassifierHead(self.config.num_classes, self.config)(
            stages, train=train)


class SceneSegModel(nn.Module):
    config: Any

    @nn.compact
    def __call__(self, xyz, mask, features, train: bool = False,
                 geometry=None):
        inv = None
        if geometry is None:
            xyz, mask, features, inv = _maybe_sort(
                self.config, xyz, mask, features)
        stages = ResNetBackbone(self.config)(xyz, mask, features,
                                             train=train, geometry=geometry)
        logits = SceneSegHead(self.config.num_classes, self.config)(
            stages, train=train)
        if inv is not None:
            from closerlook3d_tpu.ops.spatial import apply_permutation
            logits = apply_permutation(logits, inv)
        return logits


class MultiPartSegModel(nn.Module):
    config: Any

    @nn.compact
    def __call__(self, xyz, mask, features, train: bool = False,
                 geometry=None):
        inv = None
        if geometry is None:
            xyz, mask, features, inv = _maybe_sort(
                self.config, xyz, mask, features)
        stages = ResNetBackbone(self.config)(xyz, mask, features,
                                             train=train, geometry=geometry)
        logits = MultiPartSegHead(tuple(self.config.num_parts), self.config)(
            stages, train=train)
        if inv is not None:
            from closerlook3d_tpu.ops.spatial import apply_permutation
            logits = apply_permutation(logits, inv)
        return logits


def build_classification(cfg) -> Tuple[nn.Module, Callable]:
    model = ClassificationModel(cfg)
    loss_fn = functools.partial(
        label_smoothing_cross_entropy, smoothing=cfg.label_smoothing)
    return model, loss_fn


def build_scene_segmentation(cfg) -> Tuple[nn.Module, Callable]:
    model = SceneSegModel(cfg)
    loss_fn = functools.partial(
        masked_cross_entropy, smoothing=cfg.label_smoothing)
    return model, loss_fn


def build_multi_part_segmentation(cfg) -> Tuple[nn.Module, Callable]:
    model = MultiPartSegModel(cfg)
    loss_fn = functools.partial(
        multi_shape_cross_entropy, num_parts=tuple(cfg.num_parts),
        smoothing=cfg.label_smoothing)
    return model, loss_fn


_BUILDERS = {
    "classification": build_classification,
    "scene_segmentation": build_scene_segmentation,
    "part_segmentation": build_multi_part_segmentation,
}


def build_model(cfg) -> Tuple[nn.Module, Callable]:
    """Dispatch on cfg.task."""
    try:
        return _BUILDERS[cfg.task](cfg)
    except KeyError:
        raise ValueError(f"unknown task: {cfg.task}") from None
