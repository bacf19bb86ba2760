"""Losses: label-smoothing CE, masked CE, multi-shape (per-category) CE.

Parity (SURVEY.md §2.1 "Losses"; reference: pytorch/models/losses.py::
LabelSmoothingCrossEntropyLoss / MaskedCrossEntropy / MultiShapeCrossEntropy).
All fixed-shape and jit-friendly; the multi-shape loss masks the logit
tensor to each sample's category slice instead of branching.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

_NEG = -1e9


def label_smoothing_cross_entropy(logits: jax.Array, labels: jax.Array,
                                  smoothing: float = 0.0) -> jax.Array:
    """Mean CE with label smoothing. logits [B, C], labels [B] int."""
    logits = logits.astype(jnp.float32)
    nclass = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, nclass, dtype=jnp.float32)
    if smoothing > 0.0:
        onehot = onehot * (1.0 - smoothing) + smoothing / nclass
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


def masked_cross_entropy(logits: jax.Array, labels: jax.Array,
                         mask: jax.Array, smoothing: float = 0.0,
                         ignore_label: int = -1) -> jax.Array:
    """Per-point CE averaged over valid points.

    logits [B, N, C]; labels [B, N] int; mask [B, N] bool. Points with
    ``labels == ignore_label`` are also excluded (S3DIS unannotated).
    """
    logits = logits.astype(jnp.float32)
    nclass = logits.shape[-1]
    valid = mask & (labels != ignore_label)
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(safe_labels, nclass, dtype=jnp.float32)
    if smoothing > 0.0:
        onehot = onehot * (1.0 - smoothing) + smoothing / nclass
    ce = -jnp.sum(onehot * logp, axis=-1)  # [B, N]
    w = valid.astype(jnp.float32)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)


def category_part_table(num_parts: Sequence[int]) -> np.ndarray:
    """[num_categories, 2] (start, count) into the concatenated part axis."""
    starts = np.concatenate([[0], np.cumsum(num_parts)[:-1]])
    return np.stack([starts, np.asarray(num_parts)], axis=1).astype(np.int32)


def category_slice_mask(shape_category: jax.Array,
                        num_parts: Sequence[int]) -> jax.Array:
    """[B, P_total] bool: which union-logit columns belong to each
    sample's category slice.

    The multi-shape loss softmaxes ONLY over this slice, so logits
    outside it receive no gradient and drift freely — every prediction
    consumer (metrics included) must restrict to the slice before
    argmax or scores degrade spuriously as training progresses.
    """
    table = jnp.asarray(category_part_table(num_parts))  # [Ncat, 2]
    start = table[shape_category, 0][:, None]  # [B, 1]
    count = table[shape_category, 1][:, None]
    part_ids = jnp.arange(int(np.sum(num_parts)), dtype=jnp.int32)[None, :]
    return (part_ids >= start) & (part_ids < start + count)


def multi_shape_cross_entropy(logits: jax.Array, point_labels: jax.Array,
                              shape_category: jax.Array, mask: jax.Array,
                              num_parts: Sequence[int],
                              smoothing: float = 0.0) -> jax.Array:
    """Per-category part CE (fixed-shape).

    logits [B, N, P_total] over the union part axis; point_labels [B, N]
    GLOBAL part ids (already offset by the category's start);
    shape_category [B] int. Softmax runs over the sample's category slice
    only — logits outside the slice are masked to -inf, which is exactly
    the reference's per-category softmax without dynamic branching.
    """
    logits = logits.astype(jnp.float32)
    b, n, ptotal = logits.shape
    table = jnp.asarray(category_part_table(num_parts))  # [Ncat, 2]
    count = table[shape_category, 1][:, None]  # [B, 1]
    in_slice = category_slice_mask(shape_category, num_parts)  # [B, P]
    masked_logits = jnp.where(in_slice[:, None, :], logits, _NEG)
    logp = jax.nn.log_softmax(masked_logits, axis=-1)
    onehot = jax.nn.one_hot(point_labels, ptotal, dtype=jnp.float32)
    if smoothing > 0.0:
        sl = in_slice[:, None, :].astype(jnp.float32)
        onehot = (onehot * (1.0 - smoothing)
                  + smoothing * sl / jnp.maximum(count[:, :, None], 1.0))
    ce = -jnp.sum(onehot * logp, axis=-1)  # [B, N]
    w = mask.astype(jnp.float32)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)
