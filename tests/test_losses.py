"""Loss tests vs numpy references."""

import numpy as np
import jax.numpy as jnp
from scipy.special import log_softmax

from closerlook3d_tpu.models.losses import (
    label_smoothing_cross_entropy,
    masked_cross_entropy,
    multi_shape_cross_entropy,
)


def test_label_smoothing_ce_matches_numpy(rng):
    logits = rng.normal(size=(4, 10)).astype(np.float32)
    labels = rng.integers(0, 10, size=(4,))
    for eps in (0.0, 0.2):
        got = float(label_smoothing_cross_entropy(
            jnp.array(logits), jnp.array(labels), smoothing=eps))
        lp = log_softmax(logits, axis=-1)
        oh = np.eye(10)[labels] * (1 - eps) + eps / 10
        ref = -np.mean((oh * lp).sum(-1))
        np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_masked_ce_ignores_padding_and_ignore_label(rng):
    logits = rng.normal(size=(2, 6, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=(2, 6))
    mask = np.ones((2, 6), bool)
    mask[0, 4:] = False
    labels[1, 0] = -1  # ignore
    got = float(masked_cross_entropy(
        jnp.array(logits), jnp.array(labels), jnp.array(mask)))
    lp = log_softmax(logits, axis=-1)
    ces, ws = [], 0
    for b in range(2):
        for n in range(6):
            if mask[b, n] and labels[b, n] != -1:
                ces.append(-lp[b, n, labels[b, n]])
                ws += 1
    np.testing.assert_allclose(got, np.sum(ces) / ws, rtol=1e-5)

    # garbage logits in masked slots must not change the loss
    logits2 = logits.copy()
    logits2[0, 4:] = 1e5
    got2 = float(masked_cross_entropy(
        jnp.array(logits2), jnp.array(labels), jnp.array(mask)))
    np.testing.assert_allclose(got, got2, rtol=1e-6)


def test_multi_shape_ce_is_per_category_softmax(rng):
    num_parts = [2, 3, 4]  # 3 categories, 9 total parts
    logits = rng.normal(size=(2, 5, 9)).astype(np.float32)
    cat = np.array([1, 2])
    starts = [0, 2, 5]
    labels = np.stack([
        rng.integers(starts[1], starts[1] + 3, size=5),
        rng.integers(starts[2], starts[2] + 4, size=5),
    ])
    mask = np.ones((2, 5), bool)
    got = float(multi_shape_cross_entropy(
        jnp.array(logits), jnp.array(labels), jnp.array(cat),
        jnp.array(mask), num_parts))
    ces = []
    for b in range(2):
        s, c = starts[cat[b]], num_parts[cat[b]]
        lp = log_softmax(logits[b, :, s:s + c], axis=-1)
        for n in range(5):
            ces.append(-lp[n, labels[b, n] - s])
    np.testing.assert_allclose(got, np.mean(ces), rtol=1e-4)


def test_task_metrics_partseg_slice_restricted():
    """Out-of-slice logit columns get no gradient from the multi-shape
    loss, so metrics must ignore them: huge garbage values outside the
    sample's category slice must not change the accuracy."""
    import jax.numpy as jnp
    import numpy as np
    from closerlook3d_tpu.train.step import task_metrics

    num_parts = (2, 3)
    b, n = 2, 8
    labels = np.array([[0, 1] * 4, [2 + 0, 2 + 2] * 4], np.int32)
    cats = np.array([0, 1], np.int32)
    logits = np.full((b, n, 5), -5.0, np.float32)
    for bi in range(b):
        for ni in range(n):
            logits[bi, ni, labels[bi, ni]] = 5.0
    # poison the OTHER category's columns with dominant values
    logits[0, :, 2:] = 100.0
    logits[1, :, :2] = 100.0
    batch = {"labels": jnp.asarray(labels), "mask": jnp.ones((b, n), bool),
             "category": jnp.asarray(cats)}
    with_fix = task_metrics("part_segmentation", jnp.asarray(logits),
                            batch, num_parts)
    assert float(with_fix["acc"]) == 1.0
    # without num_parts the poison wins — documents why the fix matters
    without = task_metrics("part_segmentation", jnp.asarray(logits), batch)
    assert float(without["acc"]) == 0.0
