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
