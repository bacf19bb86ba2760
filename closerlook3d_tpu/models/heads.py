"""Task heads: classification, scene segmentation, multi-part segmentation.

Parity (SURVEY.md §2.1 heads; reference: pytorch/models/heads/*):
  * ClassifierResNet: masked global average pool over the final stage ->
    FC/dropout tower -> num_classes logits.
  * SceneSegHeadResNet: U-Net decoder — per stage masked nearest-neighbor
    upsample + lateral skip concat + 1x1 conv; final 1x1 -> classes.
  * MultiPartSegHeadResNet: same decoder + per-shape-category output
    branches. TPU-first twist: all category branches are computed as one
    fixed-shape [B, N, total_parts] logit tensor; the category selects a
    slice in the loss/metric (no data-dependent branching under jit).
"""

from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from closerlook3d_tpu.models.backbone import StageOutput
from closerlook3d_tpu.models.nn_utils import ConvBN, compute_dtype
from closerlook3d_tpu.ops.interpolate import nearest_upsample


def masked_global_avg_pool(features: jax.Array, mask: jax.Array) -> jax.Array:
    m = mask[..., None].astype(features.dtype)
    total = jnp.sum(features * m, axis=1)
    count = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return total / count


class ClassifierHead(nn.Module):
    num_classes: int
    config: Any

    @nn.compact
    def __call__(self, stages: List[StageOutput], train: bool = False,
                 rngs=None):
        cfg = self.config
        dt = compute_dtype(cfg)
        x = masked_global_avg_pool(stages[-1].features, stages[-1].mask)
        for width in cfg.cls_head_dims:
            x = ConvBN(width, cfg.batchnorm_momentum, dtype=dt)(x, train=train)
            x = nn.Dropout(cfg.dropout_rate, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          param_dtype=jnp.float32)(x.astype(jnp.float32))
        return logits


class _Decoder(nn.Module):
    """Shared U-Net decoder: coarse-to-fine nearest upsample + skip + 1x1."""

    config: Any

    @nn.compact
    def __call__(self, stages: List[StageOutput], train: bool = False):
        cfg = self.config
        dt = compute_dtype(cfg)
        x = stages[-1].features
        for s in range(len(stages) - 2, -1, -1):
            fine = stages[s]
            if fine.up_idx is not None:  # precomputed 1-NN (backbone geom)
                up = jnp.take_along_axis(x, fine.up_idx[..., None], axis=1)
            else:
                up = nearest_upsample(fine.xyz, stages[s + 1].xyz, x,
                                      support_mask=stages[s + 1].mask)
            x = jnp.concatenate([up, fine.features], axis=-1)
            x = ConvBN(fine.features.shape[-1], cfg.batchnorm_momentum,
                       dtype=dt)(x, train=train)
            x = x * fine.mask[..., None].astype(x.dtype)
        return x  # [B, N0, width]


class SceneSegHead(nn.Module):
    num_classes: int
    config: Any

    @nn.compact
    def __call__(self, stages: List[StageOutput], train: bool = False):
        cfg = self.config
        dt = compute_dtype(cfg)
        x = _Decoder(cfg)(stages, train=train)
        x = ConvBN(cfg.width, cfg.batchnorm_momentum, dtype=dt)(x, train=train)
        x = nn.Dropout(cfg.dropout_rate, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          param_dtype=jnp.float32)(x.astype(jnp.float32))
        return logits  # [B, N0, num_classes]


class MultiPartSegHead(nn.Module):
    """Per-point part logits over the union of all categories' parts.

    num_parts: per-category part counts, e.g. ShapeNetPart's 16 entries
    summing to 50. Output channel layout is the concatenation of the
    categories' part ranges; losses/metrics mask to the sample's slice.
    """

    num_parts: Sequence[int]
    config: Any

    @nn.compact
    def __call__(self, stages: List[StageOutput], train: bool = False):
        cfg = self.config
        dt = compute_dtype(cfg)
        total = int(sum(self.num_parts))
        x = _Decoder(cfg)(stages, train=train)
        x = ConvBN(cfg.width, cfg.batchnorm_momentum, dtype=dt)(x, train=train)
        x = nn.Dropout(cfg.dropout_rate, deterministic=not train)(x)
        logits = nn.Dense(total, dtype=jnp.float32,
                          param_dtype=jnp.float32)(x.astype(jnp.float32))
        return logits  # [B, N0, sum(num_parts)]
