"""5-stage residual point trunk (encoder).

Parity (SURVEY.md §2.1 "Residual backbone", paper §4 / App. A;
reference: pytorch/models/backbones/resnet.py::ResNet/Bottleneck):

  * stem: 1x1 conv to width/2 -> one LocalAggregation -> one bottleneck
    to width, at full resolution;
  * stages s=1..4: one strided bottleneck (x4 point downsampling,
    channels x2) + ``depth`` residual bottlenecks;
  * bottleneck = 1x1 reduce (width/bottleneck_ratio) -> LocalAggregation
    -> 1x1 expand + shortcut (masked-max-pooled over the neighborhood for
    strided blocks), ReLU after the residual add;
  * ball-query radius doubles per stage; neighbor budget from
    cfg.nsamples; downsampling via FPS (shape tasks) or grid barycenters
    (scene tasks).

Neighbor indices are computed ONCE per stage and reused by every block
of the stage (same as the reference's per-stage CUDA queries).
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from closerlook3d_tpu.models.aggregation import LocalAggregation
from closerlook3d_tpu.models.nn_utils import ConvBN, compute_dtype
from closerlook3d_tpu.ops.grouping import group_features, masked_max
from closerlook3d_tpu.ops.neighbors import ball_query
from closerlook3d_tpu.ops.sampling import furthest_point_sample, grid_subsample
from closerlook3d_tpu.utils.config import stage_plan


class StageOutput(NamedTuple):
    xyz: jax.Array  # [B, N_s, 3]
    mask: jax.Array  # [B, N_s]
    features: jax.Array  # [B, N_s, C_s]


class Bottleneck(nn.Module):
    """Residual bottleneck block around one LocalAggregation."""

    out_channels: int
    radius: float
    config: Any
    strided: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query_xyz, query_mask, support_xyz, support_mask,
                 support_features, neighbor_idx, neighbor_mask,
                 train: bool = False):
        cfg = self.config
        mid = self.out_channels // cfg.bottleneck_ratio
        x = ConvBN(mid, cfg.batchnorm_momentum, dtype=self.dtype)(
            support_features, train=train)
        x = LocalAggregation(mid, self.radius, cfg, dtype=self.dtype)(
            query_xyz, support_xyz, x, neighbor_idx, neighbor_mask,
            train=train)
        x = ConvBN(self.out_channels, cfg.batchnorm_momentum,
                   activation=None, dtype=self.dtype)(x, train=train)

        if self.strided:
            # pool support features to the query positions (masked max
            # over the strided neighborhood), like the reference shortcut
            shortcut = masked_max(
                group_features(support_features, neighbor_idx),
                neighbor_mask)
        else:
            shortcut = support_features
        if shortcut.shape[-1] != self.out_channels:
            shortcut = ConvBN(self.out_channels, cfg.batchnorm_momentum,
                              activation=None, dtype=self.dtype)(
                                  shortcut, train=train)
        out = nn.relu(x + shortcut)
        return out * query_mask[..., None].astype(out.dtype)


class ResNetBackbone(nn.Module):
    """Encoder: returns per-stage (xyz, mask, features) for heads/decoders."""

    config: Any

    @nn.compact
    def __call__(self, xyz, mask, features, train: bool = False
                 ) -> List[StageOutput]:
        cfg = self.config
        dt = compute_dtype(cfg)
        plan = stage_plan(cfg)
        npoints, radii = plan["npoints"], plan["radii"]
        nsamples, widths, cells = plan["nsamples"], plan["widths"], plan["cells"]
        nstage = len(nsamples)

        xyz = xyz.astype(jnp.float32)
        feats = features.astype(dt)

        outputs: List[StageOutput] = []

        # ---- stem at full resolution (stage 0) --------------------------
        idx, nmask = ball_query(
            xyz, xyz, radii[0], nsamples[0],
            query_mask=mask, support_mask=mask,
            chunk_size=_chunk_for(xyz.shape[1]))
        feats = ConvBN(widths[0] // 2, cfg.batchnorm_momentum, dtype=dt)(
            feats, train=train)
        feats = LocalAggregation(widths[0] // 2, radii[0], cfg, dtype=dt)(
            xyz, xyz, feats, idx, nmask, train=train)
        feats = Bottleneck(widths[0], radii[0], cfg, dtype=dt)(
            xyz, mask, xyz, mask, feats, idx, nmask, train=train)
        outputs.append(StageOutput(xyz, mask, feats))

        # ---- stages 1..S-1 ----------------------------------------------
        for s in range(1, nstage):
            new_xyz, new_mask = self._downsample(
                xyz, mask, npoints[s], cells[s])
            # strided query: coarse queries into fine support, input-level
            # radius/budget (KPConv convention)
            sidx, smask = ball_query(
                new_xyz, xyz, radii[s - 1] * 2.0, nsamples[s - 1],
                query_mask=new_mask, support_mask=mask,
                chunk_size=_chunk_for(new_xyz.shape[1]))
            feats = Bottleneck(widths[s], radii[s - 1] * 2.0, cfg,
                               strided=True, dtype=dt)(
                new_xyz, new_mask, xyz, mask, feats, sidx, smask,
                train=train)
            xyz, mask = new_xyz, new_mask

            idx, nmask = ball_query(
                xyz, xyz, radii[s], nsamples[s],
                query_mask=mask, support_mask=mask,
                chunk_size=_chunk_for(xyz.shape[1]))
            for _ in range(cfg.depth):
                feats = Bottleneck(widths[s], radii[s], cfg, dtype=dt)(
                    xyz, mask, xyz, mask, feats, idx, nmask, train=train)
            outputs.append(StageOutput(xyz, mask, feats))

        return outputs

    def _downsample(self, xyz, mask, npoint, cell):
        if self.config.sampling == "fps":
            idx, smask = furthest_point_sample(xyz, npoint, mask)
            new_xyz = jnp.take_along_axis(xyz, idx[..., None], axis=1)
            return new_xyz, smask
        elif self.config.sampling == "grid":
            return grid_subsample(xyz, cell, npoint, mask)
        raise ValueError(self.config.sampling)


def _chunk_for(nq: int) -> Optional[int]:
    """Chunk ball queries on big clouds to bound the [B,T,Ns] buffer."""
    if nq >= 4096 and nq % 512 == 0:
        return 512
    return None
