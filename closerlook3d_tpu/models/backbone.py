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
from closerlook3d_tpu.ops.grouping import neighborhood_max
from closerlook3d_tpu.ops.neighbors import ball_query
from closerlook3d_tpu.ops.sampling import furthest_point_sample, grid_subsample
from closerlook3d_tpu.utils.config import stage_plan


class StageOutput(NamedTuple):
    xyz: jax.Array  # [B, N_s, 3]
    mask: jax.Array  # [B, N_s]
    features: jax.Array  # [B, N_s, C_s]
    # decoder: index of each stage-s point's nearest stage-(s+1) point
    # (None for the last stage / classification models)
    up_idx: Optional[jax.Array] = None  # [B, N_s] int32


def compute_geometry(cfg, xyz, mask, need_up: bool = False):
    """All irregular geometry of one forward pass, as a flat dict.

    Per stage: downsampled positions+masks, same-resolution neighbor
    indices, strided (coarse-into-fine) indices; optionally the decoder's
    1-NN upsample indices. This single function serves BOTH the on-device
    path (called inside the jitted forward) and the host-precompute
    pipeline (data/geometry, the reference TF implementation's
    architecture — SURVEY.md §3.4) so the two paths cannot diverge.

    Keys: xyz_s/mask_s [B,N_s(,3)], idx_s/nmask_s (same-res neighbors),
    sidx_s/smask_s (strided, s>=1), up_s (s<last, if need_up).
    """
    from closerlook3d_tpu.ops.neighbors import knn

    plan = stage_plan(cfg)
    npoints, radii = plan["npoints"], plan["radii"]
    nsamples, cells = plan["nsamples"], plan["cells"]
    nstage = len(nsamples)
    xyz = xyz.astype(jnp.float32)

    g = {"xyz_0": xyz, "mask_0": mask}
    idx, nmask = ball_query(
        xyz, xyz, radii[0], nsamples[0], query_mask=mask,
        support_mask=mask, chunk_size=_chunk_for(xyz.shape[1]))
    g["idx_0"], g["nmask_0"] = idx, nmask

    prev_xyz, prev_mask = xyz, mask
    for s in range(1, nstage):
        if cfg.sampling == "fps":
            fidx, smask_ = furthest_point_sample(prev_xyz, npoints[s],
                                                 prev_mask)
            new_xyz = jnp.take_along_axis(prev_xyz, fidx[..., None], axis=1)
            new_mask = smask_
        elif cfg.sampling == "grid":
            new_xyz, new_mask = grid_subsample(prev_xyz, cells[s],
                                               npoints[s], prev_mask)
        else:
            raise ValueError(cfg.sampling)
        sidx, smask = ball_query(
            new_xyz, prev_xyz, radii[s - 1] * 2.0, nsamples[s - 1],
            query_mask=new_mask, support_mask=prev_mask,
            chunk_size=_chunk_for(new_xyz.shape[1]))
        idx, nmask = ball_query(
            new_xyz, new_xyz, radii[s], nsamples[s], query_mask=new_mask,
            support_mask=new_mask, chunk_size=_chunk_for(new_xyz.shape[1]))
        g[f"xyz_{s}"], g[f"mask_{s}"] = new_xyz, new_mask
        g[f"sidx_{s}"], g[f"smask_{s}"] = sidx, smask
        g[f"idx_{s}"], g[f"nmask_{s}"] = idx, nmask
        prev_xyz, prev_mask = new_xyz, new_mask

    if need_up:
        for s in range(nstage - 1):
            up, _ = knn(g[f"xyz_{s}"], g[f"xyz_{s + 1}"], 1,
                        support_mask=g[f"mask_{s + 1}"])
            g[f"up_{s}"] = up[..., 0]
    return g


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
            shortcut = neighborhood_max(support_features, neighbor_idx,
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
    def __call__(self, xyz, mask, features, train: bool = False,
                 geometry=None) -> List[StageOutput]:
        """geometry: optional precomputed dict from compute_geometry —
        when provided (host-precompute pipeline, the reference TF
        architecture), no neighbor search / sampling runs on device and
        the accelerator sees only dense gathers (SURVEY.md §3.4)."""
        cfg = self.config
        dt = compute_dtype(cfg)
        plan = stage_plan(cfg)
        radii, nsamples, widths = \
            plan["radii"], plan["nsamples"], plan["widths"]
        nstage = len(nsamples)

        if geometry is None:
            geometry = compute_geometry(
                cfg, xyz, mask, need_up="segmentation" in cfg.task)
        g = geometry
        feats = features.astype(dt)

        outputs: List[StageOutput] = []

        # ---- stem at full resolution (stage 0) --------------------------
        xyz, mask = g["xyz_0"], g["mask_0"]
        idx, nmask = g["idx_0"], g["nmask_0"]
        feats = ConvBN(widths[0] // 2, cfg.batchnorm_momentum, dtype=dt)(
            feats, train=train)
        feats = LocalAggregation(widths[0] // 2, radii[0], cfg, dtype=dt)(
            xyz, xyz, feats, idx, nmask, train=train)
        feats = Bottleneck(widths[0], radii[0], cfg, dtype=dt)(
            xyz, mask, xyz, mask, feats, idx, nmask, train=train)
        outputs.append(StageOutput(xyz, mask, feats, g.get("up_0")))

        # ---- stages 1..S-1 ----------------------------------------------
        for s in range(1, nstage):
            new_xyz, new_mask = g[f"xyz_{s}"], g[f"mask_{s}"]
            # strided block: coarse queries into fine support, input-level
            # radius/budget (KPConv convention)
            feats = Bottleneck(widths[s], radii[s - 1] * 2.0, cfg,
                               strided=True, dtype=dt)(
                new_xyz, new_mask, xyz, mask, feats,
                g[f"sidx_{s}"], g[f"smask_{s}"], train=train)
            xyz, mask = new_xyz, new_mask

            idx, nmask = g[f"idx_{s}"], g[f"nmask_{s}"]
            for _ in range(cfg.depth):
                feats = Bottleneck(widths[s], radii[s], cfg, dtype=dt)(
                    xyz, mask, xyz, mask, feats, idx, nmask, train=train)
            outputs.append(StageOutput(xyz, mask, feats, g.get(f"up_{s}")))

        return outputs


def _chunk_for(nq: int) -> Optional[int]:
    """Chunk ball queries on big clouds to bound the [B,T,Ns] buffer."""
    if nq >= 4096 and nq % 512 == 0:
        return 512
    return None
