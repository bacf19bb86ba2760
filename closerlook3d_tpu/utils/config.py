"""Config system: reference-schema-compatible YAML experiment files.

The reference uses a yacs CfgNode of defaults merged with one YAML per
experiment under ``cfgs/{modelnet,shapenetpart,partnet,s3dis}/``
(SURVEY.md §2.1 "Config system" / §5 "Config / flag system"). We keep the
same flat key schema (epochs / base_learning_rate / local_aggregation_type
/ per-operator sub-trees / nsamples / npoints / width / depth /
bottleneck_ratio ...) on top of ``ml_collections.ConfigDict`` so reference
experiment YAMLs name the same experiments here.

NOTE on provenance: the reference mount was empty at survey time, so the
exact key names are reconstructed [L]; the schema below is the framework's
canonical one and is documented in configs/README.md.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Optional

import yaml
from ml_collections import ConfigDict


def default_config() -> ConfigDict:
    """Framework defaults. Mirrors the reference's yacs default tree."""
    c = ConfigDict()

    # ---- data ----------------------------------------------------------
    c.datasets = "modelnet40"  # modelnet40|shapenetpart|partnet|s3dis|synthetic
    c.data_root = "data"
    c.num_points = 1024
    c.num_classes = 40
    c.num_parts = []  # per-category part counts (part segmentation)
    c.input_features_dim = 3
    c.input_features = "xyz"  # ones|xyz|normals|rgb|height (comma combos)
    c.synthetic_noise = 0.01  # synthetic-cls difficulty (parity proxy)
    c.synthetic_label_noise = 0.0  # partseg annotation-noise rate (parity proxy)
    c.synthetic_train_size = 512  # synthetic split sizes (tiny multi-host
    c.synthetic_val_size = 128    # tests shrink these; data/build.py)
    c.batch_size = 32
    c.num_workers = 0
    c.task = "classification"  # classification|part_segmentation|scene_segmentation

    # S3DIS / scene-specific
    c.in_radius = 2.0  # training sphere radius (m)
    c.first_subsampling_dl = 0.04  # room grid-subsample cell (m)
    c.num_steps = 2000  # steps per pseudo-epoch (scene tasks)
    c.num_votes = 20  # eval vote rounds (sliding spheres)
    # test-time vote averaging for cls/partseg eval: when True, the
    # evaluators average softmax over num_votes augmented passes.
    # OFF by default — [U] unverified vs the reference mount (SURVEY.md
    # pins vote accumulation for S3DIS only).
    c.vote_eval = False
    c.s3dis_test_area = 5
    c.partnet_level = 3  # PartNet semantic level: 1 coarse | 2 | 3 fine

    # augmentation
    c.augment_rotation = "z"  # none|z|so3
    c.augment_scale_min = 0.8
    c.augment_scale_max = 1.2
    c.augment_symmetries = []  # e.g. [True, False, False] mirror axes
    c.augment_noise = 0.001
    c.augment_shift = 0.0
    c.color_drop = 0.2
    c.x_angle_range = 0.0
    c.y_angle_range = 0.0
    c.z_angle_range = 0.0

    # ---- backbone ------------------------------------------------------
    c.backbone = "resnet"
    c.width = 144
    c.depth = 2  # residual (non-strided) bottlenecks per stage
    c.bottleneck_ratio = 2
    c.radius = 0.05  # base ball-query radius, doubles per stage
    c.sampleDl = 0.02  # base grid cell for scene downsampling, doubles
    c.nsamples = [26, 31, 38, 41, 39]  # per-stage neighbor budget K
    c.npoints = []  # per-stage point counts; [] -> N/4 per stage
    c.sampling = "fps"  # fps|grid  (shape tasks: fps, scene tasks: grid)
    c.dropout_rate = 0.5
    c.cls_head_dims = [512, 256]  # classifier FC tower widths

    # ---- local aggregation ---------------------------------------------
    c.local_aggregation_type = "pospool"

    c.pospool = ConfigDict()
    c.pospool.position_embedding = "xyz"  # xyz|sin_cos
    c.pospool.reduction = "avg"  # max|avg|sum
    c.pospool.output_conv = False

    c.pointwisemlp = ConfigDict()
    c.pointwisemlp.feature_type = "dp_fi_df"  # dp|fi|dp_fi|dp_fi_df
    c.pointwisemlp.num_mlps = 1
    c.pointwisemlp.reduction = "max"

    c.pseudo_grid = ConfigDict()
    c.pseudo_grid.fixed_kernel_points = "center"
    c.pseudo_grid.KP_influence = "linear"  # linear|constant|gaussian
    c.pseudo_grid.KP_extent = 1.0
    c.pseudo_grid.num_kernel_points = 15
    c.pseudo_grid.convolution_mode = "sum"
    c.pseudo_grid.output_conv = False

    c.adaptive_weight = ConfigDict()
    c.adaptive_weight.local_input_feature = "dp"  # dp|dp_fi|dp_fi_df
    c.adaptive_weight.reduction = "avg"
    c.adaptive_weight.shared_channels = 1
    c.adaptive_weight.fc_num = 1
    c.adaptive_weight.weight_softmax = False
    c.adaptive_weight.output_conv = False

    # ---- training ------------------------------------------------------
    c.epochs = 600
    c.start_epoch = 1
    c.optimizer = "sgd"  # sgd|adamw
    c.base_learning_rate = 0.01
    c.lr_scheduler = "cosine"  # step|multistep|cosine
    c.warmup_epoch = 5
    c.lr_decay_steps = 20
    c.lr_decay_rate = 0.7
    c.lr_milestones = []
    c.weight_decay = 0.001
    c.momentum = 0.9
    c.grad_clip = 0.0  # 0 = off
    c.label_smoothing = 0.2
    c.batchnorm_momentum = 0.9

    # ---- runtime / TPU ---------------------------------------------------
    c.precision = "bf16"  # bf16|f32 activation/compute dtype
    c.use_pallas = "auto"  # auto|always|never — fused TPU kernels
    # host|auto|always|never — Morton-sort input clouds so the
    # chunk-skipping kernels see spatially coherent tiles (ops/spatial).
    # Pure perf; outputs stay in the caller's point order (device modes)
    # or in consistently-permuted order incl. labels (host mode).
    #   host   (default): the data loader sorts batches on CPU
    #     (data/spatial_host.py); the model does not sort on device.
    #     Preferred: saves an argsort+gather per step, and works around a
    #     remote-execution-stack bug where jitted programs containing the
    #     on-device sort at N > 2048 execute once then fail with
    #     INVALID_ARGUMENT on re-execution.
    #   auto: on-device sort inside the model for clouds > 2048 points.
    #   always/never: force/disable the on-device sort.
    c.spatial_sort = "host"
    c.donate_state = True
    c.data_parallel = -1  # -1: all devices on the data axis
    c.model_parallel = 1
    c.rng_seed = 0
    c.log_interval = 50
    c.profile_steps = 0  # >0: XPlane-trace this many steps early in run 1
    # host-precomputed geometry pipeline (the reference TF impl's
    # architecture): neighbor/sampling/upsample indices computed on CPU
    # in the data loader; device sees only dense gathers
    c.precompute_geometry = False
    c.val_interval = 1  # validate every K epochs
    c.save_interval = 10
    c.keep_checkpoints = 3

    return c


def _merge(dst: ConfigDict, src: Dict[str, Any], path: str = "") -> None:
    for k, v in src.items():
        if k not in dst:
            raise KeyError(f"unknown config key: {path}{k}")
        if isinstance(v, dict):
            _merge(dst[k], v, path=f"{path}{k}.")
        else:
            try:
                dst[k] = v
            except TypeError:
                # allow int->float style coercions from YAML
                dst[k] = type(dst[k])(v)


def load_config(
    path: Optional[str] = None,
    overrides: Optional[Dict[str, Any]] = None,
) -> ConfigDict:
    """Load defaults, merge a YAML experiment file, apply overrides.

    Override keys use dotted paths (``pospool.reduction=max``).
    """
    cfg = default_config()
    if path is not None:
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        _merge(cfg, data)
    if overrides:
        for key, value in overrides.items():
            node = cfg
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            if parts[-1] not in node:
                raise KeyError(f"unknown override key: {key}")
            node[parts[-1]] = value
    return cfg


def stage_plan(cfg: ConfigDict):
    """Derive the 5-stage (npoints, radii, nsamples, widths) plan.

    Paper constants (SURVEY.md §2.4): stage s has N/4^s points, width
    w*2^s channels, radius doubling per stage from the base radius.
    """
    nstage = len(cfg.nsamples)
    if list(cfg.npoints):
        npoints = list(cfg.npoints)
    else:
        npoints = [max(cfg.num_points // (4**s), 1) for s in range(nstage)]
    radii = [cfg.radius * (2**s) for s in range(nstage)]
    widths = [cfg.width * (2**s) for s in range(nstage)]
    cells = [cfg.sampleDl * (2**s) for s in range(nstage)]
    return {
        "npoints": npoints,
        "radii": radii,
        "nsamples": list(cfg.nsamples),
        "widths": widths,
        "cells": cells,
    }


def config_to_dict(cfg: ConfigDict) -> Dict[str, Any]:
    return copy.deepcopy(cfg.to_dict())
