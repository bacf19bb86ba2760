"""Host-side geometry precompute — the reference TF implementation's
input-pipeline architecture (SURVEY.md §3.4, tf_batch_neighbors /
tf_batch_subsampling lineage) as a config option.

With ``cfg.precompute_geometry: true`` every batch is augmented with the
full per-stage geometry (downsampled positions, neighbor / strided /
upsample indices) computed on the HOST CPU, and the accelerator sees
only dense gathers — no neighbor search or sampling runs on device.
The computation calls models/backbone.compute_geometry (the exact same
function the on-device path runs under jit) pinned to the CPU backend,
so the two pipelines cannot diverge.

Batch keys are flattened with a ``geom_`` prefix so they ride the normal
batch sharding; train/step.py reassembles the dict for the model.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np

GEOM_PREFIX = "geom_"


def precompute_batch_geometry(batch: Dict[str, np.ndarray], cfg
                              ) -> Dict[str, np.ndarray]:
    """Add geom_* keys (numpy, host CPU) to a stacked batch dict.

    The cloud is Morton-sorted first (every per-point array incl. labels
    is permuted consistently, so losses/metrics line up) — the model
    skips its own sort when geometry is supplied, and the fused kernels'
    chunk-skipping needs spatial order to pay off.
    """
    from closerlook3d_tpu.models.backbone import compute_geometry

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        xyz = jax.device_put(batch["xyz"], cpu)
        mask = jax.device_put(batch["mask"], cpu)
        if getattr(cfg, "spatial_sort", "auto") != "never":
            from closerlook3d_tpu.ops.spatial import morton_sort
            perm = np.asarray(morton_sort(xyz, mask)[0])
            n = batch["xyz"].shape[1]
            bidx = np.arange(perm.shape[0])[:, None]
            for k, v in list(batch.items()):
                if (k not in ("label", "category", "batch_pad")
                        and getattr(v, "ndim", 0) >= 2 and v.shape[1] == n):
                    batch[k] = v[bidx, perm]
            xyz = jax.device_put(batch["xyz"], cpu)
            mask = jax.device_put(batch["mask"], cpu)
        g = compute_geometry(cfg, xyz, mask,
                             need_up="segmentation" in cfg.task)
    for k, v in g.items():
        batch[GEOM_PREFIX + k] = np.asarray(v)
    return batch
