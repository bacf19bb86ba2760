"""Ahead-of-time export of the inference forward for serving.

The reference has no serving story (research checkpoints only); a
production deployment needs the model OUT of its Python training
harness. ``export_forward`` serializes the jitted eval-mode forward
pass through ``jax.export`` (StableHLO portable artifact, pinned to
the platform it was exported for) together with the trained weights,
and ``load_forward`` restores a self-contained predictor that needs
only jax + the artifact directory — none of this package's model code.

Artifact layout (a directory):
    forward.bin   jax.export serialized function (versioned StableHLO)
    weights.npz   flattened params + batch_stats ('/'-joined dict keys)
    meta.json     shapes/dtypes, platform, jax version, config summary

Exports are shape-static by design — the whole framework runs on fixed
padded shapes (SURVEY.md §7 design stance), so a serving binary
compiled for [B, N] serves any smaller cloud via the mask.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


_FWD = "forward.bin"
_WTS = "weights.npz"
_META = "meta.json"


def _flatten(tree, prefix: str) -> Dict[str, np.ndarray]:
    """Nested-dict pytree -> {'prefix/a/b': array} (flax params are
    plain nested dicts)."""
    out = {}

    def rec(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, f"{path}/{k}")
        else:
            out[path] = np.asarray(node)

    rec(tree, prefix)
    return out


def _unflatten(flat: Dict[str, np.ndarray], prefix: str):
    tree: Dict = {}
    pl = prefix + "/"
    for key, val in flat.items():
        if not key.startswith(pl):
            continue
        node = tree
        parts = key[len(pl):].split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(val)
    return tree


def export_forward(cfg, state, out_dir: str) -> str:
    """Export the eval-mode forward of ``state``'s model to ``out_dir``.

    cfg/state as produced by build_model/create_train_state (the same
    objects cli.evaluate restores). Returns out_dir.
    """
    from closerlook3d_tpu.data.loader import feature_dim
    from closerlook3d_tpu.models import build_model

    model, _ = build_model(cfg)

    def forward(params, batch_stats, xyz, mask, features):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           xyz, mask, features, train=False)

    b = int(cfg.batch_size)
    n = int(cfg.num_points)
    d = feature_dim(cfg.input_features)
    arg_shapes = (
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                     state.params),
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                     state.batch_stats),
        jax.ShapeDtypeStruct((b, n, 3), jnp.float32),
        jax.ShapeDtypeStruct((b, n), jnp.bool_),
        jax.ShapeDtypeStruct((b, n, d), jnp.float32),
    )
    exported = jax.export.export(jax.jit(forward))(*arg_shapes)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _FWD), "wb") as f:
        f.write(exported.serialize())
    flat = {}
    flat.update(_flatten(jax.tree.map(np.asarray, state.params), "params"))
    flat.update(_flatten(jax.tree.map(np.asarray, state.batch_stats),
                         "batch_stats"))
    np.savez(os.path.join(out_dir, _WTS), **flat)
    meta = {
        "batch_size": b,
        "num_points": n,
        "feature_dim": d,
        "num_outputs": int(getattr(cfg, "num_classes", 0)),
        "task": str(cfg.task),
        "local_aggregation_type": str(cfg.local_aggregation_type),
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


class Predictor:
    """Loaded serving artifact: ``predictor(xyz, mask, features)``."""

    def __init__(self, exported, params, batch_stats, meta):
        self.meta = meta
        self._call = jax.jit(exported.call)
        self._params = params
        self._batch_stats = batch_stats

    def __call__(self, xyz, mask, features):
        return self._call(self._params, self._batch_stats,
                          jnp.asarray(xyz, jnp.float32),
                          jnp.asarray(mask, bool),
                          jnp.asarray(features, jnp.float32))


def load_forward(out_dir: str) -> Tuple[Predictor, dict]:
    """Restore (predictor, meta) from an export_forward directory."""
    with open(os.path.join(out_dir, _FWD), "rb") as f:
        exported = jax.export.deserialize(bytearray(f.read()))
    with np.load(os.path.join(out_dir, _WTS)) as z:
        flat = {k: z[k] for k in z.files}
    params = _unflatten(flat, "params")
    batch_stats = _unflatten(flat, "batch_stats")
    with open(os.path.join(out_dir, _META)) as f:
        meta = json.load(f)
    return Predictor(exported, params, batch_stats, meta), meta
