"""Host-side (numpy) Morton sorting of stacked batches.

Spatially-sorted inputs are what make the fused Pallas kernels'
chunk-skipping pay off (ops/spatial.py); sorting is pure perf — model
outputs are permutation-equivariant and losses/metrics see consistently
permuted labels. Doing the sort on the HOST (numpy, in the data loader)
rather than on-device has two benefits:

* it removes an argsort + full-batch gather from every jitted step;
* it sidesteps a re-execution bug in the remote-TPU execution stack
  this project is driven through, where jitted programs containing the
  on-device sort at N > 2048 execute once and then fail with an opaque
  ``INVALID_ARGUMENT`` on every subsequent execution (see
  ``spatial_sort`` in utils/config.py; mode "host" is the default).

Mirrors ops/spatial.py::morton_keys exactly (same 10-bit quantization,
same sentinel for invalid points) in pure numpy.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

MORTON_BITS = 10
_SENTINEL = np.int32(2**30)

# batch keys that are per-cloud (not per-point) and must not be permuted
_NON_POINT_KEYS = ("label", "category", "batch_pad")


def _part1by2(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint32) & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_keys_np(xyz: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """[B, N] int32 Z-order keys; invalid points sort last."""
    x = xyz.astype(np.float32)
    m = mask[..., None]
    big = np.float32(1e10)
    mins = np.min(np.where(m, x, big), axis=-2, keepdims=True)
    maxs = np.max(np.where(m, x, -big), axis=-2, keepdims=True)
    scale = np.float32(2**MORTON_BITS - 1) / np.maximum(
        np.max(maxs - mins, axis=-1, keepdims=True), np.float32(1e-9))
    cells = np.clip((x - mins) * scale, 0, 2**MORTON_BITS - 1).astype(
        np.uint32)
    code = (_part1by2(cells[..., 0]) | (_part1by2(cells[..., 1]) << 1)
            | (_part1by2(cells[..., 2]) << 2)).astype(np.int32)
    return np.where(mask, code, _SENTINEL)


def kd_order_np(xyz: np.ndarray, mask: np.ndarray,
                leaf_size: int = 128) -> np.ndarray:
    """[B, N] int32 permutation: balanced KD-partition (spatial sort).

    Recursive median split along the widest axis until leaves hold
    <= leaf_size points; leaf (DFS) order is the output order. Unlike a
    raw Morton sort, every run of `leaf_size` consecutive output points
    occupies a COMPACT axis-aligned box (a Morton run that crosses a
    high-order curve boundary can span the whole cloud), which is what
    makes the Pallas kernels' tile/chunk bbox pruning effective.
    Invalid points go last (stable), like morton_keys_np's sentinel.
    """
    b, n = mask.shape
    perm = np.empty((b, n), np.int32)
    for bi in range(b):
        valid = np.flatnonzero(mask[bi]).astype(np.int32)
        invalid = np.flatnonzero(~mask[bi]).astype(np.int32)
        pts = xyz[bi].astype(np.float32)
        out, stack = [], [valid]
        while stack:
            idx = stack.pop()
            if idx.size <= leaf_size:
                out.append(idx)
                continue
            p = pts[idx]
            ax = int(np.argmax(p.max(0) - p.min(0)))
            half = idx.size // 2
            split = np.argpartition(p[:, ax], half)
            # right pushed first so DFS emits left-to-right
            stack.append(idx[split[half:]])
            stack.append(idx[split[:half]])
        out.append(invalid)
        perm[bi] = np.concatenate(out) if out else invalid
    return perm


def spatial_sort_batch(batch: Dict[str, np.ndarray],
                       method: str = "kd") -> Dict[str, np.ndarray]:
    """Sort every cloud spatially: 'kd' (compact leaves) or 'morton'."""
    xyz = batch["xyz"]
    mask = batch.get("mask")
    if mask is None:
        mask = np.ones(xyz.shape[:2], bool)
    if method == "kd":
        perm = kd_order_np(xyz, mask)
    else:
        keys = morton_keys_np(xyz, mask)
        perm = np.argsort(keys, axis=1, kind="stable")
    bidx = np.arange(xyz.shape[0])[:, None]
    n = xyz.shape[1]
    out = {}
    for k, v in batch.items():
        if (k not in _NON_POINT_KEYS and getattr(v, "ndim", 0) >= 2
                and v.shape[1] == n):
            out[k] = v[bidx, perm]
        else:
            out[k] = v
    return out


def morton_sort_batch(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Sort every cloud of a stacked batch along the Z-order curve.

    Permutes ALL per-point arrays (same leading [B, N]) consistently —
    xyz, mask, features, normals, rgb, per-point labels, point_idx — so
    downstream losses/metrics/vote-accumulation line up. Per-cloud keys
    (label, category, batch_pad) pass through. Invalid (masked) points
    move to the end of each cloud.
    """
    xyz = batch["xyz"]
    mask = batch.get("mask")
    if mask is None:
        mask = np.ones(xyz.shape[:2], bool)
    keys = morton_keys_np(xyz, mask)
    perm = np.argsort(keys, axis=1, kind="stable")
    bidx = np.arange(xyz.shape[0])[:, None]
    n = xyz.shape[1]
    out = {}
    for k, v in batch.items():
        if (k not in _NON_POINT_KEYS and getattr(v, "ndim", 0) >= 2
                and v.shape[1] == n):
            out[k] = v[bidx, perm]
        else:
            out[k] = v
    return out
