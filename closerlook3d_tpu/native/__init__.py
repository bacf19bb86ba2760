"""CPU native ops (C++): grid subsampling and kd-tree.

Parity: the reference's cpp_wrappers (N7 cpp_subsampling, N8
nearest_neighbors/nanoflann; SURVEY.md §2.3). Built in place with
``python -m closerlook3d_tpu.native.build`` (or setup.py); every caller
has a numpy/scipy fallback, so the extension is an accelerator, not a
hard dependency.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    from closerlook3d_tpu.native import _cl3d_native as _ext

    HAVE_NATIVE = True
except ImportError:
    _ext = None
    HAVE_NATIVE = False


def _require():
    if _ext is None:
        raise ImportError(
            "native extension not built; run "
            "`python -m closerlook3d_tpu.native.build`")


def grid_subsample_cpu(points: np.ndarray, cell: float,
                       features: Optional[np.ndarray] = None,
                       labels: Optional[np.ndarray] = None):
    """Voxel barycenters; feature means; label majority votes.

    points [N,3] f32 -> (sub_points [M,3], sub_features [M,F]|None,
    sub_labels [M]|None).
    """
    _require()
    pts = np.ascontiguousarray(points, dtype=np.float32)
    f = (np.ascontiguousarray(features, dtype=np.float32)
         if features is not None else None)
    l = (np.ascontiguousarray(labels, dtype=np.int32)
         if labels is not None else None)
    pb, fb, lb, count = _ext.grid_subsample(pts, f, l, float(cell))
    sub_pts = np.frombuffer(pb, dtype=np.float32).reshape(count, 3).copy()
    sub_f = None
    if fb is not None:
        sub_f = np.frombuffer(fb, dtype=np.float32).reshape(
            count, features.shape[1]).copy()
    sub_l = None
    if lb is not None:
        sub_l = np.frombuffer(lb, dtype=np.int32).copy()
    return sub_pts, sub_f, sub_l


class KDTree:
    """3-D kd-tree: batched k-NN and radius queries (scipy-free)."""

    def __init__(self, points: np.ndarray):
        _require()
        self._n = len(points)
        self._tree = _ext.kdtree_build(
            np.ascontiguousarray(points, dtype=np.float32))

    def query(self, queries: np.ndarray, k: int = 1
              ) -> Tuple[np.ndarray, np.ndarray]:
        """(dists, idx) with scipy cKDTree's EXACT return convention:
        shape [M] when k == 1 (squeezed), [M, k] otherwise — callers
        index with the result, so the k=1 squeeze is load-bearing
        (a [M,1] index array silently broadcasts np.add.at indices)."""
        q = np.ascontiguousarray(np.atleast_2d(queries), dtype=np.float32)
        ib, db = _ext.kdtree_knn(self._tree, q, int(k))
        idx = np.frombuffer(ib, dtype=np.int32).reshape(len(q), k).copy()
        d2 = np.frombuffer(db, dtype=np.float32).reshape(len(q), k).copy()
        if k == 1:
            return np.sqrt(d2[:, 0]), idx[:, 0]
        return np.sqrt(d2), idx

    def query_ball_point(self, center: np.ndarray, r: float) -> np.ndarray:
        c = np.asarray(center, dtype=np.float32).reshape(3)
        ib = _ext.kdtree_radius(self._tree, float(c[0]), float(c[1]),
                                float(c[2]), float(r))
        return np.frombuffer(ib, dtype=np.int32).copy()
