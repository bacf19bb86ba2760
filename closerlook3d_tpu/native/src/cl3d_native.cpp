// CPU-side native ops for the data pipeline.
//
// Parity targets (SURVEY.md §2.3):
//   N7 grid_subsample — voxel-grid barycenter subsampling (the
//      reference's cpp_wrappers/cpp_subsampling, KPConv lineage):
//      feature averages + label majority votes per voxel.
//   N8 KDTree — 3-D kd-tree with k-NN and radius queries (the
//      reference's cpp_wrappers/nearest_neighbors, nanoflann): used for
//      S3DIS sphere extraction and eval-time sub->full cloud projection.
//
// Own implementation (median-split kd-tree, open-addressing voxel hash);
// exposed through the raw CPython C API (no pybind11 in this image).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// ---------------------------------------------------------------------
// minimal buffer helpers (operate on contiguous float32/int32 buffers)
// ---------------------------------------------------------------------

struct F32Buf {
  Py_buffer view{};
  const float* data = nullptr;
  Py_ssize_t rows = 0, cols = 0;
  bool ok = false;
};

bool get_f32_2d(PyObject* obj, F32Buf* out, const char* name) {
  if (PyObject_GetBuffer(obj, &out->view,
                         PyBUF_C_CONTIGUOUS | PyBUF_FORMAT) != 0) {
    return false;
  }
  if (out->view.ndim != 2 || !out->view.format ||
      out->view.format[0] != 'f') {
    PyErr_Format(PyExc_TypeError, "%s must be a C-contiguous float32 2-D "
                 "array", name);
    PyBuffer_Release(&out->view);
    return false;
  }
  out->data = static_cast<const float*>(out->view.buf);
  out->rows = out->view.shape[0];
  out->cols = out->view.shape[1];
  out->ok = true;
  return true;
}

struct I32Buf {
  Py_buffer view{};
  const int32_t* data = nullptr;
  Py_ssize_t n = 0;
  bool ok = false;
};

bool get_i32_1d(PyObject* obj, I32Buf* out, const char* name) {
  if (PyObject_GetBuffer(obj, &out->view,
                         PyBUF_C_CONTIGUOUS | PyBUF_FORMAT) != 0) {
    return false;
  }
  if (out->view.ndim != 1 || !out->view.format ||
      (out->view.format[0] != 'i' && out->view.format[0] != 'l')) {
    PyErr_Format(PyExc_TypeError, "%s must be a C-contiguous int32 1-D "
                 "array", name);
    PyBuffer_Release(&out->view);
    return false;
  }
  if (out->view.itemsize != 4) {
    PyErr_Format(PyExc_TypeError, "%s must be int32", name);
    PyBuffer_Release(&out->view);
    return false;
  }
  out->data = static_cast<const int32_t*>(out->view.buf);
  out->n = out->view.shape[0];
  out->ok = true;
  return true;
}

PyObject* make_bytes_f32(const std::vector<float>& v) {
  return PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(v.data()),
      static_cast<Py_ssize_t>(v.size() * sizeof(float)));
}

PyObject* make_bytes_i32(const std::vector<int32_t>& v) {
  return PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(v.data()),
      static_cast<Py_ssize_t>(v.size() * sizeof(int32_t)));
}

// ---------------------------------------------------------------------
// N7: grid subsampling
// ---------------------------------------------------------------------

// grid_subsample(points_bytes..., cell) ->
//   (sub_points bytes, sub_feats bytes|None, sub_labels bytes|None, count)
PyObject* grid_subsample(PyObject*, PyObject* args) {
  PyObject *pts_obj, *feat_obj, *lab_obj;
  double cell;
  if (!PyArg_ParseTuple(args, "OOOd", &pts_obj, &feat_obj, &lab_obj,
                        &cell)) {
    return nullptr;
  }
  F32Buf pts;
  if (!get_f32_2d(pts_obj, &pts, "points")) return nullptr;
  if (pts.cols != 3) {
    PyBuffer_Release(&pts.view);
    PyErr_SetString(PyExc_ValueError, "points must be [N, 3]");
    return nullptr;
  }
  F32Buf feats;
  bool has_feats = feat_obj != Py_None;
  if (has_feats && !get_f32_2d(feat_obj, &feats, "features")) {
    PyBuffer_Release(&pts.view);
    return nullptr;
  }
  I32Buf labels;
  bool has_labels = lab_obj != Py_None;
  if (has_labels && !get_i32_1d(lab_obj, &labels, "labels")) {
    PyBuffer_Release(&pts.view);
    if (has_feats) PyBuffer_Release(&feats.view);
    return nullptr;
  }

  const Py_ssize_t n = pts.rows;
  const Py_ssize_t fc = has_feats ? feats.cols : 0;
  int32_t nlab = 0;
  if (has_labels) {
    for (Py_ssize_t i = 0; i < n; ++i) {
      nlab = std::max(nlab, labels.data[i] + 1);
    }
  }

  float minx = 1e30f, miny = 1e30f, minz = 1e30f;
  for (Py_ssize_t i = 0; i < n; ++i) {
    minx = std::min(minx, pts.data[i * 3 + 0]);
    miny = std::min(miny, pts.data[i * 3 + 1]);
    minz = std::min(minz, pts.data[i * 3 + 2]);
  }

  struct CellData {
    int32_t index;
    int32_t count;
  };
  std::unordered_map<uint64_t, CellData> cells;
  cells.reserve(static_cast<size_t>(n) / 2 + 16);

  std::vector<float> sum_pts;
  std::vector<float> sum_feats;
  std::vector<int32_t> votes;  // [ncell, nlab] lazily grown

  const double inv = 1.0 / cell;
  int32_t ncell = 0;
  for (Py_ssize_t i = 0; i < n; ++i) {
    const uint64_t cx = static_cast<uint64_t>(
        (pts.data[i * 3 + 0] - minx) * inv);
    const uint64_t cy = static_cast<uint64_t>(
        (pts.data[i * 3 + 1] - miny) * inv);
    const uint64_t cz = static_cast<uint64_t>(
        (pts.data[i * 3 + 2] - minz) * inv);
    const uint64_t key = (cz << 42) | (cy << 21) | cx;  // 2^21 cells/axis
    auto it = cells.find(key);
    int32_t ci;
    if (it == cells.end()) {
      ci = ncell++;
      cells.emplace(key, CellData{ci, 1});
      sum_pts.resize(static_cast<size_t>(ncell) * 3, 0.f);
      if (has_feats) {
        sum_feats.resize(static_cast<size_t>(ncell) * fc, 0.f);
      }
      if (has_labels) {
        votes.resize(static_cast<size_t>(ncell) * nlab, 0);
      }
    } else {
      ci = it->second.index;
      it->second.count += 1;
    }
    for (int d = 0; d < 3; ++d) {
      sum_pts[static_cast<size_t>(ci) * 3 + d] += pts.data[i * 3 + d];
    }
    if (has_feats) {
      for (Py_ssize_t d = 0; d < fc; ++d) {
        sum_feats[static_cast<size_t>(ci) * fc + d] +=
            feats.data[i * fc + d];
      }
    }
    if (has_labels) {
      votes[static_cast<size_t>(ci) * nlab + labels.data[i]] += 1;
    }
  }

  std::vector<int32_t> counts(ncell, 0);
  for (const auto& kv : cells) counts[kv.second.index] = kv.second.count;

  for (int32_t c = 0; c < ncell; ++c) {
    const float invc = 1.0f / static_cast<float>(counts[c]);
    for (int d = 0; d < 3; ++d) sum_pts[static_cast<size_t>(c) * 3 + d] *= invc;
    if (has_feats) {
      for (Py_ssize_t d = 0; d < fc; ++d) {
        sum_feats[static_cast<size_t>(c) * fc + d] *= invc;
      }
    }
  }
  std::vector<int32_t> out_labels;
  if (has_labels) {
    out_labels.resize(ncell);
    for (int32_t c = 0; c < ncell; ++c) {
      int32_t best = 0, bestv = -1;
      for (int32_t l = 0; l < nlab; ++l) {
        const int32_t v = votes[static_cast<size_t>(c) * nlab + l];
        if (v > bestv) { bestv = v; best = l; }
      }
      out_labels[c] = best;
    }
  }

  PyBuffer_Release(&pts.view);
  if (has_feats) PyBuffer_Release(&feats.view);
  if (has_labels) PyBuffer_Release(&labels.view);

  PyObject* py_pts = make_bytes_f32(sum_pts);
  PyObject* py_feats = has_feats ? make_bytes_f32(sum_feats) : Py_None;
  if (!has_feats) Py_INCREF(Py_None);
  PyObject* py_labs = has_labels ? make_bytes_i32(out_labels) : Py_None;
  if (!has_labels) Py_INCREF(Py_None);
  PyObject* out = Py_BuildValue("(NNNi)", py_pts, py_feats, py_labs,
                                ncell);
  return out;
}

// ---------------------------------------------------------------------
// N8: kd-tree
// ---------------------------------------------------------------------

struct KDTree {
  std::vector<float> pts;     // [n, 3]
  std::vector<int32_t> perm;  // kd order -> original index
  std::vector<int32_t> split_dim;
  Py_ssize_t n = 0;

  void build(const float* data, Py_ssize_t count) {
    n = count;
    pts.resize(static_cast<size_t>(n) * 3);
    perm.resize(n);
    split_dim.assign(n, 0);
    std::vector<int32_t> order(n);
    for (Py_ssize_t i = 0; i < n; ++i) order[i] = static_cast<int32_t>(i);
    std::vector<int32_t> tmp(n);
    build_rec(data, order.data(), 0, static_cast<int32_t>(n), 0);
    // store reordered points for cache-friendly traversal
    for (Py_ssize_t i = 0; i < n; ++i) {
      const int32_t src = perm[i];
      for (int d = 0; d < 3; ++d) pts[i * 3 + d] = data[src * 3 + d];
    }
  }

  // recursive median split over [lo, hi) of scratch index array; node at
  // the median position (heap-free: the tree is implicit in the sorted
  // permutation: node = midpoint, children = halves)
  std::vector<int32_t> scratch;
  void build_rec(const float* data, int32_t* order, int32_t lo, int32_t hi,
                 int depth) {
    if (lo >= hi) return;
    // pick widest dimension of the local bounding box
    float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
    for (int32_t i = lo; i < hi; ++i) {
      for (int d = 0; d < 3; ++d) {
        const float v = data[order[i] * 3 + d];
        mn[d] = std::min(mn[d], v);
        mx[d] = std::max(mx[d], v);
      }
    }
    int dim = 0;
    float best = -1.f;
    for (int d = 0; d < 3; ++d) {
      if (mx[d] - mn[d] > best) { best = mx[d] - mn[d]; dim = d; }
    }
    const int32_t mid = lo + (hi - lo) / 2;
    std::nth_element(order + lo, order + mid, order + hi,
                     [&](int32_t a, int32_t b) {
                       return data[a * 3 + dim] < data[b * 3 + dim];
                     });
    perm[mid] = order[mid];
    split_dim[mid] = dim;
    build_rec(data, order, lo, mid, depth + 1);
    build_rec(data, order, mid + 1, hi, depth + 1);
  }

  // k nearest neighbors (returns original indices + squared distances)
  void knn(const float* q, int k, int32_t* out_idx, float* out_d2) const {
    // bounded max-heap over (d2, idx)
    std::vector<std::pair<float, int32_t>> heap;
    heap.reserve(k);
    knn_rec(q, 0, static_cast<int32_t>(n), k, heap);
    std::sort_heap(heap.begin(), heap.end());
    const int found = static_cast<int>(heap.size());
    for (int i = 0; i < k; ++i) {
      if (i < found) {
        out_idx[i] = heap[i].second;
        out_d2[i] = heap[i].first;
      } else {
        out_idx[i] = found ? heap[found - 1].second : 0;
        out_d2[i] = 1e30f;
      }
    }
  }

  void knn_rec(const float* q, int32_t lo, int32_t hi, int k,
               std::vector<std::pair<float, int32_t>>& heap) const {
    if (lo >= hi) return;
    const int32_t mid = lo + (hi - lo) / 2;
    const float* p = &pts[static_cast<size_t>(mid) * 3];
    const float dx = q[0] - p[0], dy = q[1] - p[1], dz = q[2] - p[2];
    const float d2 = dx * dx + dy * dy + dz * dz;
    if (static_cast<int>(heap.size()) < k) {
      heap.emplace_back(d2, perm[mid]);
      std::push_heap(heap.begin(), heap.end());
    } else if (d2 < heap.front().first) {
      std::pop_heap(heap.begin(), heap.end());
      heap.back() = {d2, perm[mid]};
      std::push_heap(heap.begin(), heap.end());
    }
    const int dim = split_dim[mid];
    const float delta = q[dim] - p[dim];
    const int32_t near_lo = delta < 0 ? lo : mid + 1;
    const int32_t near_hi = delta < 0 ? mid : hi;
    const int32_t far_lo = delta < 0 ? mid + 1 : lo;
    const int32_t far_hi = delta < 0 ? hi : mid;
    knn_rec(q, near_lo, near_hi, k, heap);
    if (static_cast<int>(heap.size()) < k ||
        delta * delta < heap.front().first) {
      knn_rec(q, far_lo, far_hi, k, heap);
    }
  }

  // all points within radius (original indices, unsorted)
  void radius(const float* q, float r2, std::vector<int32_t>* out) const {
    radius_rec(q, 0, static_cast<int32_t>(n), r2, out);
  }

  void radius_rec(const float* q, int32_t lo, int32_t hi, float r2,
                  std::vector<int32_t>* out) const {
    if (lo >= hi) return;
    const int32_t mid = lo + (hi - lo) / 2;
    const float* p = &pts[static_cast<size_t>(mid) * 3];
    const float dx = q[0] - p[0], dy = q[1] - p[1], dz = q[2] - p[2];
    const float d2 = dx * dx + dy * dy + dz * dz;
    if (d2 <= r2) out->push_back(perm[mid]);
    const int dim = split_dim[mid];
    const float delta = q[dim] - p[dim];
    const int32_t near_lo = delta < 0 ? lo : mid + 1;
    const int32_t near_hi = delta < 0 ? mid : hi;
    const int32_t far_lo = delta < 0 ? mid + 1 : lo;
    const int32_t far_hi = delta < 0 ? hi : mid;
    radius_rec(q, near_lo, near_hi, r2, out);
    if (delta * delta <= r2) radius_rec(q, far_lo, far_hi, r2, out);
  }
};

void kdtree_capsule_destructor(PyObject* capsule) {
  delete static_cast<KDTree*>(
      PyCapsule_GetPointer(capsule, "cl3d.KDTree"));
}

PyObject* kdtree_build(PyObject*, PyObject* args) {
  PyObject* pts_obj;
  if (!PyArg_ParseTuple(args, "O", &pts_obj)) return nullptr;
  F32Buf pts;
  if (!get_f32_2d(pts_obj, &pts, "points")) return nullptr;
  if (pts.cols != 3) {
    PyBuffer_Release(&pts.view);
    PyErr_SetString(PyExc_ValueError, "points must be [N, 3]");
    return nullptr;
  }
  auto* tree = new KDTree();
  tree->build(pts.data, pts.rows);
  PyBuffer_Release(&pts.view);
  return PyCapsule_New(tree, "cl3d.KDTree", kdtree_capsule_destructor);
}

KDTree* tree_from_capsule(PyObject* capsule) {
  return static_cast<KDTree*>(
      PyCapsule_GetPointer(capsule, "cl3d.KDTree"));
}

// kdtree_knn(tree, queries [M,3], k) -> (idx bytes [M,k] i32, d2 bytes)
PyObject* kdtree_knn(PyObject*, PyObject* args) {
  PyObject *cap, *q_obj;
  int k;
  if (!PyArg_ParseTuple(args, "OOi", &cap, &q_obj, &k)) return nullptr;
  KDTree* tree = tree_from_capsule(cap);
  if (!tree) return nullptr;
  F32Buf q;
  if (!get_f32_2d(q_obj, &q, "queries")) return nullptr;
  const Py_ssize_t m = q.rows;
  std::vector<int32_t> idx(static_cast<size_t>(m) * k);
  std::vector<float> d2(static_cast<size_t>(m) * k);
  Py_BEGIN_ALLOW_THREADS
  for (Py_ssize_t i = 0; i < m; ++i) {
    tree->knn(&q.data[i * 3], k, &idx[static_cast<size_t>(i) * k],
              &d2[static_cast<size_t>(i) * k]);
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&q.view);
  return Py_BuildValue("(NN)", make_bytes_i32(idx), make_bytes_f32(d2));
}

// kdtree_radius(tree, query [3], r) -> idx bytes (variable length)
PyObject* kdtree_radius(PyObject*, PyObject* args) {
  PyObject* cap;
  float x, y, z, r;
  if (!PyArg_ParseTuple(args, "Offff", &cap, &x, &y, &z, &r)) {
    return nullptr;
  }
  KDTree* tree = tree_from_capsule(cap);
  if (!tree) return nullptr;
  const float q[3] = {x, y, z};
  std::vector<int32_t> out;
  tree->radius(q, r * r, &out);
  return make_bytes_i32(out);
}

PyMethodDef methods[] = {
    {"grid_subsample", grid_subsample, METH_VARARGS,
     "voxel barycenter subsampling"},
    {"kdtree_build", kdtree_build, METH_VARARGS, "build a 3-D kd-tree"},
    {"kdtree_knn", kdtree_knn, METH_VARARGS, "batched k-NN query"},
    {"kdtree_radius", kdtree_radius, METH_VARARGS, "radius query"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_cl3d_native",
    "CPU native ops: grid subsampling + kd-tree", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__cl3d_native() { return PyModule_Create(&moduledef); }
