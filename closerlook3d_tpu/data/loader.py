"""Batching + input-feature construction.

Single-process host batching (this host has one core; worker processes
would only add overhead — the TPU step overlaps with the next batch's
assembly via jax's async dispatch). Datasets are len/__getitem__ objects
returning dicts of fixed-shape numpy arrays.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np


def build_features(sample_or_batch: Dict[str, np.ndarray],
                   spec: str) -> np.ndarray:
    """Assemble the model input feature tensor from a sample dict.

    spec: comma-separated list of {ones, xyz, normals, rgb, height};
    e.g. the reference's input_features_dim=3 ModelNet40 config is 'xyz',
    S3DIS's 5-dim variant is 'ones,rgb,height' (1+3+1).
    """
    xyz = sample_or_batch["xyz"]
    parts = []
    for name in spec.split(","):
        name = name.strip()
        if name == "ones":
            parts.append(np.ones_like(xyz[..., :1]))
        elif name == "xyz":
            parts.append(xyz)
        elif name == "normals":
            parts.append(sample_or_batch["normals"])
        elif name == "rgb":
            parts.append(sample_or_batch["rgb"])
        elif name == "height":
            # scene datasets emit absolute height separately (xyz is
            # recentred on the sphere center); fall back to z otherwise
            parts.append(sample_or_batch.get("height", xyz[..., 2:3]))
        else:
            raise ValueError(f"unknown input feature: {name}")
    return np.concatenate(parts, axis=-1).astype(np.float32)


def feature_dim(spec: str) -> int:
    dims = {"ones": 1, "xyz": 3, "normals": 3, "rgb": 3, "height": 1}
    return sum(dims[p.strip()] for p in spec.split(","))


class BatchIterator:
    """Epoch iterator producing stacked numpy batches.

    Train mode shuffles and drops the last ragged batch (fixed shapes for
    jit); eval mode pads the final batch by repeating the last sample and
    marks padding in ``batch_pad`` so metrics can exclude it.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool,
                 feature_spec: str, seed: int = 0, drop_last: bool = True,
                 transform=None, spatial_sort: bool = False,
                 process_index: int = 0, process_count: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.feature_spec = feature_spec
        self.seed = seed
        self.drop_last = drop_last
        self.transform = transform  # batch dict -> batch dict (host-side)
        # host-side Morton sort (cfg.spatial_sort == "host"); redundant
        # when transform is the geometry precompute, which sorts itself
        self.spatial_sort = spatial_sort
        # multi-host sharding (DistributedSampler semantics): every
        # process sees the same shuffled order, takes a strided slice,
        # padded by wrapping so all processes yield EQUAL batch counts
        # (collective steps must stay in lockstep).
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0

    def _local_count(self) -> int:
        n = len(self.dataset)
        return -(-n // self.process_count)  # ceil: pad-by-wrap below

    def __len__(self):
        n = self._local_count()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 65537 + self.epoch)
            rng.shuffle(order)
        if self.process_count > 1:
            order = np.resize(order,
                              self._local_count() * self.process_count)
            order = order[self.process_index::self.process_count]
        n = len(order)
        bs = self.batch_size
        stop = (n // bs) * bs if self.drop_last else n
        for start in range(0, stop, bs):
            sel = order[start:start + bs]
            pad = bs - len(sel)
            if pad:
                sel = np.concatenate([sel, np.repeat(sel[-1:], pad)])
            samples = [self.dataset[int(i)] for i in sel]
            batch = {k: np.stack([s[k] for s in samples])
                     for k in samples[0]}
            batch["features"] = build_features(batch, self.feature_spec)
            batch["batch_pad"] = np.arange(bs) >= (bs - pad) if pad else \
                np.zeros(bs, bool)
            if self.spatial_sort:
                from closerlook3d_tpu.data.spatial_host import \
                    morton_sort_batch
                batch = morton_sort_batch(batch)
            if self.transform is not None:
                batch = self.transform(batch)
            yield batch


class PrefetchIterator:
    """Background-thread prefetch wrapper around a batch iterable.

    The reference's DataLoader(num_workers=W) overlaps host-side batch
    assembly with the device step through worker processes; here a
    single daemon thread with a bounded queue does the same (numpy
    releases the GIL in its hot paths, and batch assembly is
    allocation/copy-bound). Depth 2 is enough: one batch in flight on
    the device, one being built. Exceptions in the producer re-raise in
    the consumer. Wraps per-EPOCH iteration: ``set_epoch``/``__len__``
    delegate, so it is a drop-in for BatchIterator in the train loop.
    """

    _DONE = object()

    def __init__(self, base, depth: int = 2):
        self.base = base
        self.depth = depth

    def __len__(self):
        return len(self.base)

    def set_epoch(self, epoch: int):
        self.base.set_epoch(epoch)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        stop = threading.Event()
        err = []

        def produce():
            try:
                for batch in self.base:
                    # stop-aware put: an abandoned consumer generator
                    # (next(iter(...)) once, early break, exception)
                    # must not leave this thread blocked forever
                    # pinning host batches
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # re-raised on the consumer side
                err.append(e)
            finally:
                try:
                    q.put_nowait(self._DONE)
                except queue.Full:
                    pass  # consumer gone; stop is (or will be) set

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is self._DONE:
                    break
                yield item
        finally:
            # runs on exhaustion AND on GeneratorExit/exception: unblock
            # and retire the producer
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5.0)
        if err:
            raise err[0]
