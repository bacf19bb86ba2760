"""Scalar metric logging (SURVEY.md §5 "Metrics / logging"):
TensorBoard when the ``tensorboard``/``tf.summary`` stack is importable,
plus an always-on dependency-free JSONL stream (``scalars.jsonl``) that
any tooling can tail.

The reference logs TensorBoard scalars (loss/acc/lr/IoU) from rank 0
(SURVEY.md §5); here there is one host process per slice so no rank
gating is needed.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class ScalarWriter:
    """Write scalars to <logdir>/scalars.jsonl and (if available) TB."""

    def __init__(self, logdir: Optional[str]):
        self._jsonl = None
        self._tb = None
        if not logdir:
            return
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "scalars.jsonl"), "a",
                           buffering=1)
        try:  # TB is optional: tf.summary needs the tensorflow package
            import tensorflow as tf  # noqa: F401

            self._tb = tf.summary.create_file_writer(
                os.path.join(logdir, "tb"))
        except Exception:  # pragma: no cover - env without tensorflow
            self._tb = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        # tolerate post-close writes (e.g. an extra validate() after
        # fit() closed the writer): metrics still return, just unlogged
        if self._jsonl is not None and not self._jsonl.closed:
            self._jsonl.write(json.dumps(
                {"tag": tag, "value": float(value), "step": int(step),
                 "ts": time.time()}) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                tf.summary.scalar(tag, float(value), step=int(step))

    def scalars(self, values: dict, step: int, prefix: str = "") -> None:
        for k, v in values.items():
            self.scalar(prefix + k, v, step)

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        self.flush()
