"""File+console logger (reference: pytorch/utils/logger.py::setup_logger).

Single-controller JAX replaces the reference's rank-aware gating: only
process 0 logs (multi-host), matching DDP rank-0 logging.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

import jax


def setup_logger(log_dir: Optional[str] = None,
                 name: str = "closerlook3d") -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    logger.propagate = False
    if jax.process_index() == 0:
        fmt = logging.Formatter(
            "[%(asctime)s] %(levelname)s %(message)s", "%H:%M:%S")
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(log_dir, "log.txt"))
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    else:
        logger.addHandler(logging.NullHandler())
    return logger
