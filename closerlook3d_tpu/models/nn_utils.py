"""Shared NN building blocks: 1x1 conv (Dense) + BatchNorm + activation.

The reference's per-point "1x1 Conv1d + BN + ReLU" towers map to Dense
layers over the channel axis here — identical math, and XLA fuses them
into MXU matmuls over [B*N, C].

BatchNorm under GSPMD: batch-axis reductions are global across the data
mesh axis automatically (jit inserts the collective), so this is SyncBN
for free — strictly better than the reference's per-GPU BN.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class ConvBN(nn.Module):
    """Dense (1x1 conv) + BatchNorm + optional activation."""

    features: int
    bn_momentum: float = 0.9
    activation: Optional[Callable] = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(
            self.features, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


def compute_dtype(cfg) -> Dtype:
    return jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32
