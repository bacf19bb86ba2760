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
import jax
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


class _MaskedBNCore(nn.Module):
    """BatchNorm whose statistics exclude masked (padded/shadow) slots.

    Design note vs the reference: torch BatchNorm1d over gathered
    neighborhoods normalizes shadow slots too (duplicated nearest
    neighbors), biasing the statistics. Masked statistics are the
    principled choice and keep the factorized Pallas path and the
    gather-based jnp path numerically identical. Under GSPMD the masked
    sums reduce over the global (sharded) batch — sync-BN for free.

    Two usage modes sharing the same params/stats:
      * ``__call__(x, mask, train)`` — normalize x directly;
      * ``stats_affine(mean, var, train)`` — feed externally computed
        statistics (the factorized kernels produce them analytically)
        and get the effective (scale, bias) back.
    """

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.features
        self.scale = self.param("scale", nn.initializers.ones, (c,))
        self.bias = self.param("bias", nn.initializers.zeros, (c,))
        self.ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(c, jnp.float32))
        self.ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(c, jnp.float32))

    def _update(self, mean, var):
        if not self.is_initializing():
            m = self.momentum
            self.ra_mean.value = m * self.ra_mean.value + (1 - m) * mean
            self.ra_var.value = m * self.ra_var.value + (1 - m) * var

    def stats_affine(self, mean, var, train: bool):
        """(eff_scale, eff_bias) so that norm(x) = x*eff_scale + eff_bias."""
        if train:
            self._update(mean, var)
        else:
            mean, var = self.ra_mean.value, self.ra_var.value
        eff_scale = self.scale * jax.lax.rsqrt(var + self.epsilon)
        eff_bias = self.bias - mean * eff_scale
        return eff_scale.astype(self.dtype), eff_bias.astype(self.dtype)

    def __call__(self, x, mask, train: bool):
        """x [..., C]; mask [...] bool (True = contributes to stats)."""
        if train:
            m = mask[..., None].astype(jnp.float32)
            x32 = x.astype(jnp.float32)
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x32 * m, axis=tuple(range(x.ndim - 1))) / cnt
            var = jnp.sum(m * (x32 - mean) ** 2,
                          axis=tuple(range(x.ndim - 1))) / cnt
            eff_scale, eff_bias = self.stats_affine(mean, var, True)
        else:
            eff_scale, eff_bias = self.stats_affine(None, None, False)
        return x * eff_scale + eff_bias


MaskedBatchNorm = _MaskedBNCore  # public name
