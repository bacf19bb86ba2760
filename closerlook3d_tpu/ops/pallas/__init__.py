"""Pallas TPU kernels for the hot ops.

The XLA gather on TPU moves ~13 GB/s effective on the [B,N,K,C] neighbor
gather (measured, B32/N1024/K26/C72 bf16) — the aggregation operators
spend ~90% of their time there. These kernels replace gather-materialize-
reduce with a fused one-hot MXU gather + encode + masked reduce in VMEM,
with custom-VJP backward kernels (the gather transpose is another one-hot
matmul).
"""

from closerlook3d_tpu.ops.pallas.aggregation import (  # noqa: F401
    pospool_fused,
)
