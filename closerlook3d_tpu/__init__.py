"""CloserLook3D-TPU: a TPU-native point-cloud deep-learning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
zeliu98/CloserLook3D ("A Closer Look at Local Aggregation Operators in
Point Cloud Analysis", ECCV 2020): a 5-stage residual point-cloud trunk
with four pluggable local-aggregation operator families (point-wise MLP,
pseudo-grid / kernel-point, adaptive weight, parameter-free PosPool),
heads for classification / part segmentation / scene segmentation, and
the four workloads (ModelNet40, ShapeNetPart, PartNet, S3DIS).

Design stance (TPU-first, not a port — see SURVEY.md §7):
  * fixed shapes everywhere: ``[B, N, 3]`` points, ``[B, N, K]`` padded
    neighbor indices, boolean masks as the universal interface;
  * the irregular ops (ball query, FPS, grid subsample, 3-NN
    interpolation, grouping) are pure-jnp reference implementations plus
    fused Pallas TPU kernels over fixed-size padded neighborhoods;
  * functional flax models, one jitted train step, data parallelism via
    ``jax.sharding`` over a device mesh (XLA collectives, no NCCL);
  * config-driven model builder, schema-compatible with the reference's
    YAML experiment files.
"""

__version__ = "0.1.0"

from closerlook3d_tpu.utils.config import load_config  # noqa: F401
