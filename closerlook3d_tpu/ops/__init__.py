"""Point-cloud core ops: neighbor search, sampling, grouping, interpolation.

Every op has a pure-jnp reference implementation (correct on any JAX
backend) in this package; Pallas TPU kernels for the hot paths live in
``closerlook3d_tpu.ops.pallas`` and are selected through
``closerlook3d_tpu.ops.dispatch``.

Reference parity (behavioral spec, SURVEY.md §2.3):
  N1 furthest_point_sample   <- pt_custom_ops FPS CUDA kernel
  N2 ball_query              <- masked_ordered_ball_query CUDA kernel
  N3 nearest_upsample        <- masked nearest query CUDA kernel
  N4 group_features          <- group_points CUDA kernel (gather)
  N5 grid_subsample          <- masked grid subsampling CUDA kernel
  N6 three_interpolate       <- three_nn + three_interpolate CUDA kernels
"""

from closerlook3d_tpu.ops.neighbors import (  # noqa: F401
    ball_query,
    knn,
    pairwise_dist2,
)
from closerlook3d_tpu.ops.grouping import (  # noqa: F401
    group_features,
    group_xyz,
    masked_avg,
    masked_max,
    masked_sum,
)
from closerlook3d_tpu.ops.sampling import (  # noqa: F401
    furthest_point_sample,
    grid_subsample,
)
from closerlook3d_tpu.ops.interpolate import (  # noqa: F401
    nearest_upsample,
    three_interpolate,
)
