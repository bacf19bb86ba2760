"""Model factories: config -> (model, loss_fn) per task.

Parity: the reference's ``build_classification`` /
``build_multi_part_segmentation`` / ``build_scene_segmentation``
(SURVEY.md §2.1 "Model factories", pytorch/models/build.py::build_*).
"""

from closerlook3d_tpu.models.build import (  # noqa: F401
    build_classification,
    build_multi_part_segmentation,
    build_scene_segmentation,
    build_model,
)
from closerlook3d_tpu.models.backbone import ResNetBackbone  # noqa: F401
from closerlook3d_tpu.models.aggregation import LocalAggregation  # noqa: F401
