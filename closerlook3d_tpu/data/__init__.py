from closerlook3d_tpu.data.loader import BatchIterator, build_features  # noqa: F401
from closerlook3d_tpu.data.build import build_dataset  # noqa: F401
