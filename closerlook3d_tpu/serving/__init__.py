from closerlook3d_tpu.serving.export import (  # noqa: F401
    export_forward,
    load_forward,
)
