"""Implementation dispatch: Pallas TPU kernels vs jnp references.

Resolution order: env CL3D_OPS_IMPL in {jnp, pallas, auto} (default
auto = pallas on accelerator backends, jnp on CPU). Read at trace time.
"""

from __future__ import annotations

import os


def prefer_pallas() -> bool:
    impl = os.environ.get("CL3D_OPS_IMPL", "auto")
    if impl == "jnp":
        return False
    if impl == "pallas":
        return True
    import jax

    return jax.default_backend() not in ("cpu",)
