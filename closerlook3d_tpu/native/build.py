"""Build the native extension in place: python -m closerlook3d_tpu.native.build

Mirrors the reference's init.sh / compile_op.sh role (SURVEY.md §2.1).
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig


def build() -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "src", "cl3d_native.cpp")
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(here, "_cl3d_native" + suffix)
    include = sysconfig.get_path("include")
    cmd = [
        os.environ.get("CXX", "g++"), "-O3", "-march=native", "-shared",
        "-fPIC", "-std=c++17", f"-I{include}", src, "-o", out,
    ]
    print(" ".join(cmd))
    subprocess.check_call(cmd)
    return out


if __name__ == "__main__":
    path = build()
    print("built:", path)
    # smoke-test the import
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    from closerlook3d_tpu.native import HAVE_NATIVE  # noqa: E402
    print("import ok, HAVE_NATIVE =", HAVE_NATIVE)
