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
    # smoke-test the import in a FRESH interpreter: this process ran
    # `python -m closerlook3d_tpu.native.build`, which already imported
    # closerlook3d_tpu.native (pre-build, HAVE_NATIVE=False) — a stale
    # in-process re-import would report failure on success.
    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c",
         "from closerlook3d_tpu.native import HAVE_NATIVE; "
         "print('import ok, HAVE_NATIVE =', HAVE_NATIVE); "
         "raise SystemExit(0 if HAVE_NATIVE else 1)"],
        env=env)
    if out.returncode != 0:
        raise SystemExit("native extension built but failed to import")
