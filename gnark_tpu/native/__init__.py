"""Native (C++) runtime components, loaded via ctypes.

Build-on-demand: the shared library compiles once with g++ into
``_build/`` and is reused across processes (mtime-checked against the
source).  No pybind11 — plain C ABI + ctypes, per the environment.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD = os.path.join(_DIR, "_build")


def _ensure_lib(name: str, sources: list) -> str | None:
    """Compile sources into _build/lib<name>.so if stale; return path or
    None when no toolchain is available."""
    os.makedirs(_BUILD, exist_ok=True)
    out = os.path.join(_BUILD, f"lib{name}.so")
    srcs = [os.path.join(_DIR, s) for s in sources]
    if os.path.exists(out) and all(
            os.path.getmtime(out) >= os.path.getmtime(s) for s in srcs):
        return out
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", "-o", out] + [s for s in srcs if s.endswith(".cpp")]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        return None
    return out


_solver_lib = None
_solver_tried = False


def solver_lib():
    """ctypes handle to the solver core, or None if unbuildable."""
    global _solver_lib, _solver_tried
    if _solver_tried:
        return _solver_lib
    _solver_tried = True
    path = _ensure_lib("gnark_solver", ["solver_core.cpp", "msm_core.cpp", "field_common.h"])
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    for fn in ("gnark_solve_r1cs", "gnark_solve_scs", "gnark_qap_accumulate",
               "gnark_lincomb3", "gnark_powers", "gnark_vecmul",
               "gnark_batch_inv", "gnark_solve_scs", "gnark_vecadd",
               "gnark_prefix_mul", "gnark_synth_div", "gnark_msm", "gnark_fixed_base"):
        getattr(lib, fn).restype = ctypes.c_int64
    _solver_lib = lib
    return lib
