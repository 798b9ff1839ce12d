"""ctypes binding for the native (C++) BVH builder in csrc/.

The native builder (csrc/bvh_builder.cpp) produces bit-identical trees to
the numpy builder (accel/bvh.py) — same double-precision sweep-SAH decisions,
same BFS flatten — at ~40x the speed on 100K-triangle meshes.  The shared
library is compiled on first use with g++ into csrc/build/ and cached by
source mtime; any failure (no compiler, sandboxed fs) falls back to numpy
silently.  `build_bvh_flat` / `flat_to_links` in accel/bvh.py dispatch here
via `get_lib()`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Dict, Optional

import numpy as np

def _find_src() -> Optional[str]:
    """Locate bvh_builder.cpp: repo layout (csrc/ at the repo root) first,
    then the in-package copy shipped with wheels/sdists."""
    here = os.path.dirname(__file__)
    for cand in (
        os.path.join(here, "..", "..", "csrc", "bvh_builder.cpp"),
        os.path.join(here, "_csrc", "bvh_builder.cpp"),
    ):
        cand = os.path.abspath(cand)
        if os.path.exists(cand):
            return cand
    return None


_SRC = _find_src()
_BUILD_DIR = (os.path.join(os.path.dirname(_SRC), "build") if _SRC
              else os.path.join(os.path.dirname(__file__), "build"))
_SO = os.path.join(_BUILD_DIR, "libtpu_pt.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", _SO, _SRC]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if proc.returncode != 0:
        print(f"[tpu_pathtracer] native BVH build failed:\n{proc.stderr}",
              file=sys.stderr)
        return False
    return True


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("TPU_PT_NO_NATIVE"):
            return None
        try:
            if _SRC is None:
                print("[tpu_pathtracer] native BVH source not found; "
                      "using the slower numpy builder", file=sys.stderr)
                return None
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                if not _compile():
                    return None
            lib = ctypes.CDLL(_SO)
        except OSError:
            print("[tpu_pathtracer] native BVH build unavailable; "
                  "using the slower numpy builder", file=sys.stderr)
            return None

        i64, f32p, i32p = (
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        )
        lib.tpu_pt_bvh_build.restype = i64
        lib.tpu_pt_bvh_build.argtypes = [
            f32p, f32p, f32p, i64, f32p, f32p, i32p, i32p, i32p, i32p,
        ]
        lib.tpu_pt_bvh_links.restype = i64
        lib.tpu_pt_bvh_links.argtypes = [
            f32p, f32p, i32p, i32p, i32p, i32p, i64, i64,
            f32p, f32p, i32p, i32p,
        ]
        _lib = lib
        return _lib


def build_bvh_flat_native(p0, p1, p2) -> Optional[Dict[str, np.ndarray]]:
    """Native build; returns None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = int(np.asarray(p0).shape[0])
    if n == 0:
        return {
            "min": np.zeros((0, 3), np.float32),
            "max": np.zeros((0, 3), np.float32),
            "left": np.zeros((0,), np.int32),
            "right": np.zeros((0,), np.int32),
            "tri": np.zeros((0,), np.int32),
            "is_leaf": np.zeros((0,), np.int32),
        }
    p0 = np.ascontiguousarray(p0, np.float32)
    p1 = np.ascontiguousarray(p1, np.float32)
    p2 = np.ascontiguousarray(p2, np.float32)
    k = 2 * n - 1
    out = {
        "min": np.empty((k, 3), np.float32),
        "max": np.empty((k, 3), np.float32),
        "left": np.empty((k,), np.int32),
        "right": np.empty((k,), np.int32),
        "tri": np.empty((k,), np.int32),
        "is_leaf": np.empty((k,), np.int32),
    }
    got = lib.tpu_pt_bvh_build(
        p0, p1, p2, n, out["min"], out["max"], out["left"], out["right"],
        out["tri"], out["is_leaf"],
    )
    if got != k:
        return None
    return out


def flat_to_links_native(flat: Dict[str, np.ndarray], end: int | None = None
                         ) -> Optional[Dict[str, np.ndarray]]:
    lib = get_lib()
    if lib is None:
        return None
    k = int(flat["left"].shape[0])
    end = k if end is None else end
    if k == 0:
        return {
            "min": np.zeros((0, 3), np.float32),
            "max": np.zeros((0, 3), np.float32),
            "tri": np.zeros((0,), np.int32),
            "miss": np.zeros((0,), np.int32),
        }
    out = {
        "min": np.empty((k, 3), np.float32),
        "max": np.empty((k, 3), np.float32),
        "tri": np.empty((k,), np.int32),
        "miss": np.empty((k,), np.int32),
    }
    got = lib.tpu_pt_bvh_links(
        np.ascontiguousarray(flat["min"], np.float32),
        np.ascontiguousarray(flat["max"], np.float32),
        np.ascontiguousarray(flat["left"], np.int32),
        np.ascontiguousarray(flat["right"], np.int32),
        np.ascontiguousarray(flat["tri"], np.int32),
        np.ascontiguousarray(flat["is_leaf"], np.int32),
        k, end, out["min"], out["max"], out["tri"], out["miss"],
    )
    if got != k:
        return None
    return out
