"""Native (C++) host-side components, loaded through ctypes.

The reference keeps its heavy host/device loops native (CUDA hash encoder,
C++ tracers, torch's C++ dataloader); this package holds the TPU framework's
native host pieces. Libraries are compiled on first use with g++ and cached
next to the sources; every native path has a numpy fallback and a test that
cross-checks both.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIBS: dict[str, ctypes.CDLL | None] = {}


def _build_and_load(name: str) -> ctypes.CDLL | None:
    if name in _LIBS:
        return _LIBS[name]
    if os.environ.get("HOLOSCENE_NATIVE", "1") == "0":
        _LIBS[name] = None
        return None
    src = os.path.join(_DIR, f"{name}.cpp")
    lib_path = os.path.join(_DIR, f"lib{name}.so")
    try:
        if (not os.path.exists(lib_path)
                or os.path.getmtime(lib_path) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
                 "-o", lib_path],
                check=True, capture_output=True,
            )
        _LIBS[name] = ctypes.CDLL(lib_path)
    except Exception:
        _LIBS[name] = None
    return _LIBS[name]


def marching_tetrahedra_native(sdf: np.ndarray, level: float = 0.0):
    """Native isosurface extraction; returns (verts_grid_coords, faces) or
    None when the library is unavailable."""
    lib = _build_and_load("mc_native")
    if lib is None:
        return None
    lib.mc_run.restype = ctypes.c_int64
    lib.mc_run.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_double,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    sdf_f = np.ascontiguousarray(sdf, dtype=np.float32)
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    lib.mc_run(
        sdf_f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sdf_f.shape[0], sdf_f.shape[1], sdf_f.shape[2],
        float(level), ctypes.byref(nv), ctypes.byref(nf),
    )
    verts = np.empty((nv.value, 3), dtype=np.float64)
    faces = np.empty((nf.value, 3), dtype=np.int64)
    lib.mc_copy(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    lib.mc_free()
    return verts, faces
