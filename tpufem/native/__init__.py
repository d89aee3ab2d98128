"""Native host-side mesh kernel (C++ via ctypes), with numpy fallback.

Builds meshcore.cpp with g++ on first use (cached next to the source); every
entry point has a pure-numpy fallback so the framework works on hosts without a
toolchain. See meshcore.cpp for what is native and why.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "meshcore.cpp"
# built into a non-package subdir so import machinery never mistakes the
# ctypes library for a Python extension module
_SO = Path(__file__).parent / "_build" / "libmeshcore.so"
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            _SO.parent.mkdir(parents=True, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
                 str(_SRC), "-o", str(_SO)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(str(_SO))
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.boundary_faces.restype = ctypes.c_int64
        lib.boundary_faces.argtypes = [i32p, ctypes.c_int64, i32p]
        lib.unique_edges.restype = ctypes.c_int64
        lib.unique_edges.argtypes = [i32p, ctypes.c_int64, i32p]
        lib.unique_tri_edges.restype = ctypes.c_int64
        lib.unique_tri_edges.argtypes = [i32p, ctypes.c_int64, i32p]
        lib.msh2_counts.restype = ctypes.c_int
        lib.msh2_counts.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.msh2_parse.restype = ctypes.c_int
        lib.msh2_parse.argtypes = [ctypes.c_char_p, i64p, f64p, i64p, i64p]
        _lib = lib
    except Exception:  # noqa: BLE001 — fall back to numpy paths
        _build_failed = True
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def boundary_faces_native(tets: np.ndarray) -> np.ndarray | None:
    """Outward boundary faces of positive tets, or None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    tets32 = np.ascontiguousarray(tets, dtype=np.int32)
    out = np.empty((len(tets32) * 4, 3), dtype=np.int32)
    n = lib.boundary_faces(tets32, len(tets32), out)
    return np.ascontiguousarray(out[:n])


def unique_edges_native(tets: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    tets32 = np.ascontiguousarray(tets, dtype=np.int32)
    out = np.empty((len(tets32) * 6, 2), dtype=np.int32)
    n = lib.unique_edges(tets32, len(tets32), out)
    return np.ascontiguousarray(out[:n])


def unique_tri_edges_native(faces: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    f32 = np.ascontiguousarray(faces, dtype=np.int32)
    out = np.empty((len(f32) * 3, 2), dtype=np.int32)
    n = lib.unique_tri_edges(f32, len(f32), out)
    return np.ascontiguousarray(out[:n])


def msh2_parse_native(text: str):
    """(node_ids, node_xyz, tris, tets) or None."""
    lib = _load()
    if lib is None:
        return None
    raw = text.encode("utf-8")
    n_nodes = ctypes.c_int64()
    n_tris = ctypes.c_int64()
    n_tets = ctypes.c_int64()
    if lib.msh2_counts(raw, ctypes.byref(n_nodes), ctypes.byref(n_tris), ctypes.byref(n_tets)) != 0:
        return None
    node_ids = np.empty(n_nodes.value, dtype=np.int64)
    node_xyz = np.empty((n_nodes.value, 3), dtype=np.float64)
    tris = np.empty((n_tris.value, 3), dtype=np.int64)
    tets = np.empty((n_tets.value, 4), dtype=np.int64)
    if lib.msh2_parse(raw, node_ids, node_xyz, tris, tets) != 0:
        return None
    return node_ids, node_xyz, tris, tets
