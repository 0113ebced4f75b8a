"""ctypes bridge to the native iso-surface extractor.

Builds ``native/isosurface.cpp`` with g++ on first use (cached as a .so
next to the source); replaces skimage.measure.marching_cubes in the
reference's visualization/eval paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "isosurface.cpp")
_SO = os.path.join(_NATIVE_DIR, "libisosurface.so")

_lock = threading.Lock()
_lib = None


class _IsoMesh(ctypes.Structure):
    _fields_ = [
        ("verts", ctypes.POINTER(ctypes.c_float)),
        ("nverts", ctypes.c_int64),
        ("tris", ctypes.POINTER(ctypes.c_int32)),
        ("ntris", ctypes.c_int64),
    ]


def _build() -> str:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.isfile(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.iso_extract.restype = ctypes.c_int
        lib.iso_extract.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.POINTER(_IsoMesh)]
        lib.iso_free.argtypes = [ctypes.POINTER(_IsoMesh)]
        _lib = lib
        return lib


def marching_cubes(vol: np.ndarray, iso: float,
                   spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0)
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the iso-surface of a 3D scalar field.

    Returns (verts (V,3) float32, faces (F,3) int32); empty arrays when the
    surface does not cross ``iso``.
    """
    lib = _load()
    vol = np.ascontiguousarray(vol, dtype=np.float32)
    assert vol.ndim == 3, vol.shape
    mesh = _IsoMesh()
    rc = lib.iso_extract(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        vol.shape[0], vol.shape[1], vol.shape[2],
        ctypes.c_float(iso), ctypes.c_float(spacing[0]),
        ctypes.c_float(spacing[1]), ctypes.c_float(spacing[2]),
        ctypes.byref(mesh))
    if rc != 0:
        raise RuntimeError(f"iso_extract failed with code {rc}")
    try:
        if mesh.nverts == 0:
            return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))
        verts = np.ctypeslib.as_array(mesh.verts,
                                      (mesh.nverts, 3)).copy()
        faces = np.ctypeslib.as_array(mesh.tris, (mesh.ntris, 3)).copy()
        return verts, faces
    finally:
        lib.iso_free(ctypes.byref(mesh))
