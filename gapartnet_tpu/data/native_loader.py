"""ctypes bindings for the native data-pipeline kernels (libgapdata).

Builds the C++ library on first use (g++ is in the image; no pybind11, so the
interface is plain C via ctypes) and falls back to the NumPy implementations
in data/loader.py when the toolchain is missing.  The native paths replace
the reference's host hot loops: pointnet_lib CUDA FPS for preprocessing and
the per-instance Python loop in dataloader workers (gapartnet.py:145-176).
"""

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "native" / "gapdata.cpp"
_LIB_PATH = _HERE / "native" / "libgapdata.so"
_lib = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    cmds = [
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
         "-o", str(_LIB_PATH), str(_SRC)],
        ["g++", "-O3", "-shared", "-fPIC",  # no-openmp fallback
         "-o", str(_LIB_PATH), str(_SRC)],
    ]
    for cmd in cmds:
        try:
            r = subprocess.run(cmd, capture_output=True, timeout=120)
            if r.returncode == 0 and _LIB_PATH.exists():
                return ctypes.CDLL(str(_LIB_PATH))
        except (OSError, subprocess.TimeoutExpired):
            continue
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        if _LIB_PATH.exists():
            try:
                _lib = ctypes.CDLL(str(_LIB_PATH))
            except OSError:
                _lib = _build()
        else:
            _lib = _build()
        if _lib is not None:
            _lib.fps_cpu.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
            ]
            _lib.instance_info.restype = ctypes.c_int32
            _lib.instance_info.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            _lib.augment_points.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ]
    return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def fps_cpu(xyz: np.ndarray, num_samples: int) -> np.ndarray:
    """Greedy FPS on host; native when available, NumPy otherwise."""
    lib = get_lib()
    xyz = np.ascontiguousarray(xyz, np.float32)
    if lib is not None:
        out = np.zeros(num_samples, np.int32)
        lib.fps_cpu(_fptr(xyz), xyz.shape[0], num_samples, _iptr(out))
        return out
    # NumPy fallback (same semantics)
    n = xyz.shape[0]
    dists = np.full(n, np.inf, np.float32)
    out = np.zeros(num_samples, np.int32)
    last = 0
    for s in range(1, num_samples):
        d = ((xyz - xyz[last]) ** 2).sum(1)
        np.minimum(dists, d, out=dists)
        last = int(np.argmax(dists))
        out[s] = last
    return out


def instance_info(
    points: np.ndarray, sem_labels: np.ndarray, instance_labels: np.ndarray,
    max_instances: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Native per-instance stats; falls back to data/loader.generate_instance_info."""
    lib = get_lib()
    if lib is None:
        from gapartnet_tpu.data.loader import generate_instance_info

        regions, nppi, isl, num = generate_instance_info(
            points, sem_labels, instance_labels
        )
        k = min(num, max_instances)
        nppi_p = np.zeros(max_instances, np.int32)
        isl_p = np.full(max_instances, -1, np.int32)
        nppi_p[:k] = nppi[:k]
        isl_p[:k] = isl[:k]
        return regions, nppi_p, isl_p, k
    points = np.ascontiguousarray(points, np.float32)
    sem = np.ascontiguousarray(sem_labels, np.int32)
    ins = np.ascontiguousarray(instance_labels, np.int32)
    n, c = points.shape
    regions = np.zeros((n, 9), np.float32)
    nppi = np.zeros(max_instances, np.int32)
    isl = np.full(max_instances, -1, np.int32)
    num = lib.instance_info(
        _fptr(points), n, c, _iptr(sem), _iptr(ins), max_instances,
        _fptr(regions), _iptr(nppi), _iptr(isl),
    )
    return regions, nppi, isl, int(num)


def augment_points(points: np.ndarray, m: np.ndarray, color_delta: np.ndarray):
    """In-place native augmentation; NumPy fallback."""
    lib = get_lib()
    points = np.ascontiguousarray(points, np.float32)
    if lib is not None:
        mm = np.ascontiguousarray(m, np.float32)
        cd = np.ascontiguousarray(color_delta, np.float32)
        lib.augment_points(_fptr(points), points.shape[0], points.shape[1],
                           _fptr(mm), _fptr(cd))
        return points
    points[:, :3] = points[:, :3] @ m
    points[:, 3:] += color_delta[None, :]
    return points
