"""ctypes bindings for the native host preprocessing kernels.

Loads ``cpp/libbufferhost.so`` (built by ``make -C cpp``); every entry
point has a numpy fallback so the package works without the native build.
These mirror the reference's in-repo C++ extensions
(``cpp_wrappers/cpp_subsampling``, ``cpp_wrappers/cpp_neighbors``) — see
cpp/host_ops.cpp.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..", "..", "cpp",
                        "libbufferhost.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        # try building once if the toolchain is present
        try:
            import subprocess
            subprocess.run(["make", "-C", os.path.dirname(path), "-s"],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.buffer_grid_subsample.restype = ctypes.c_int
    lib.buffer_grid_subsample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.buffer_radius_neighbors.restype = None
    lib.buffer_radius_neighbors.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_float, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    lib.buffer_fps.restype = None
    lib.buffer_fps.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32)]
    try:
        lib.buffer_knn.restype = None
        lib.buffer_knn.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_float, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        lib.buffer_normals.restype = None
        lib.buffer_normals.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_float)]
    except AttributeError:
        pass  # stale .so without the newer entry points
    _LIB = lib
    return _LIB


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def voxel_subsample_host(pts: np.ndarray, cell: float) -> np.ndarray:
    """Barycenter voxel downsampling on the host (C++ fast path)."""
    pts = np.ascontiguousarray(pts, np.float32)
    lib = _load()
    if lib is None:
        from buffer_tpu.ops.subsample import voxel_subsample_np
        return voxel_subsample_np(pts, cell)
    out = np.empty_like(pts)
    n = lib.buffer_grid_subsample(_fptr(pts), len(pts), ctypes.c_float(cell),
                                  _fptr(out), len(pts))
    return out[:n].copy()


def radius_neighbors_host(queries: np.ndarray, support: np.ndarray,
                          radius: float, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Distance-sorted in-radius neighbors (shadow index = len(support)).
    Returns (idx [Q, k] int32, counts [Q] int32)."""
    queries = np.ascontiguousarray(queries, np.float32)
    support = np.ascontiguousarray(support, np.float32)
    lib = _load()
    if lib is None:
        d = np.linalg.norm(queries[:, None] - support[None], axis=-1)
        order = np.argsort(d, axis=1)
        ds = np.take_along_axis(d, order, axis=1)
        ok = ds <= radius
        idx = np.where(ok[:, :k], order[:, :k], len(support)).astype(np.int32)
        return idx, ok[:, :k].sum(1).astype(np.int32)
    idx = np.empty((len(queries), k), np.int32)
    counts = np.empty((len(queries),), np.int32)
    lib.buffer_radius_neighbors(_fptr(queries), len(queries), _fptr(support),
                                len(support), ctypes.c_float(radius),
                                ctypes.c_int32(k), _iptr(idx), _iptr(counts))
    return idx, counts


def knn_host(queries: np.ndarray, support: np.ndarray, k: int,
             cell: Optional[float] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Exact k-nearest neighbors, distance-sorted (shadow index =
    len(support)).  Returns (idx [Q, k] int32, counts [Q] int32).

    ``cell`` sizes the hash grid; default estimates the kth-NN distance
    from the bounding-box density."""
    queries = np.ascontiguousarray(queries, np.float32)
    support = np.ascontiguousarray(support, np.float32)
    ns = len(support)
    if cell is None:
        # sampled kth-NN distance (point clouds are surfaces, so volumetric
        # density estimates undershoot badly -> huge shell scans)
        m = min(64, len(queries))
        s = min(ns, 8192)
        qi = np.linspace(0, len(queries) - 1, m).astype(np.int64)
        si = np.random.RandomState(0).choice(ns, s, replace=False) \
            if ns > s else np.arange(ns)
        d = np.linalg.norm(queries[qi][:, None] - support[si][None], axis=-1)
        # the kth-NN-in-full distance ~ the (k*s/ns)th in an s-subsample
        kk = max(1, min(int(round(k * s / ns)), s - 1))
        cell = 1.3 * float(np.median(np.partition(d, kk, axis=1)[:, kk]))
        cell = max(cell, 1e-4)
    lib = _load()
    if lib is None or not hasattr(lib, "buffer_knn"):
        d = np.linalg.norm(queries[:, None] - support[None], axis=-1)
        kk = min(k, ns)
        order = np.argsort(d, axis=1)[:, :kk]
        idx = np.full((len(queries), k), ns, np.int32)
        idx[:, :kk] = order
        return idx, np.full((len(queries),), kk, np.int32)
    idx = np.empty((len(queries), k), np.int32)
    counts = np.empty((len(queries),), np.int32)
    lib.buffer_knn(_fptr(queries), len(queries), _fptr(support), ns,
                   ctypes.c_float(cell), ctypes.c_int32(k), _iptr(idx),
                   _iptr(counts))
    return idx, counts


def normals_host(pts: np.ndarray, knn: int = 30) -> np.ndarray:
    """kNN-PCA normals oriented toward the origin (Open3D
    estimate_normals + orient_normals_towards_camera_location()).
    pts [N, 3] -> [N, 3]."""
    pts = np.ascontiguousarray(pts, np.float32)
    idx, counts = knn_host(pts, pts, knn)
    lib = _load()
    if lib is None or not hasattr(lib, "buffer_normals"):
        import jax
        from buffer_tpu.ops.normals import normals_from_neighbors
        import jax.numpy as jnp
        valid = np.ones((len(pts),), bool)
        nvalid = idx < len(pts)
        with jax.default_device(jax.devices("cpu")[0]):
            return np.asarray(normals_from_neighbors(
                jnp.asarray(pts), jnp.asarray(valid),
                jnp.asarray(np.minimum(idx, len(pts) - 1)),
                jnp.asarray(nvalid)))
    out = np.empty_like(pts)
    lib.buffer_normals(_fptr(pts), len(pts), _iptr(idx), _iptr(counts),
                       ctypes.c_int32(idx.shape[1]), _fptr(out))
    return out


def fps_host(pts: np.ndarray, num_samples: int) -> np.ndarray:
    pts = np.ascontiguousarray(pts, np.float32)
    lib = _load()
    if lib is None:
        idx = np.zeros(num_samples, np.int32)
        mind = np.full(len(pts), np.inf)
        for s in range(1, num_samples):
            d = np.sum((pts - pts[idx[s - 1]]) ** 2, axis=-1)
            mind = np.minimum(mind, d)
            idx[s] = int(np.argmax(mind))
        return idx
    out = np.empty((num_samples,), np.int32)
    lib.buffer_fps(_fptr(pts), len(pts), ctypes.c_int32(num_samples), _iptr(out))
    return out
