"""Python bindings for the native runtime (ctypes, zero extra deps).

``NativeLoader`` streams decoded float32 grayscale frames from a list of
PNG paths with background decode threads and a bounded prefetch buffer —
the sound version of the reference's producer thread + busy-wait consumers
(`kitti_ba.cpp:1118-1163,207-209`). Falls back to PIL decoding when the
shared library hasn't been built (``epivo_tpu/runtime/build.sh``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterator, Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libepivo_runtime.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_LIB_PATH)
    lib.epivo_decode_png.restype = ctypes.c_void_p
    lib.epivo_decode_png.argtypes = [ctypes.c_char_p]
    lib.epivo_frame_height.restype = ctypes.c_int
    lib.epivo_frame_height.argtypes = [ctypes.c_void_p]
    lib.epivo_frame_width.restype = ctypes.c_int
    lib.epivo_frame_width.argtypes = [ctypes.c_void_p]
    lib.epivo_frame_data.restype = ctypes.POINTER(ctypes.c_float)
    lib.epivo_frame_data.argtypes = [ctypes.c_void_p]
    lib.epivo_frame_free.argtypes = [ctypes.c_void_p]
    lib.epivo_loader_open.restype = ctypes.c_void_p
    lib.epivo_loader_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.epivo_loader_next.restype = ctypes.c_void_p
    lib.epivo_loader_next.argtypes = [ctypes.c_void_p]
    lib.epivo_loader_close.argtypes = [ctypes.c_void_p]
    lib.epivo_lm_refine_pose.restype = ctypes.c_int
    lib.epivo_lm_refine_pose.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_double,
        ctypes.c_int, ctypes.c_double, ctypes.c_double,
    ]
    dptr = ctypes.POINTER(ctypes.c_double)
    lib.epivo_lm_windowed.restype = ctypes.c_int
    lib.epivo_lm_windowed.argtypes = [
        dptr, ctypes.c_int,                       # T0s, Z
        ctypes.POINTER(ctypes.c_int), dptr, ctypes.c_int,  # reps, wreps, R
        dptr, dptr, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,  # p, pt, pmask, N
        ctypes.c_double, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        dptr, ctypes.POINTER(ctypes.c_int),       # r_norm_out, iters_out
    ]
    _lib = lib
    return lib


def available() -> bool:
    return os.path.exists(_LIB_PATH)


def build() -> None:
    """Compile the shared library in place (g++, libpng)."""
    import subprocess

    script = os.path.join(os.path.dirname(__file__), "build.sh")
    subprocess.run(["/bin/sh", script], check=True)


def decode_png(path: str) -> np.ndarray:
    """Decode one PNG to float32 grayscale [H, W] via the native decoder."""
    lib = _load()
    h = lib.epivo_decode_png(path.encode())
    if not h:
        raise IOError(f"native decode failed: {path}")
    try:
        H = lib.epivo_frame_height(h)
        W = lib.epivo_frame_width(h)
        buf = np.ctypeslib.as_array(lib.epivo_frame_data(h), shape=(H, W))
        return np.array(buf, dtype=np.float32)  # copy out before free
    finally:
        lib.epivo_frame_free(h)


def lm_refine_pose(T: np.ndarray, p: np.ndarray, p_t: np.ndarray,
                   lambda0: float = 1e-2, max_iters: int = 30,
                   huber_delta: float = 1e-5,
                   epsilon: float = 1e-8) -> tuple[np.ndarray, int]:
    """Native single-pose LM refine (the reference's `kitti_E.cpp:196` step,
    implemented in `lm_ref.cpp`). Used by the benchmark baseline so the
    comparison pays native cost for the optimizer, and testable against
    the JAX solver. T [4,4]; p, p_t [N,3] normalized matches.
    Returns (refined T, accepted step count)."""
    lib = _load()
    T64 = np.ascontiguousarray(T, np.float64).copy()
    p64 = np.ascontiguousarray(p, np.float64)
    pt64 = np.ascontiguousarray(p_t, np.float64)
    n = int(p64.shape[0])
    dptr = ctypes.POINTER(ctypes.c_double)
    acc = lib.epivo_lm_refine_pose(
        T64.ctypes.data_as(dptr), p64.ctypes.data_as(dptr),
        pt64.ctypes.data_as(dptr), n, float(lambda0), int(max_iters),
        float(huber_delta), float(epsilon),
    )
    return T64, int(acc)


def lm_windowed(T0s: np.ndarray, reps: np.ndarray, p: np.ndarray,
                p_t: np.ndarray, wreps: np.ndarray | None = None,
                pmask: np.ndarray | None = None, lambda0: float = 1e-2,
                max_iters: int = 30, huber_delta: float = 1e-5,
                epsilon: float = 1e-8):
    """Native windowed multi-zeta LM (the reference's full solver,
    `jac_Rt_gen_.cpp:287-478`; see lm_ref.cpp). The single-core baseline
    counterpart of ``optim.lm.solve`` for the BA benchmark, and testable
    against it.

    T0s [Z,4,4]; reps [R,2] forward spans; p/p_t [R,N,3]; wreps [R];
    pmask [R,N] bool. Returns (T_opt [Z,4,4], r_norm, accepted, iters_run).
    """
    lib = _load()
    T64 = np.ascontiguousarray(T0s, np.float64).copy()
    reps32 = np.ascontiguousarray(reps, np.int32)
    p64 = np.ascontiguousarray(p, np.float64)
    pt64 = np.ascontiguousarray(p_t, np.float64)
    Z = int(T64.shape[0])
    R = int(reps32.shape[0])
    N = int(p64.shape[1])
    w64 = (np.ascontiguousarray(wreps, np.float64)
           if wreps is not None else None)
    m8 = (np.ascontiguousarray(pmask, np.uint8)
          if pmask is not None else None)
    dptr = ctypes.POINTER(ctypes.c_double)
    r_norm = ctypes.c_double(0.0)
    iters = ctypes.c_int(0)
    acc = lib.epivo_lm_windowed(
        T64.ctypes.data_as(dptr), Z,
        reps32.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        w64.ctypes.data_as(dptr) if w64 is not None else None, R,
        p64.ctypes.data_as(dptr), pt64.ctypes.data_as(dptr),
        m8.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
        if m8 is not None else None,
        N, float(lambda0), int(max_iters), float(huber_delta),
        float(epsilon), ctypes.byref(r_norm), ctypes.byref(iters),
    )
    if acc < 0:
        raise ValueError(f"lm_windowed: Z={Z} exceeds the native limit")
    return T64, float(r_norm.value), int(acc), int(iters.value)


class NativeLoader:
    """Prefetching in-order frame stream over a path list."""

    def __init__(self, paths: Sequence[str], n_workers: int = 2,
                 capacity: int = 8):
        self._paths = list(paths)
        self._n_workers = n_workers
        self._capacity = capacity

    def __iter__(self) -> Iterator[np.ndarray]:
        if not available():
            from PIL import Image

            for p in self._paths:
                with Image.open(p) as im:
                    yield np.asarray(im.convert("L"), dtype=np.float32)
            return
        lib = _load()
        handle = lib.epivo_loader_open(
            "\n".join(self._paths).encode(), self._n_workers, self._capacity
        )
        if not handle:
            raise IOError("loader_open failed")
        try:
            while True:
                fr = lib.epivo_loader_next(handle)
                if not fr:
                    break
                H = lib.epivo_frame_height(fr)
                W = lib.epivo_frame_width(fr)
                if H == 0 or W == 0:
                    raise IOError("native decode failed mid-stream")
                buf = np.ctypeslib.as_array(
                    lib.epivo_frame_data(fr), shape=(H, W)
                )
                yield np.array(buf, dtype=np.float32)
        finally:
            lib.epivo_loader_close(handle)
