"""ctypes bindings for the native (C++) SMPS core parser.

The shared library is built lazily from native/smps_core.cpp with g++ the
first time it is needed and cached next to the source.  ``read_core_native``
returns the same CoreProblem as the pure-Python parser (smps/core.py); the
dispatcher in read_core() prefers the native path for large files and falls
back silently when the toolchain or library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def _build_library(src: str, out: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", out],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    with _LIB_LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        ndir = _native_dir()
        src = os.path.join(ndir, "smps_core.cpp")
        so = os.path.join(ndir, "libsmps_core.so")
        if not os.path.exists(so) or (
                os.path.exists(src) and
                os.path.getmtime(src) > os.path.getmtime(so)):
            if not os.path.exists(src) or not _build_library(src, so):
                _LIB_FAILED = True
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            _LIB_FAILED = True
            return None

        lib.sd_parse_core.restype = ctypes.c_void_p
        lib.sd_parse_core.argtypes = [ctypes.c_char_p]
        lib.sd_core_error.restype = ctypes.c_char_p
        lib.sd_core_error.argtypes = [ctypes.c_void_p]
        for name in ("sd_core_nrows", "sd_core_ncols", "sd_core_nnz"):
            getattr(lib, name).restype = ctypes.c_int64
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        lib.sd_core_obj_constant.restype = ctypes.c_double
        lib.sd_core_obj_constant.argtypes = [ctypes.c_void_p]
        for name in ("sd_core_name", "sd_core_objname",
                     "sd_core_row_names", "sd_core_col_names"):
            getattr(lib, name).restype = ctypes.c_char_p
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        lib.sd_core_nranges.restype = ctypes.c_int64
        lib.sd_core_nranges.argtypes = [ctypes.c_void_p]
        for name, ctyp in (
                ("sd_core_rhs", ctypes.c_double),
                ("sd_core_obj", ctypes.c_double),
                ("sd_core_lb", ctypes.c_double),
                ("sd_core_ub", ctypes.c_double),
                ("sd_core_mat_val", ctypes.c_double),
                ("sd_core_sense", ctypes.c_int8),
                ("sd_core_is_int", ctypes.c_uint8),
                ("sd_core_mat_row", ctypes.c_int32),
                ("sd_core_mat_col", ctypes.c_int32),
                ("sd_core_range_rows", ctypes.c_int32),
                ("sd_core_range_cols", ctypes.c_int32)):
            getattr(lib, name).restype = ctypes.POINTER(ctyp)
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        lib.sd_free_core.restype = None
        lib.sd_free_core.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _get_lib() is not None


def read_core_native(path: str):
    """Parse with the C++ reader; returns a CoreProblem or raises."""
    from stochasticdecomposition_tpu.smps.core import CoreProblem

    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native SMPS library unavailable")
    h = lib.sd_parse_core(path.encode())
    try:
        err = lib.sd_core_error(h)
        if err:
            raise ValueError(f"native SMPS parse error: {err.decode()}")
        m = int(lib.sd_core_nrows(h))
        n = int(lib.sd_core_ncols(h))
        nnz = int(lib.sd_core_nnz(h))

        def arr(fn, count, dtype):
            ptr = fn(h)
            if count == 0:
                return np.zeros(0, dtype)
            return np.ctypeslib.as_array(ptr, shape=(count,)).astype(dtype,
                                                                     copy=True)

        rhs = arr(lib.sd_core_rhs, m, np.float64)
        sense = arr(lib.sd_core_sense, m, np.int32)
        obj = arr(lib.sd_core_obj, n, np.float64)
        lb = arr(lib.sd_core_lb, n, np.float64)
        ub = arr(lib.sd_core_ub, n, np.float64)
        is_int = arr(lib.sd_core_is_int, n, np.uint8).astype(bool)
        mr = arr(lib.sd_core_mat_row, nnz, np.int64)
        mc = arr(lib.sd_core_mat_col, nnz, np.int64)
        mv = arr(lib.sd_core_mat_val, nnz, np.float64)

        A = np.zeros((m, n))
        np.add.at(A, (mr, mc), mv)

        row_names = lib.sd_core_row_names(h).decode().split("\n") if m else []
        col_names = lib.sd_core_col_names(h).decode().split("\n") if n else []

        nr = int(lib.sd_core_nranges(h))
        rr = arr(lib.sd_core_range_rows, nr, np.int64)
        rc = arr(lib.sd_core_range_cols, nr, np.int64)
        range_slacks = [(int(a), int(b)) for a, b in zip(rr, rc)]

        return CoreProblem(
            name=lib.sd_core_name(h).decode(),
            objsense=1,
            obj_name=lib.sd_core_objname(h).decode(),
            row_names=row_names, col_names=col_names,
            row_index={r: i for i, r in enumerate(row_names)},
            col_index={c: i for i, c in enumerate(col_names)},
            A=A, b=rhs, sense=sense, c=obj,
            obj_constant=float(lib.sd_core_obj_constant(h)),
            lb=lb, ub=ub, is_integer=is_int, range_slacks=range_slacks,
        )
    finally:
        lib.sd_free_core(h)
