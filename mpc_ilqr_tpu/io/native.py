"""ctypes bindings for the native I/O runtime (native/csvio.cpp).

The reference's data loading and logging are C++ (robot_utils.cpp:281-347
CSV parsing, mpc.cpp:181-343 synchronous ofstream logging); this module
binds the framework's native equivalents: an mmap'd CSV parser and a
background-thread telemetry writer that never blocks the control loop.

The library auto-builds with g++ on first use (cached at native/libmpcio.so);
every entry point has a pure-python fallback so the framework still works
without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.normpath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "native")
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmpcio.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            src = os.path.join(_NATIVE_DIR, "csvio.cpp")
            if not os.path.exists(src):
                return None
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                     src, "-o", _LIB_PATH],
                    check=True, capture_output=True, timeout=120,
                )
            except (subprocess.SubprocessError, FileNotFoundError):
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.csv_read_matrix.restype = ctypes.POINTER(ctypes.c_double)
        lib.csv_read_matrix.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.csv_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
        lib.telemetry_open.restype = ctypes.c_void_p
        lib.telemetry_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.telemetry_log.restype = ctypes.c_int
        lib.telemetry_log.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ]
        lib.telemetry_dropped.restype = ctypes.c_int64
        lib.telemetry_dropped.argtypes = [ctypes.c_void_p]
        lib.telemetry_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def read_csv_matrix(path: str, skip_rows: int = 0) -> np.ndarray:
    """Fast CSV float-matrix reader; numpy fallback when no native lib."""
    lib = _load()
    if lib is None:
        return np.atleast_2d(
            np.loadtxt(path, delimiter=",", skiprows=skip_rows, dtype=np.float64)
        )
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    ptr = lib.csv_read_matrix(path.encode(), skip_rows, ctypes.byref(rows), ctypes.byref(cols))
    if not ptr:
        raise IOError(f"native CSV parse failed for {path}")
    try:
        arr = np.ctypeslib.as_array(ptr, shape=(rows.value, cols.value)).copy()
    finally:
        lib.csv_free(ptr)
    return arr


class AsyncTelemetry:
    """Background CSV writer; telemetry_log never blocks the control loop.

    Falls back to synchronous python writes without the native lib.
    """

    def __init__(self, path: str, header: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._lib = _load()
        if self._lib is not None:
            self._h = self._lib.telemetry_open(path.encode(), header.encode())
            if not self._h:
                raise IOError(f"telemetry_open failed for {path}")
            self._f = None
        else:
            self._h = None
            self._f = open(path, "w")
            self._f.write(header + "\n")

    def log(self, row: np.ndarray):
        row = np.ascontiguousarray(row, dtype=np.float64)
        if self._h is not None:
            self._lib.telemetry_log(
                self._h, row.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), row.size
            )
        else:
            self._f.write(",".join(f"{v:.9g}" for v in row) + "\n")

    @property
    def dropped(self) -> int:
        return int(self._lib.telemetry_dropped(self._h)) if self._h is not None else 0

    def close(self):
        if self._h is not None:
            self._lib.telemetry_close(self._h)
            self._h = None
        elif self._f is not None:
            self._f.close()
            self._f = None
