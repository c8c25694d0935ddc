"""ctypes bindings to the native C++ IO runtime (native/lbm_io.cpp).

Builds the shared library on first use with g++ (cached next to the
source); every entry point has a pure-NumPy fallback so the framework
works without a toolchain.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading

import numpy as np

_SRC = pathlib.Path(__file__).resolve().parent.parent / "native" / "lbm_io.cpp"
_SO = _SRC.with_suffix(".so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", str(_SO), str(_SRC)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
            lib.lbm_write_csv.restype = ctypes.c_int
            lib.lbm_write_csv.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
                ctypes.c_int64,
            ]
            lib.lbm_write_raw.restype = ctypes.c_int
            lib.lbm_write_raw.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64]
            lib.lbm_read_raw.restype = ctypes.c_int
            lib.lbm_read_raw.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def write_csv(path: str, data: np.ndarray) -> None:
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.float64)
    if lib is None:
        with open(path, "w") as fp:
            for row in data:
                fp.write(", ".join(f"{v:.10f}" for v in row))
                fp.write("\n")
        return
    rc = lib.lbm_write_csv(
        path.encode(),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        data.shape[0],
        data.shape[1],
    )
    if rc != 0:
        raise IOError(f"lbm_write_csv({path}) failed with code {rc}")


def write_raw(path: str, data: np.ndarray) -> None:
    lib = _load()
    data = np.ascontiguousarray(data)
    if lib is None:
        data.tofile(path)
        return
    rc = lib.lbm_write_raw(path.encode(), data.ctypes.data_as(ctypes.c_void_p), data.nbytes)
    if rc != 0:
        raise IOError(f"lbm_write_raw({path}) failed with code {rc}")


def read_raw(path: str, shape, dtype) -> np.ndarray:
    lib = _load()
    if lib is None:
        return np.fromfile(path, dtype=dtype).reshape(shape)
    out = np.empty(shape, dtype=dtype)
    rc = lib.lbm_read_raw(path.encode(), out.ctypes.data_as(ctypes.c_void_p), out.nbytes)
    if rc != 0:
        raise IOError(f"lbm_read_raw({path}) failed with code {rc}")
    return out
