"""ctypes bindings for the native npy chunk streamer.

Builds the shared library on demand with g++ (no pip deps); falls back
cleanly if no compiler is available -- callers check native_available().
"""
import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "npy_stream.cpp")
_LIB = os.path.join(_HERE, "_libxgpr_io.so")

_DTYPES = {0: np.float32, 1: np.float64, 2: np.int32, 3: np.int64}

_lib = None
_build_lock = threading.Lock()
_build_failed = False


def _build():
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
         _SRC, "-o", _LIB],
        check=True, capture_output=True)


def _get_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _build_lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_LIB) or \
                    os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_LIB)
        except Exception:
            _build_failed = True
            return None
        lib.xgpr_stream_open.restype = ctypes.c_void_p
        lib.xgpr_stream_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.c_int64]
        lib.xgpr_stream_next.restype = ctypes.c_int
        lib.xgpr_stream_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int)]
        lib.xgpr_stream_close.restype = None
        lib.xgpr_stream_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


class NativeNpyStream:
    """Iterate .npy files as numpy arrays with background prefetch.

    Shapes beyond the leading axis are flattened by the native layer; pass
    trailing_shape to restore them.
    """

    def __init__(self, paths, trailing_shape=None, depth=2,
                 inner_dim=None):
        """``trailing_shape`` restores a FIXED per-row shape.  For 3d
        corpora whose sequence axis varies file-to-file, pass
        ``inner_dim`` (the fixed channel width) instead: each chunk is
        reshaped to (rows, cols // inner_dim, inner_dim)."""
        lib = _get_lib()
        if lib is None:
            raise RuntimeError("Native IO library unavailable.")
        self._lib = lib
        self._paths = [os.fsencode(p) for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = lib.xgpr_stream_open(arr, len(self._paths),
                                            depth)
        self._trailing = trailing_shape
        self._inner_dim = inner_dim
        self._closed = False

    def __iter__(self):
        return self

    def __next__(self):
        if self._closed:
            raise StopIteration
        buf = ctypes.c_void_p()
        rows = ctypes.c_int64()
        cols = ctypes.c_int64()
        code = ctypes.c_int()
        status = self._lib.xgpr_stream_next(
            self._handle, ctypes.byref(buf), ctypes.byref(rows),
            ctypes.byref(cols), ctypes.byref(code))
        if status == 0:
            self.close()
            raise StopIteration
        if status < 0:
            self.close()
            raise RuntimeError("Native npy stream failed (bad file?).")
        dtype = _DTYPES[code.value]
        n = rows.value * cols.value
        # Copy out of the stream-owned buffer (valid until next call).
        src = (ctypes.c_char * (n * np.dtype(dtype).itemsize)).from_address(
            buf.value)
        out = np.frombuffer(bytes(src), dtype=dtype).reshape(
            rows.value, cols.value)
        if self._inner_dim is not None:
            out = out.reshape(rows.value, cols.value // self._inner_dim,
                              self._inner_dim)
        elif self._trailing is not None:
            out = out.reshape((rows.value,) + tuple(self._trailing))
        elif cols.value == 1:
            out = out.reshape(rows.value)
        return out

    def close(self):
        if not self._closed and self._handle:
            self._lib.xgpr_stream_close(self._handle)
            self._closed = True

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
