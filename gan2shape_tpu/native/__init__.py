"""ctypes bindings for the native host-side data pipeline (src/cache.cpp).

Builds the shared library with g++ on first use (cached next to the source);
everything degrades to a pure-numpy fallback when a toolchain is unavailable.
"""

import ctypes
import logging
import os
import subprocess
from os import path

import numpy as np

log = logging.getLogger(__name__)

_SRC = path.join(path.dirname(__file__), "src", "cache.cpp")
_SO = path.join(path.dirname(__file__), "src", "libg2s_cache.so")
_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not path.exists(_SO) or (path.getmtime(_SO) < path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.g2s_cache_open.restype = ctypes.c_void_p
        lib.g2s_cache_open.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                       ctypes.c_int64, ctypes.c_int]
        lib.g2s_cache_close.argtypes = [ctypes.c_void_p]
        lib.g2s_cache_get_batch.restype = ctypes.c_int
        lib.g2s_cache_get_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.g2s_cache_prefetch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
        assert lib.g2s_version() == 1
        _lib = lib
    except Exception as e:  # no toolchain / build failure
        log.warning("native cache unavailable (%s); using numpy fallback", e)
        _lib = None
    return _lib


def is_available():
    return get_lib() is not None


class TensorCache:
    """Reader over a flat binary record file.

    dtype 'uint8' records are converted to float32 in [-1, 1] (image
    convention); 'float32' records pass through.  Falls back to numpy
    memmap when the native library is unavailable.
    """

    def __init__(self, cache_path, n, record_shape, dtype="uint8"):
        self.n = int(n)
        self.record_shape = tuple(record_shape)
        self.record_elems = int(np.prod(record_shape))
        self.dtype_code = 0 if dtype == "uint8" else 1
        self._path = cache_path
        self._lib = get_lib()
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.g2s_cache_open(
                cache_path.encode(), self.n, self.record_elems,
                self.dtype_code)
            if not self._handle:
                log.warning("native open failed for %s; numpy fallback",
                            cache_path)
        if not self._handle:
            np_dtype = np.uint8 if self.dtype_code == 0 else np.float32
            self._mm = np.memmap(cache_path, dtype=np_dtype, mode="r",
                                 shape=(self.n, self.record_elems))

    def get_batch(self, indices):
        indices = np.asarray(indices, np.int64)
        out = np.empty((len(indices), self.record_elems), np.float32)
        if self._handle:
            rc = self._lib.g2s_cache_get_batch(
                self._handle,
                indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(indices),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if rc != 0:
                raise IndexError(f"native get_batch failed rc={rc}")
        else:
            recs = self._mm[indices]
            if self.dtype_code == 0:
                out[:] = recs.astype(np.float32) * (2.0 / 255.0) - 1.0
            else:
                out[:] = recs
        return out.reshape((len(indices),) + self.record_shape)

    def prefetch(self, indices):
        if self._handle:
            indices = np.asarray(indices, np.int64)
            self._lib.g2s_cache_prefetch(
                self._handle,
                indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(indices))

    def close(self):
        if self._handle:
            self._lib.g2s_cache_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def build_image_cache(dataset, cache_path, image_size):
    """One-time: decode every image of an ImageDataset-like object into a
    uint8 cache file (records are CHW uint8 in [0, 255])."""
    n = len(dataset)
    with open(cache_path, "wb") as f:
        for i in range(n):
            img = np.asarray(dataset[i])  # (C,H,W) float [-1,1]
            u8 = np.clip((img + 1.0) * 0.5 * 255.0 + 0.5, 0,
                         255).astype(np.uint8)
            f.write(u8.tobytes())
    return TensorCache(cache_path, n, (3, image_size, image_size), "uint8")
