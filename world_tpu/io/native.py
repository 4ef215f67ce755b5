"""ctypes bindings for the native I/O library (world_tpu/native).

Builds lazily with g++ on first use; every entry point has a pure-Python
fallback so the package works without a toolchain.  The native path is
the corpus feeder: a multithreaded wav batch loader that packs padded
float32 batches without holding the GIL.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libworldio.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "worldio.cpp")
_lock = threading.Lock()
_lib = None
_tried = False


class _WioWav(ctypes.Structure):
    _fields_ = [("samples", ctypes.POINTER(ctypes.c_double)),
                ("length", ctypes.c_int64),
                ("fs", ctypes.c_int32),
                ("nbit", ctypes.c_int32)]


def _build():
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
         _SRC_PATH, "-o", _SO_PATH],
        check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO_PATH) or (
                    os.path.getmtime(_SO_PATH)
                    < os.path.getmtime(_SRC_PATH)):
                _build()
            lib = ctypes.CDLL(_SO_PATH)
        except (OSError, subprocess.CalledProcessError):
            return None
        lib.wio_read_wav.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(_WioWav)]
        lib.wio_read_wav.restype = ctypes.c_int
        lib.wio_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
        lib.wio_write_wav.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_double),
                                      ctypes.c_int64, ctypes.c_int32]
        lib.wio_write_wav.restype = ctypes.c_int
        lib.wio_load_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.wio_load_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def wavread(path):
    """Native wav read; falls back to the Python reader."""
    lib = get_lib()
    if lib is None:
        from .audio import wavread as py_wavread
        return py_wavread(path)
    w = _WioWav()
    rc = lib.wio_read_wav(path.encode(), ctypes.byref(w))
    if rc != 0:
        raise ValueError(f"wio_read_wav failed ({rc}) for {path}")
    x = np.ctypeslib.as_array(w.samples, shape=(w.length,)).copy()
    lib.wio_free(w.samples)
    return x, int(w.fs), int(w.nbit)


def wavwrite(x, fs, path):
    lib = get_lib()
    if lib is None:
        from .audio import wavwrite as py_wavwrite
        return py_wavwrite(x, fs, path)
    x = np.ascontiguousarray(x, np.float64)
    rc = lib.wio_write_wav(
        path.encode(), x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(x), fs)
    if rc != 0:
        raise OSError(f"wio_write_wav failed ({rc}) for {path}")


def load_batch(paths, bucket_len, n_threads=None):
    """Read ``paths`` into a padded (len(paths), bucket_len) float32
    batch.  Returns (batch, lengths, fs, failed_indices)."""
    lib = get_lib()
    if lib is None:
        from .audio import wavread as py_wavread
        out = np.zeros((len(paths), bucket_len), np.float32)
        lengths = np.zeros(len(paths), np.int64)
        failed, fs = [], 0
        for i, p in enumerate(paths):
            try:
                x, f, _ = py_wavread(p)
            except (ValueError, OSError):
                failed.append(i)
                continue
            if fs == 0:
                fs = f
            if f != fs:
                failed.append(i)
                continue
            n = min(len(x), bucket_len)
            out[i, :n] = x[:n]
            lengths[i] = len(x)
        return out, lengths, fs, failed
    if n_threads is None:
        n_threads = min(16, os.cpu_count() or 1)
    out = np.zeros((len(paths), bucket_len), np.float32)
    lengths = np.zeros(len(paths), np.int64)
    fs = ctypes.c_int32(0)
    joined = ";".join(paths).encode()
    lib.wio_load_batch(
        joined, len(paths), bucket_len,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.byref(fs), n_threads)
    failed = [i for i in range(len(paths)) if lengths[i] == 0]
    return out, lengths, int(fs.value), failed
