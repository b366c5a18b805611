"""ctypes bindings for the native host-staging runtime (native/asr_host.cc).

Compiles the C++ staging library on first use (g++, libjpeg, libpng — all in
the base image) and caches the .so next to the source. Falls back cleanly:
``available()`` returns False when the toolchain or libraries are missing and
callers keep using the PIL path (data/io.py).

Surface:
  load_image_native(path, image_size, normalize, is_label) -> np.float32 HWC
  ImageRing(paths, image_size, ...)  — threaded in-order decode-ahead ring
"""

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "asr_host.cc")
_SO = os.path.join(_REPO, "native", "build", "libasr_host.so")

_lib = None
_lib_lock = threading.Lock()
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = ["g++", "-O2", "-fPIC", "-shared", "-std=c++17", "-pthread",
           "-o", _SO, _SRC, "-ljpeg", "-lpng"]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        return f"{' '.join(cmd)} failed:\n{proc.stderr[-2000:]}"
    return None


def _get_lib():
    global _lib, _build_error
    with _lib_lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                err = _build()
                if err:
                    _build_error = err
                    return None
            lib = ctypes.CDLL(_SO)
        except OSError as exc:
            _build_error = str(exc)
            return None
        lib.asr_load_image.restype = ctypes.c_int
        lib.asr_load_image.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        lib.asr_ring_create.restype = ctypes.c_void_p
        lib.asr_ring_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.asr_ring_create2.restype = ctypes.c_void_p
        lib.asr_ring_create2.argtypes = lib.asr_ring_create.argtypes + [
            ctypes.c_int]
        lib.asr_ring_next.restype = ctypes.c_int
        lib.asr_ring_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int)]
        lib.asr_ring_destroy.restype = None
        lib.asr_ring_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _get_lib() is not None


def build_error() -> Optional[str]:
    _get_lib()
    return _build_error


def load_image_native(path: str, image_size: Tuple[int, int],
                      normalize: bool = True,
                      is_label: bool = False) -> np.ndarray:
    """Decode+resize one image natively; same contract as data.io.load_image
    (float32 HWC, bilinear for photos, nearest for label PNGs)."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    h, w = image_size
    c = 1 if is_label else 3
    out = np.empty((h, w, c), np.float32)
    rc = lib.asr_load_image(
        path.encode(), h, w, int(is_label), int(normalize),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 1:
        raise IOError(f"native decode failed for {path}")
    return out


class ImageRing:
    """In-order decode-ahead over a path list: a worker pool decodes+resizes
    into a bounded slot ring in C++; iteration yields (index, array) in the
    original order while later files decode in the background."""

    def __init__(self, paths: Sequence[str], image_size: Tuple[int, int],
                 normalize: bool = True, is_label: bool = False,
                 n_threads: int = 4, capacity: int = 8,
                 dtype: str = "float32"):
        """dtype="bfloat16" delivers frames already rounded to bf16 in C++
        (round-to-nearest-even, matching XLA's convert): no numpy-side cast,
        half the host->device bytes — the serving path's input format."""
        lib = _get_lib()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_build_error}")
        self._lib = lib
        self._paths = [os.fsencode(p) for p in paths]
        self._n = len(self._paths)
        self._shape = (image_size[0], image_size[1], 1 if is_label else 3)
        if dtype == "bfloat16":
            import ml_dtypes

            self._dtype = np.dtype(ml_dtypes.bfloat16)
        elif dtype == "float32":
            self._dtype = np.dtype(np.float32)
        else:
            raise ValueError(f"unsupported ring dtype {dtype!r}")
        arr = (ctypes.c_char_p * self._n)(*self._paths)
        self._keepalive = arr
        self._handle = lib.asr_ring_create2(
            arr, self._n, image_size[0], image_size[1], int(is_label),
            int(normalize), int(n_threads), int(capacity),
            int(dtype == "bfloat16"))

    def __iter__(self):
        idx = ctypes.c_int(0)
        for _ in range(self._n):
            out = np.empty(self._shape, self._dtype)
            rc = self._lib.asr_ring_next(
                self._handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.byref(idx))
            if rc == 0:
                return
            if rc < 0:
                raise IOError(f"native decode failed at index {idx.value}")
            yield idx.value, out

    def close(self):
        if self._handle is not None:
            self._lib.asr_ring_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
