"""ctypes bindings for the native (C++) host-side data tier.

The TPU compute path is JAX/XLA/Pallas; this module binds the *runtime*
side of the data pipeline — toy-distribution batch samplers and epoch
shuffling implemented in C++ (native/sampler.cpp) behind a minimal
``extern "C"`` ABI.  The numpy implementations in nf_tpu/data/toy.py stay
the reference and the fallback: everything here is optional and the
loader degrades gracefully when no compiler is present.

Build model: the shared library is compiled on demand with ``g++ -O3``
into ``<repo>/build/`` and cached by source mtime — no setuptools, no
pybind11 (not in this image), just the stable C ABI via ctypes.
"""
from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "sampler.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "build")
_SO = os.path.join(_BUILD_DIR, "libnf_tpu_sampler.so")

_lock = threading.Lock()
_lib = None
_load_failed = False


def _needs_build() -> bool:
    if not os.path.exists(_SO):
        return True
    try:
        return os.path.getmtime(_SO) < os.path.getmtime(_SRC)
    except OSError:
        return True


def _build() -> bool:
    gxx = shutil.which("g++")
    if gxx is None or not os.path.exists(_SRC):
        return False
    os.makedirs(_BUILD_DIR, exist_ok=True)
    tmp = _SO + ".tmp"
    cmd = [gxx, "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, OSError):
        return False
    os.replace(tmp, _SO)
    return True


def _configure(lib: ctypes.CDLL) -> ctypes.CDLL:
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    for name in ("sample_circles", "sample_moons", "sample_normals",
                 "sample_swiss", "sample_s_curve"):
        fn = getattr(lib, name)
        fn.argtypes = [f32p, ctypes.c_int64, ctypes.c_uint64]
        fn.restype = None
    lib.shuffled_indices.argtypes = [i64p, ctypes.c_int64, ctypes.c_uint64]
    lib.shuffled_indices.restype = None
    lib.gather_rows.argtypes = [f32p, f32p, i64p, ctypes.c_int64,
                                ctypes.c_int64]
    lib.gather_rows.restype = None
    lib.nf_tpu_native_abi_version.argtypes = []
    lib.nf_tpu_native_abi_version.restype = ctypes.c_int
    return lib


def load():
    """Build (if needed) and load the native library; returns the
    configured ``ctypes.CDLL`` or raises ``OSError``."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _load_failed:
            raise OSError("native data tier unavailable")
        if _needs_build() and not _build():
            _load_failed = True
            raise OSError("native data tier build failed")
        try:
            _lib = _configure(ctypes.CDLL(_SO))
        except OSError:
            _load_failed = True
            raise
        if _lib.nf_tpu_native_abi_version() != 1:
            _lib = None
            _load_failed = True
            raise OSError("native data tier ABI mismatch")
        return _lib


def available() -> bool:
    """True if the native library is loadable (building it if needed)."""
    try:
        load()
        return True
    except OSError:
        return False


def _sampler(c_name: str, event: int):
    def fn(n: int, seed: int) -> np.ndarray:
        lib = load()
        out = np.empty((n, event), dtype=np.float32)
        getattr(lib, c_name)(
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(n), ctypes.c_uint64(seed & (2**64 - 1)))
        return out
    fn.__name__ = "native_" + c_name.removeprefix("sample_")
    return fn


native_circles = _sampler("sample_circles", 2)
native_moons = _sampler("sample_moons", 2)
native_normals = _sampler("sample_normals", 2)
native_swiss = _sampler("sample_swiss", 3)
native_s_curve = _sampler("sample_s_curve", 3)

NATIVE_SAMPLERS = {
    "circles": native_circles,
    "moons": native_moons,
    "normals": native_normals,
    "swiss": native_swiss,
    "s_curve": native_s_curve,
}


def shuffled_indices(n: int, seed: int) -> np.ndarray:
    """Fisher–Yates permutation of [0, n) from the native tier."""
    lib = load()
    out = np.empty((n,), dtype=np.int64)
    lib.shuffled_indices(out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                         ctypes.c_int64(n),
                         ctypes.c_uint64(seed & (2**64 - 1)))
    return out


def gather_rows(src: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """dst[i] = src[idx[i]] via the native memcpy gather (2D float32)."""
    lib = load()
    src = np.ascontiguousarray(src, dtype=np.float32)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    flat = src.reshape(src.shape[0], -1)
    dst = np.empty((idx.shape[0], flat.shape[1]), dtype=np.float32)
    lib.gather_rows(dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                    ctypes.c_int64(idx.shape[0]),
                    ctypes.c_int64(flat.shape[1]))
    return dst.reshape((idx.shape[0],) + src.shape[1:])
