"""ctypes wrapper + on-demand build of libqmha_core.so."""

from __future__ import annotations

import ctypes
import dataclasses
import pathlib
import shutil
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
_SRC_DIR = _REPO_ROOT / "native"
_BUILD_DIR = _SRC_DIR / "build"
_LIB_PATH = _BUILD_DIR / "libqmha_core.so"

_lock = threading.Lock()
_core: Optional["NativeCore"] = None
_load_error: Optional[str] = None


def _build() -> Optional[str]:
    """Build the shared library with g++ (same command as `make native`)."""
    cxx = shutil.which("g++") or shutil.which("c++")
    if cxx is None:
        return "no C++ compiler on PATH"
    src = _SRC_DIR / "qmha_core.cpp"
    if not src.exists():
        return f"missing source {src}"
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    cmd = [cxx, "-O3", "-std=c++17", "-Wall", "-fPIC", "-pthread", "-shared",
           "-o", str(_LIB_PATH), str(src)]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        return f"build failed: {proc.stderr[-2000:]}"
    return None


class NativeCore:
    """Typed handle over the C ABI in native/qmha_core.h."""

    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        c = ctypes
        fp = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        dp = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")

        lib.qmha_version.restype = c.c_int
        lib.qmha_cpu_mha.argtypes = [fp, fp, fp, fp, c.c_int64, c.c_int32,
                                     c.c_int32, c.c_int32, c.c_float,
                                     c.c_int32, c.c_int32, c.c_int32,
                                     c.c_float, c.c_int32]
        lib.qmha_cpu_mha.restype = c.c_int
        lib.qmha_cpu_mha_head.argtypes = [fp, fp, fp, fp, c.c_void_p,
                                          c.c_void_p, c.c_int64, c.c_int32,
                                          c.c_int32, c.c_int32, c.c_int32,
                                          c.c_float]
        lib.qmha_cpu_mha_head.restype = c.c_int
        lib.qmha_rope.argtypes = [fp, c.c_int64, c.c_int32, c.c_float]
        lib.qmha_verify.argtypes = [fp, fp, c.c_int64, c.c_double, c.c_double, dp]
        lib.qmha_verify.restype = c.c_int
        lib.qmha_quantize_int8.argtypes = [fp, c.c_int64, c.c_int64, c.c_int64,
                                           c.c_float, i8p, fp]
        lib.qmha_quantize_int8.restype = c.c_int
        lib.qmha_dequantize_int8.argtypes = [i8p, fp, c.c_int64, c.c_int64,
                                             c.c_int64, fp]
        lib.qmha_dequantize_int8.restype = c.c_int

    @property
    def version(self) -> int:
        return self._lib.qmha_version()

    def cpu_mha(self, q, k, v, num_heads: int, *, use_rope: bool = True,
                rope_theta: float = 10000.0, causal: bool = False,
                window: int = 0, sinks: int = 0,
                sm_scale: Optional[float] = None, n_threads: int = 0) -> np.ndarray:
        q, k, v = (np.ascontiguousarray(x, np.float32) for x in (q, k, v))
        n, d_model = q.shape
        out = np.empty_like(q)
        rc = self._lib.qmha_cpu_mha(
            q, k, v, out, n, d_model, num_heads, int(use_rope),
            float(rope_theta), int(causal), int(window), int(sinks),
            float(sm_scale if sm_scale is not None else -1.0), n_threads)
        if rc != 0:
            raise ValueError(f"qmha_cpu_mha failed with code {rc}")
        return out

    def rope(self, x, theta: float = 10000.0) -> np.ndarray:
        x = np.ascontiguousarray(x, np.float32).copy()
        seq, d = x.shape
        self._lib.qmha_rope(x, seq, d, float(theta))
        return x

    def verify(self, got, ref, abs_tol: float = 1e-3, rel_tol: float = 1e-3):
        got = np.ascontiguousarray(got, np.float32).ravel()
        ref = np.ascontiguousarray(ref, np.float32).ravel()
        if got.size != ref.size:
            raise ValueError("size mismatch")
        stats = np.zeros(6, np.float64)
        ok = self._lib.qmha_verify(got, ref, got.size, abs_tol, rel_tol, stats)
        return NativeReport(
            ok=(ok == 0), max_abs=float(stats[0]), mean_abs=float(stats[1]),
            max_rel=float(stats[2]), n_mismatch=int(stats[3]),
            n_nonfinite=int(stats[4]), first_bad_index=int(stats[5]))

    def quantize_int8(self, x, tile_rows: int, scale_clamp: float = 1e-8):
        x = np.ascontiguousarray(x, np.float32)
        rows, cols = x.shape
        n_tiles = -(-rows // tile_rows)
        out = np.empty((rows, cols), np.int8)
        scales = np.empty(n_tiles, np.float32)
        rc = self._lib.qmha_quantize_int8(x, rows, cols, tile_rows,
                                          scale_clamp, out, scales)
        if rc != 0:
            raise ValueError(f"qmha_quantize_int8 failed with code {rc}")
        return out, scales

    def dequantize_int8(self, x, scales, tile_rows: int) -> np.ndarray:
        x = np.ascontiguousarray(x, np.int8)
        scales = np.ascontiguousarray(scales, np.float32)
        rows, cols = x.shape
        out = np.empty((rows, cols), np.float32)
        rc = self._lib.qmha_dequantize_int8(x, scales, rows, cols, tile_rows, out)
        if rc != 0:
            raise ValueError(f"qmha_dequantize_int8 failed with code {rc}")
        return out


@dataclasses.dataclass(frozen=True)
class NativeReport:
    ok: bool
    max_abs: float
    mean_abs: float
    max_rel: float
    n_mismatch: int
    n_nonfinite: int
    first_bad_index: int


def load(rebuild: bool = False) -> Optional[NativeCore]:
    """Load (building if needed) the native core; None if unavailable."""
    global _core, _load_error
    with _lock:
        if _core is not None and not rebuild:
            return _core
        src = _SRC_DIR / "qmha_core.cpp"
        stale = (not _LIB_PATH.exists() or
                 (src.exists() and src.stat().st_mtime > _LIB_PATH.stat().st_mtime))
        if rebuild or stale:
            err = _build()
            if err is not None:
                _load_error = err
                return None
        try:
            _core = NativeCore(ctypes.CDLL(str(_LIB_PATH)))
        except OSError as e:
            _load_error = str(e)
            return None
        _load_error = None
        return _core


def available() -> bool:
    return load() is not None


def load_error() -> Optional[str]:
    return _load_error


# Module-level conveniences.
def cpu_mha(q, k, v, num_heads, **kw):
    core = load()
    if core is None:
        raise RuntimeError(f"native core unavailable: {_load_error}")
    return core.cpu_mha(q, k, v, num_heads, **kw)


def verify(got, ref, abs_tol: float = 1e-3, rel_tol: float = 1e-3):
    core = load()
    if core is None:
        raise RuntimeError(f"native core unavailable: {_load_error}")
    return core.verify(got, ref, abs_tol, rel_tol)


def quantize_int8(x, tile_rows: int, scale_clamp: float = 1e-8):
    core = load()
    if core is None:
        raise RuntimeError(f"native core unavailable: {_load_error}")
    return core.quantize_int8(x, tile_rows, scale_clamp)
