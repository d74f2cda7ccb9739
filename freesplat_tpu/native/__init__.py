"""Native (C++) data-loading runtime, bound via ctypes.

Builds ``dataloader.cpp`` on first use (g++ -O3 -shared, linked against
libjpeg) and caches the shared object next to the source.  Falls back
gracefully (``available() -> False``) when the toolchain or libjpeg is
missing, in which case callers use the PIL path.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SRC = _DIR / "dataloader.cpp"
_SO = _DIR / "_dataloader.so"
_lib = None
_build_error: str | None = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(_SO), "-ljpeg", "-lpng", "-pthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_SO))
        lib.fs_load_batch.restype = ctypes.c_int
        lib.fs_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        lib.fs_load_depth_batch.restype = ctypes.c_int
        lib.fs_load_depth_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    except Exception as exc:  # missing toolchain / libjpeg
        _build_error = str(exc)
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def load_jpeg_batch(
    paths: list[str], out_h: int, out_w: int
) -> np.ndarray:
    """Decode + Lanczos-resize JPEGs in parallel -> (n, h, w, 3) f32 [0,1]."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    rc = lib.fs_load_batch(
        arr, n, out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise RuntimeError(f"native loader failed on one of {n} files")
    return out


def load_depth_batch(
    paths: list[str], out_h: int, out_w: int
) -> np.ndarray:
    """Decode + PIL-BICUBIC-resize grayscale depth PNGs in parallel ->
    (n, h, w) f32 in RAW sample units (e.g. ScanNet millimeters)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    n = len(paths)
    out = np.empty((n, out_h, out_w), np.float32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    rc = lib.fs_load_depth_batch(
        arr, n, out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise RuntimeError(f"native depth loader failed on one of {n} files")
    return out
