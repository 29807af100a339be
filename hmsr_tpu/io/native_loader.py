"""ctypes bindings for the native burst loader (native/burst_loader.cpp).

Provides the multithreaded C++ implementation of the raw ingestion hot loop
(per-CFA black-level/white-balance normalization, reference
utils_dng.py:150-160) and MIPI RAW10/RAW12 unpacking. The library is built
on first use with g++; every entry point has a NumPy fallback so the
framework works without a toolchain.
"""

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libburst.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "burst_loader.cpp")

_lib = None
_lib_tried = False


def _load():
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if (not os.path.exists(_SO_PATH) or
                os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC_PATH)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 _SRC_PATH, "-o", _SO_PATH],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO_PATH)
        lib.hmsr_normalize_burst.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.hmsr_unpack_raw10.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int64]
        lib.hmsr_unpack_raw12.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int64]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def have_native():
    return _load() is not None


def normalize_burst(frames_u16, cfa, black_levels, white_level, white_balance,
                    threads=0):
    """uint16 (n, h, w) raw stack -> normalized float32 (n, h, w).

    out[y, x] = (in - black[c]) / (white - black[c]) * wb[c]/wb[1]
    with c the CFA channel at (y%2, x%2) — the reference ingestion math.
    """
    frames_u16 = np.ascontiguousarray(frames_u16, dtype=np.uint16)
    n, h, w = frames_u16.shape
    cfa = np.asarray(cfa, dtype=np.int32).reshape(4)
    nc = int(cfa.max()) + 1
    black = np.asarray(black_levels, dtype=np.float32)[:nc]
    wb = np.asarray(white_balance, dtype=np.float32)
    gain = (wb[:nc] / wb[1]) / (float(white_level) - black)

    lib = _load()
    if lib is None:
        out = (frames_u16.astype(np.float32) - 0.0)
        for i in range(2):
            for j in range(2):
                c = int(cfa[i * 2 + j])
                out[:, i::2, j::2] = (frames_u16[:, i::2, j::2].astype(np.float32)
                                      - black[c]) * gain[c]
        return out

    out = np.empty((n, h, w), np.float32)
    if threads <= 0:
        threads = os.cpu_count() or 1
    lib.hmsr_normalize_burst(
        frames_u16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, h, w,
        cfa.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        np.ascontiguousarray(black).ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.ascontiguousarray(gain).ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        threads)
    return out


def unpack_raw10(packed, n_pixels):
    """MIPI RAW10 packed bytes -> uint16 pixels (n_pixels multiple of 4)."""
    packed = np.ascontiguousarray(packed, dtype=np.uint8)
    groups = n_pixels // 4
    lib = _load()
    out = np.empty(n_pixels, np.uint16)
    if lib is None:
        p = packed[:groups * 5].reshape(groups, 5).astype(np.uint16)
        out = np.stack([(p[:, k] << 2) | ((p[:, 4] >> (2 * k)) & 0x3)
                        for k in range(4)], axis=1).reshape(-1)
        return out.astype(np.uint16)
    lib.hmsr_unpack_raw10(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), groups)
    return out


def unpack_raw12(packed, n_pixels):
    """MIPI RAW12 packed bytes -> uint16 pixels (n_pixels multiple of 2)."""
    packed = np.ascontiguousarray(packed, dtype=np.uint8)
    groups = n_pixels // 2
    lib = _load()
    out = np.empty(n_pixels, np.uint16)
    if lib is None:
        p = packed[:groups * 3].reshape(groups, 3).astype(np.uint16)
        out = np.stack([(p[:, 0] << 4) | (p[:, 2] & 0xF),
                        (p[:, 1] << 4) | (p[:, 2] >> 4)], axis=1).reshape(-1)
        return out.astype(np.uint16)
    lib.hmsr_unpack_raw12(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), groups)
    return out
