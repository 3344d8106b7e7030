"""Native (C++) converters, loaded via ctypes with on-demand compilation.

The native runtime layer: GGUF block decode + kernel packing at memory
bandwidth instead of numpy speed (the role the reference's C quant code
plays at model-load time). Falls back to the numpy reference implementation
when no compiler is available; outputs are bit-exact either way
(tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(__file__)
_SRCS = [os.path.join(_DIR, "convert.cpp"), os.path.join(_DIR, "tokenize.cpp")]
_LIB = os.path.join(_DIR, f"libprima_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           "-o", _LIB] + _SRCS
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib():
    """The loaded shared library, building it on first use; None if
    unavailable (numpy fallback paths take over)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("PRIMA_NO_NATIVE") == "1":
            return None
        # PRIMA_NATIVE_LIB: load a prebuilt (e.g. TSan/ASan-instrumented)
        # library instead — the sanitizer tier (make native-tsan)
        lib_path = os.environ.get("PRIMA_NATIVE_LIB", _LIB)
        if lib_path == _LIB and (not os.path.exists(_LIB) or any(
                os.path.getmtime(_LIB) < os.path.getmtime(s) for s in _SRCS)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(lib_path)
        except OSError:
            return None
        i64, u8p, i8p, f32p, ci = (ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
                                   ctypes.POINTER(ctypes.c_int8),
                                   ctypes.POINTER(ctypes.c_float), ctypes.c_int)
        lib.prima_conv_q4k.argtypes = [u8p, i64, i64, u8p, i8p, i8p, f32p, f32p, ci, ci]
        lib.prima_conv_q4_0.argtypes = [u8p, i64, i64, u8p, f32p, ci]
        lib.prima_conv_q6k.argtypes = [u8p, i64, i64, i8p, i8p, f32p, ci]
        lib.prima_conv_q8_0.argtypes = [u8p, i64, i64, i8p, f32p, ci]
        i64p, i32p = ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)
        lib.prima_tok_new.argtypes = [u8p, i64p, i64, f32p, i8p,
                                      u8p, i64p, i64, i32p]
        lib.prima_tok_new.restype = ctypes.c_void_p
        lib.prima_tok_free.argtypes = [ctypes.c_void_p]
        lib.prima_spm_encode.argtypes = [ctypes.c_void_p, u8p, i64, i32p, i64]
        lib.prima_spm_encode.restype = i64
        lib.prima_bpe_encode_words.argtypes = [ctypes.c_void_p, u8p, i64p,
                                               i64, ctypes.c_int32, i32p, i64]
        lib.prima_bpe_encode_words.restype = i64
        _lib = lib
        return _lib


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def native_convert(raw: np.ndarray, ggml_type, k: int, kperm: bool,
                   packed: bool = False):
    """raw (rows, row_bytes) -> (qs, scales, mins|None, d|None, dmin|None)
    in uniform layout (compact grouped codes for K-quants; `packed` emits
    the 4.5-bit native footprint for Q4_K — see host_pack), optionally
    kernel-permuted. Returns None if this type has no native path.
    """
    from ..gguf.constants import GGMLType

    lib = get_lib()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw)
    if raw.ndim == 1:
        raw = raw.reshape(1, -1)
    rows = raw.shape[0]
    kp = 1 if kperm else 0
    if ggml_type == GGMLType.Q4_K:
        qs = np.empty((rows, k // 2), np.uint8)
        if packed and kperm:
            sc = np.empty((rows, k // 32), np.uint8)
            mn = np.empty((rows, k // 64), np.uint8)
            d = np.empty((rows, k // 256), np.int32)
            lib.prima_conv_q4k(_ptr(raw, ctypes.c_uint8), rows, k,
                               _ptr(qs, ctypes.c_uint8), _ptr(sc, ctypes.c_int8),
                               _ptr(mn, ctypes.c_int8), _ptr(d, ctypes.c_float),
                               None, kp, 1)
            return qs, sc, mn, d, None
        sc = np.empty((rows, k // 32), np.int8)
        mn = np.empty((rows, k // 32), np.int8)
        d = np.empty((rows, k // 256), np.float32)
        dmin = np.empty((rows, k // 256), np.float32)
        lib.prima_conv_q4k(_ptr(raw, ctypes.c_uint8), rows, k,
                           _ptr(qs, ctypes.c_uint8), _ptr(sc, ctypes.c_int8),
                           _ptr(mn, ctypes.c_int8), _ptr(d, ctypes.c_float),
                           _ptr(dmin, ctypes.c_float), kp, 0)
        return qs, sc, mn, d, dmin
    if ggml_type == GGMLType.Q4_0:
        qs = np.empty((rows, k // 2), np.uint8)
        sc = np.empty((rows, k // 32), np.float32)
        lib.prima_conv_q4_0(_ptr(raw, ctypes.c_uint8), rows, k,
                            _ptr(qs, ctypes.c_uint8), _ptr(sc, ctypes.c_float), kp)
        return qs, sc, None, None, None
    if ggml_type == GGMLType.Q6_K:
        qs = np.empty((rows, k), np.int8)
        sc = np.empty((rows, k // 16), np.int8)
        d = np.empty((rows, k // 256), np.float32)
        lib.prima_conv_q6k(_ptr(raw, ctypes.c_uint8), rows, k,
                           _ptr(qs, ctypes.c_int8), _ptr(sc, ctypes.c_int8),
                           _ptr(d, ctypes.c_float), kp)
        return qs, sc, None, d, None
    if ggml_type == GGMLType.Q8_0:
        qs = np.empty((rows, k), np.int8)
        sc = np.empty((rows, k // 32), np.float32)
        lib.prima_conv_q8_0(_ptr(raw, ctypes.c_uint8), rows, k,
                            _ptr(qs, ctypes.c_int8), _ptr(sc, ctypes.c_float), kp)
        return qs, sc, None, None, None
    return None
