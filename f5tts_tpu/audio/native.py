"""ctypes bridge to the native audio ops (csrc/audioops.cpp).

Compiled on demand with the system compiler into the package build dir and
cached; every entry point has a numpy fallback, so the framework never
requires a toolchain at runtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lib = None
_lock = threading.Lock()
_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc", "audioops.cpp")
_OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_libf5audioops.so")


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if not os.path.exists(_OUT) or os.path.getmtime(_OUT) < os.path.getmtime(_SRC):
                for cc in ("c++", "g++", "cc"):
                    try:
                        subprocess.run(
                            [cc, "-O3", "-shared", "-fPIC", "-o", _OUT, _SRC],
                            check=True, capture_output=True, timeout=60,
                        )
                        break
                    except Exception:
                        continue
            lib = ctypes.CDLL(_OUT)
            lib.encode_pcm16.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.POINTER(ctypes.c_int16)]
            lib.crossfade_pair.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ]
            lib.crossfade_pair.restype = ctypes.c_int64
            lib.rms.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
            lib.rms.restype = ctypes.c_float
            _lib = lib
        except Exception:
            _lib = False
    return _lib


def available() -> bool:
    return bool(_load())


def encode_pcm16(audio: np.ndarray) -> np.ndarray:
    lib = _load()
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    if not lib:
        return np.rint(np.clip(audio, -1.0, 1.0) * 32767.0).astype(np.int16)
    out = np.empty(audio.shape, np.int16)
    lib.encode_pcm16(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), audio.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
    )
    return out


def crossfade_pair(a: np.ndarray, b: np.ndarray, n_fade: int) -> np.ndarray:
    lib = _load()
    a = np.ascontiguousarray(a, dtype=np.float32)
    b = np.ascontiguousarray(b, dtype=np.float32)
    n_fade = int(min(n_fade, len(a), len(b)))
    if not lib:
        if n_fade <= 0:
            return np.concatenate([a, b])
        fade_out = np.linspace(1.0, 0.0, n_fade, dtype=np.float32)
        fade_in = np.linspace(0.0, 1.0, n_fade, dtype=np.float32)
        overlap = a[-n_fade:] * fade_out + b[:n_fade] * fade_in
        return np.concatenate([a[:-n_fade], overlap, b[n_fade:]])
    dst = np.empty(len(a) + len(b) - max(n_fade, 0), np.float32)
    n = lib.crossfade_pair(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(a),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(b),
        n_fade, dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return dst[:n]
