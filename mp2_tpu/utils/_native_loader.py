"""Build-and-load for the native host library (ctypes, no pybind11).

Compiles native/mp2_native.cc on first use (g++ -O3 -shared -fPIC) into
native/build/; returns None if no toolchain, letting callers fall back to
pure python.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "mp2_native.cc")
_OUT_DIR = os.path.join(_REPO, "native", "build")
_SO = os.path.join(_OUT_DIR, "libmp2native.so")


class Native:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.mp2_keccak256.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint64,
            ctypes.c_char_p,
        ]
        lib.mp2_keccak256_batch.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_uint64,
            ctypes.c_char_p,
        ]
        lib.mp2_gl_mul.argtypes = [ctypes.c_uint64, ctypes.c_uint64]
        lib.mp2_gl_mul.restype = ctypes.c_uint64

    def keccak256(self, data: bytes) -> bytes:
        out = ctypes.create_string_buffer(32)
        self._lib.mp2_keccak256(data, len(data), out)
        return out.raw

    def keccak256_batch(self, items) -> list:
        blob = b"".join(items)
        offs = (ctypes.c_uint64 * (len(items) + 1))()
        pos = 0
        for i, it in enumerate(items):
            offs[i] = pos
            pos += len(it)
        offs[len(items)] = pos
        out = ctypes.create_string_buffer(32 * len(items))
        self._lib.mp2_keccak256_batch(blob, offs, len(items), out)
        return [out.raw[32 * i : 32 * i + 32] for i in range(len(items))]

    def gl_mul(self, a: int, b: int) -> int:
        return int(self._lib.mp2_gl_mul(a, b))


def load() -> Optional[Native]:
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        os.makedirs(_OUT_DIR, exist_ok=True)
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        return Native(ctypes.CDLL(_SO))
    except OSError:
        return None
