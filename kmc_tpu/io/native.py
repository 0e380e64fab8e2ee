"""ctypes bindings to the native I/O runtime (native/kmcio.cpp).

Builds libkmcio.so on first use (g++, cached under native/build/); every
entry point falls back to the pure-Python writers when the toolchain or
library is unavailable, so the framework never hard-depends on it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "kmcio.cpp")
_SO = os.path.join(_ROOT, "native", "build", "libkmcio.so")

_lib = None
_lock = threading.Lock()


def ensure_built() -> bool:
    """Compile libkmcio.so if missing; returns availability."""
    global _lib
    with _lock:
        if _lib is not None:
            return True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            os.makedirs(os.path.dirname(_SO), exist_ok=True)
            try:
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC,
                     "-lpthread"],
                    check=True, capture_output=True, timeout=120,
                )
            except (OSError, subprocess.SubprocessError):
                return False
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return False
        lib.kmcio_format_gro.restype = ctypes.c_long
        lib.kmcio_format_gro.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_char_p, ctypes.c_long,
        ]
        lib.kmcio_format_cpt.restype = ctypes.c_long
        lib.kmcio_format_cpt.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_long, ctypes.c_char_p, ctypes.c_long,
        ]
        lib.kmcio_writer_open.restype = ctypes.c_void_p
        lib.kmcio_writer_open.argtypes = [ctypes.c_char_p]
        lib.kmcio_writer_append.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long
        ]
        lib.kmcio_writer_pending.restype = ctypes.c_long
        lib.kmcio_writer_pending.argtypes = [ctypes.c_void_p]
        lib.kmcio_writer_close.restype = ctypes.c_long
        lib.kmcio_writer_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return True


def available() -> bool:
    return ensure_built()


def format_gro(pos: np.ndarray, n_a: int, n_b: int, t_ns: float,
               box) -> bytes:
    assert ensure_built()
    pos = np.ascontiguousarray(pos, np.float32)
    cap = (n_a * 4 + n_b * 3) * 64 + 256
    buf = ctypes.create_string_buffer(cap)
    n = _lib.kmcio_format_gro(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_a, n_b, t_ns, box[0], box[1], box[2], buf, cap,
    )
    if n < 0:
        raise RuntimeError("kmcio buffer too small")
    return buf.raw[:n]


def format_cpt(pos: np.ndarray, a_top: np.ndarray, b_top: np.ndarray,
               counters, n_a: int, n_b: int) -> bytes:
    """counters = (bond_num, rl, cis, mono_cis, max_complex, step)."""
    assert ensure_built()
    pos = np.ascontiguousarray(pos, np.float32)
    a_top = np.ascontiguousarray(a_top, np.int32)
    b_top = np.ascontiguousarray(b_top, np.int32)
    cap = (n_a * 17 + n_b * 12 + 8) * 48
    buf = ctypes.create_string_buffer(cap)
    n = _lib.kmcio_format_cpt(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_a, n_b,
        a_top.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b_top.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        *[int(c) for c in counters], buf, cap,
    )
    if n < 0:
        raise RuntimeError("kmcio buffer too small")
    return buf.raw[:n]


class AsyncWriter:
    """Background-thread append writer; drop-in for open(path,'ab') usage."""

    def __init__(self, path: str):
        assert ensure_built()
        self._h = _lib.kmcio_writer_open(path.encode())
        if not self._h:
            raise OSError(f"kmcio_writer_open failed for {path}")

    def append(self, data: bytes) -> None:
        _lib.kmcio_writer_append(self._h, data, len(data))

    def pending(self) -> int:
        return _lib.kmcio_writer_pending(self._h)

    def close(self) -> int:
        h, self._h = self._h, None
        return _lib.kmcio_writer_close(h) if h else 0

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
