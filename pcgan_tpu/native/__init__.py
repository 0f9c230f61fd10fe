"""Native host-runtime components (C++), lazily built and ctypes-bound.

The reference's host runtime is torch's DataLoader: N worker *processes*
each running PIL decode, paying fork + pickle + page-cache duplication per
batch (SURVEY.md SS4.1 "PROCESS BOUNDARY"). The TPU-native replacement is an
in-process C++ thread pool (``jpeg_decoder.cc``): ctypes releases the GIL
for the whole batch, libjpeg writes straight into one contiguous numpy
buffer, and the only Python cost per batch is a single FFI call.

Build-on-first-use: ``g++ -O2 -shared -fPIC jpeg_decoder.cc -ljpeg``; the
.so is cached next to the source and rebuilt when the source is newer.
Everything degrades gracefully — no compiler, no libjpeg, or
``PCGAN_NO_NATIVE=1`` simply means :func:`available` returns False and
callers keep the pure-PIL path (bit-identical output either way; the
native path only serves images it can decode bit-exactly and reports the
rest for per-image PIL fallback).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "jpeg_decoder.cc")
_SO = os.path.join(_DIR, "libpcgan_jpeg.so")

_lock = threading.Lock()
_lib = None
_tried = False

# status codes (mirror jpeg_decoder.cc)
OK, E_OPEN, E_DECODE, E_DIMS, E_COLOR = 0, 1, 2, 3, 4


def _build() -> None:
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC,
           "-ljpeg", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)  # atomic: concurrent builders race harmlessly
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("PCGAN_NO_NATIVE"):
            return None
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.pcgan_decode_batch.restype = ctypes.c_int
            lib.pcgan_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.c_int]
            lib.pcgan_decode_file.restype = ctypes.c_int
            lib.pcgan_decode_file.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int]
            lib.pcgan_jpeg_abi.restype = ctypes.c_int
            lib.pcgan_jpeg_abi.argtypes = []
            _lib = lib
        except Exception:
            _lib = None  # toolchain/libjpeg missing: PIL path remains
        return _lib


def available() -> bool:
    """True when the native decoder built and loaded on this host."""
    return _load() is not None


def jpeg_abi() -> int:
    lib = _load()
    return int(lib.pcgan_jpeg_abi()) if lib else 0


def decode_batch(paths: Sequence[str], height: int, width: int,
                 threads: int = 8, out: np.ndarray = None,
                 scale_num: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Decode `paths` into an (N, height, width, 3) u8 RGB batch with the
    C++ thread pool. `scale_num`/8 applies libjpeg's DCT-domain downscale
    (height/width are then the SCALED dims); 8 = full-scale bit-parity
    with PIL. Returns (batch, status) — status[i] != 0 means image i was
    NOT written (open/decode/dims/colorspace) and the caller must fill
    that slot itself (e.g. PIL fallback). Raises RuntimeError when the
    native library is unavailable — gate on :func:`available` first."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable (see available())")
    n = len(paths)
    if out is None:
        out = np.empty((n, height, width, 3), np.uint8)
    elif (out.shape != (n, height, width, 3) or out.dtype != np.uint8
          or not out.flags.c_contiguous):
        # explicit check (not assert): this is an FFI boundary — under
        # `python -O` a stripped assert would let the C++ decoder write out
        # of bounds of a caller-provided buffer
        raise ValueError(
            f"out buffer must be C-contiguous uint8 of shape "
            f"{(n, height, width, 3)}, got {out.dtype} {out.shape}")
    status = np.zeros(n, np.int32)
    if n == 0:
        return out, status
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    lib.pcgan_decode_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        height, width, int(threads),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        int(scale_num))
    return out, status
