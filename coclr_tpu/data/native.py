"""ctypes binding to the C++ data plane (native/coclr_data.cc).

Provides the hot-path trio the reference delegated to liblmdb + msgpack-C +
libjpeg/PIL (SURVEY.md §2.9): zero-copy LMDB get, msgpack frame-list parse,
and fused JPEG decode+crop+resize over a thread pool. Builds lazily with
`make` on first use; everything gracefully falls back to the pure-Python path
when the library is unavailable (set COCLR_NO_NATIVE=1 to force fallback).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB = None
_TRIED = False

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")


def _build() -> Optional[str]:
    so = os.path.join(NATIVE_DIR, "libcoclr_data.so")
    if os.path.exists(so):
        src = os.path.join(NATIVE_DIR, "coclr_data.cc")
        if os.path.getmtime(so) >= os.path.getmtime(src):
            return so
    try:
        subprocess.run(["make", "-C", NATIVE_DIR], check=True,
                       capture_output=True)
        return so if os.path.exists(so) else None
    except Exception:
        return None


_mv_from_memory = ctypes.pythonapi.PyMemoryView_FromMemory
_mv_from_memory.restype = ctypes.py_object
_mv_from_memory.argtypes = [ctypes.c_void_p, ctypes.c_ssize_t, ctypes.c_int]


def get_lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("COCLR_NO_NATIVE"):
        return None
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.cdp_open.restype = ctypes.c_void_p
    lib.cdp_open.argtypes = [ctypes.c_char_p]
    lib.cdp_close.argtypes = [ctypes.c_void_p]
    lib.cdp_entries.restype = ctypes.c_uint64
    lib.cdp_entries.argtypes = [ctypes.c_void_p]
    lib.cdp_get.restype = ctypes.c_int
    lib.cdp_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                            ctypes.c_uint32,
                            ctypes.POINTER(ctypes.c_void_p),
                            ctypes.POINTER(ctypes.c_uint64)]
    lib.cdp_msgpack_raw_list.restype = ctypes.c_int64
    lib.cdp_msgpack_raw_list.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_int64]
    lib.cdp_jpeg_dims.restype = ctypes.c_int
    lib.cdp_jpeg_dims.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int)]
    lib.cdp_decode_crop_clip.restype = ctypes.c_int
    lib.cdp_decode_crop_clip.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_int]
    lib.cdp_decode_frames.restype = ctypes.c_int
    lib.cdp_decode_frames.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int]
    _LIB = lib
    return _LIB


def available() -> bool:
    return get_lib() is not None


class NativeLMDB:
    """Read-only LMDB with zero-copy values + native frame-list parsing."""

    def __init__(self, path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native data plane unavailable")
        self._lib = lib
        self._env = lib.cdp_open(path.encode())
        if not self._env:
            raise ValueError(f"cannot open LMDB at {path}")

    def __len__(self):
        return int(self._lib.cdp_entries(self._env))

    def get(self, key: bytes) -> Optional[bytes]:
        out = ctypes.c_void_p()
        out_len = ctypes.c_uint64()
        hit = self._lib.cdp_get(self._env, key, len(key),
                                ctypes.byref(out), ctypes.byref(out_len))
        if hit < 0:
            raise ValueError(
                "unsupported LMDB layout (DUPSORT/LEAF2) — not a "
                "reference-style dataset")
        if hit == 0:
            return None
        return ctypes.string_at(out.value, out_len.value)

    def get_raw(self, key: bytes) -> Optional[Tuple[int, int]]:
        """(ptr, len) into the mmap — no copy."""
        out = ctypes.c_void_p()
        out_len = ctypes.c_uint64()
        hit = self._lib.cdp_get(self._env, key, len(key),
                                ctypes.byref(out), ctypes.byref(out_len))
        if hit < 0:
            raise ValueError(
                "unsupported LMDB layout (DUPSORT/LEAF2) — not a "
                "reference-style dataset")
        if hit == 0:
            return None
        return out.value, out_len.value

    def frame_list(self, key: bytes) -> Optional["NativeFrameList"]:
        raw = self.get_raw(key)
        if raw is None:
            return None
        ptr, ln = raw
        n = self._lib.cdp_msgpack_raw_list(ptr, ln, None, None, 0)
        if n < 0:
            return None
        ptrs = (ctypes.c_void_p * n)()
        lens = (ctypes.c_uint64 * n)()
        self._lib.cdp_msgpack_raw_list(ptr, ln, ptrs, lens, n)
        return NativeFrameList(self._lib, ptrs, lens, n)

    def close(self):
        if self._env:
            self._lib.cdp_close(self._env)
            self._env = None


class NativeFrameList:
    """JPEG frame pointers of one video (inside the LMDB mmap)."""

    def __init__(self, lib, ptrs, lens, n):
        self._lib = lib
        self._ptrs = ptrs
        self._lens = lens
        self.n = n

    def __len__(self):
        return self.n

    def dims(self, i: int) -> Tuple[int, int]:
        w = ctypes.c_int()
        h = ctypes.c_int()
        ok = self._lib.cdp_jpeg_dims(self._ptrs[i], self._lens[i],
                                     ctypes.byref(w), ctypes.byref(h))
        if not ok:
            raise ValueError("bad jpeg")
        return w.value, h.value

    def raw(self, i: int) -> np.ndarray:
        """Zero-copy uint8 view of frame i's JPEG bytes (inside the mmap)."""
        # PyMemoryView_FromMemory: one C call; building a ctypes array TYPE
        # per frame (c_uint8 * n) costs more than the JPEG parse it feeds
        mv = _mv_from_memory(
            ctypes.c_void_p(self._ptrs[i]),
            ctypes.c_ssize_t(self._lens[i]), ctypes.c_int(0x100))  # PyBUF_READ
        return np.frombuffer(mv, np.uint8)

    def decode_crop(self, indices: Sequence[int], rect, out_size: int,
                    threads: int = 8) -> np.ndarray:
        """Decode selected frames, crop (x,y,w,h), bicubic resize to
        out_size^2. Returns uint8 [len(indices), out, out, 3]."""
        x, y, w, h = rect
        n = len(indices)
        ptrs = (ctypes.c_void_p * n)(*[self._ptrs[i] for i in indices])
        lens = (ctypes.c_uint64 * n)(*[self._lens[i] for i in indices])
        out = np.empty((n, out_size, out_size, 3), np.uint8)
        fails = self._lib.cdp_decode_crop_clip(
            ptrs, lens, n, int(x), int(y), int(w), int(h), int(out_size),
            out.ctypes.data_as(ctypes.c_void_p), int(threads))
        if fails:
            raise ValueError(f"{fails} frames failed to decode")
        return out

    def jpeg_bytes(self, i: int) -> bytes:
        return ctypes.string_at(self._ptrs[i], self._lens[i])
