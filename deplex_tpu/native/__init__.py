"""Native (C++) host runtime: PNG16 decode + fused back-projection.

The reference ships its native I/O as vendored C (stb_image, ~7.8k LoC) built
by CMake; here the equivalent subset is a from-scratch ~200-line C++ library
(src/deplex_native.cpp) bound via ctypes. The shared object is compiled once
on first import (g++ + zlib, both baked into the image) and cached next to
the source; import falls back gracefully (callers treat `decode_png16`
returning None / ImportError as "use the PIL path").
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_SRC = pathlib.Path(__file__).resolve().parent / "src" / "deplex_native.cpp"
_SO = pathlib.Path(__file__).resolve().parent / "src" / "libdeplex_native.so"

_lib = None


_SRC_LOADER = pathlib.Path(__file__).resolve().parent / "src" / "deplex_loader.cpp"


def _build() -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(_SRC),
           str(_SRC_LOADER), "-o", str(_SO), "-lz", "-pthread"]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists():
        _build()
    elif _SO.stat().st_mtime < max(_SRC.stat().st_mtime,
                                   _SRC_LOADER.stat().st_mtime):
        # Sources newer than the binary: rebuild when a toolchain is
        # available, otherwise keep the prebuilt .so shipped in the wheel
        # (tools/build_wheel.sh) — installs must not require g++.
        try:
            _build()
        except (OSError, subprocess.CalledProcessError):
            pass
    lib = ctypes.CDLL(str(_SO))
    lib.deplex_png16_info.restype = ctypes.c_int
    lib.deplex_png16_info.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32)]
    lib.deplex_png16_decode.restype = ctypes.c_int
    lib.deplex_png16_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS"), ctypes.c_size_t]
    lib.deplex_backproject.restype = None
    lib.deplex_backproject.argtypes = [
        np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS"),
        ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")]
    lib.deplex_loader_create.restype = ctypes.c_void_p
    lib.deplex_loader_create.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_int, ctypes.c_int]
    lib.deplex_loader_next.restype = ctypes.c_int
    lib.deplex_loader_next.argtypes = [
        ctypes.c_void_p, np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")]
    lib.deplex_loader_next_cloud.restype = ctypes.c_int
    lib.deplex_loader_next_cloud.argtypes = [
        ctypes.c_void_p, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")]
    lib.deplex_loader_destroy.restype = None
    lib.deplex_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class SequenceLoader:
    """Threaded native depth-sequence loader (ordered, bounded ring).

    Replaces the reference's synchronous per-frame PNG load
    (examples/process_sequence.cpp:31-43) with a C++ worker pool; frames
    come back strictly in order.
    """

    def __init__(self, paths, width: int, height: int, *, queue_depth: int = 4,
                 workers: int = 2):
        lib = _load()
        self._lib = lib
        self._w, self._h = int(width), int(height)
        blob = b"\0".join(str(p).encode() for p in paths) + b"\0"
        self._handle = lib.deplex_loader_create(
            blob, len(blob), len(paths), self._w, self._h, queue_depth, workers)
        if not self._handle:
            raise RuntimeError("loader creation failed")

    def next_depth(self) -> np.ndarray | None:
        out = np.empty((self._h, self._w), np.uint16)
        rc = self._lib.deplex_loader_next(self._handle, out)
        if rc == 1:
            return None
        if rc != 0:
            raise RuntimeError(f"frame decode failed (rc={rc})")
        return out

    def next_cloud(self, intrinsics) -> np.ndarray | None:
        K = np.asarray(intrinsics, np.float32)
        out = np.empty((self._h * self._w, 3), np.float32)
        rc = self._lib.deplex_loader_next_cloud(
            self._handle, float(K[0, 0]), float(K[1, 1]), float(K[0, 2]),
            float(K[1, 2]), out)
        if rc == 1:
            return None
        if rc != 0:
            raise RuntimeError(f"frame decode failed (rc={rc})")
        return out

    def __iter__(self):
        while True:
            d = self.next_depth()
            if d is None:
                return
            yield d

    def close(self):
        if self._handle:
            self._lib.deplex_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def decode_png16(path: str) -> np.ndarray | None:
    """Decode a grayscale PNG to (H, W) uint16. None if unsupported format;
    raises RuntimeError on invalid content (parity with stbi_load_16 failure,
    reference depth_image.cpp:32-35)."""
    lib = _load()
    data = pathlib.Path(path).read_bytes()
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    rc = lib.deplex_png16_info(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise RuntimeError(f"Error: Couldn't read image {path} (png parse {rc})")
    out = np.empty((h.value, w.value), dtype=np.uint16)
    rc = lib.deplex_png16_decode(data, len(data), out, out.size)
    if rc in (-5, -6):
        return None  # non-grayscale / exotic bit depth: let PIL handle it
    if rc != 0:
        raise RuntimeError(f"Error: Couldn't read image {path} (png decode {rc})")
    return out


def backproject(depth: np.ndarray, fx: float, fy: float, cx: float,
                cy: float) -> np.ndarray:
    """(H, W) uint16 depth -> (H*W, 3) float32 organized cloud."""
    lib = _load()
    depth = np.ascontiguousarray(depth, dtype=np.uint16)
    H, W = depth.shape
    out = np.empty((H * W, 3), dtype=np.float32)
    lib.deplex_backproject(depth, H, W, float(fx), float(fy), float(cx),
                           float(cy), out)
    return out


__all__ = ["SequenceLoader", "backproject", "decode_png16"]
