"""Native source-video decode: libavformat + libavcodec via ctypes.

Replaces the cv2.VideoCapture pixel path in the engine
(engine_tpu.iter_source_frames): decodes any system-supported codec
(H.264, HEVC incl. 10-bit, VP9, MPEG-2, ...) straight to planar I420 at
the source's bit depth — no BGR round-trip, no 8-bit squeeze.  This is
the proper version of the reference's decode stage (the exec'd ffmpeg
child, internal/ffmpeg/transcode.go:25-29), and it closes the
compressed high-bit-depth source hole: the reference pushed HDR10 HEVC
through 8-bit nv12 (transcode.go:99-109, flagged in SURVEY SS2 as a
defect); we decode it at 10 bits for the 10-bit spec encode pipeline.

Falls back gracefully: `available()` is False when the shared lib can't
build/load (no libavcodec dev stack), and callers keep the cv2 path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from dataclasses import dataclass
from typing import Iterator

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libavdec.so")
_HASH_PATH = _LIB_PATH + ".srchash"
_lock = threading.Lock()
_lib = None
_lib_err: str | None = None


def _src_hash() -> str:
    """Content hash of the native sources (mtime-independent; git
    checkouts do not preserve mtimes)."""
    h = hashlib.sha256()
    for n in sorted(os.listdir(_NATIVE_DIR)):
        if n.endswith((".cc", ".h")) or n == "Makefile":
            with open(os.path.join(_NATIVE_DIR, n), "rb") as f:
                h.update(n.encode() + b"\0" + f.read() + b"\0")
    return h.hexdigest()


def _load() -> ctypes.CDLL | None:
    global _lib, _lib_err
    with _lock:
        if _lib is not None or _lib_err is not None:
            return _lib
        try:
            want = _src_hash()
            have = None
            if os.path.exists(_LIB_PATH) and os.path.exists(_HASH_PATH):
                with open(_HASH_PATH) as f:
                    have = f.read().strip()
            if have != want:
                subprocess.run(["make", "-C", _NATIVE_DIR, "-s"],
                               check=True, capture_output=True)
                with open(_HASH_PATH, "w") as f:
                    f.write(want)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.avdec_quiet()
            lib.avdec_open.restype = ctypes.c_void_p
            lib.avdec_open.argtypes = [ctypes.c_char_p]
            lib.avdec_error.restype = ctypes.c_char_p
            lib.avdec_error.argtypes = [ctypes.c_void_p]
            for fn in ("avdec_width", "avdec_height", "avdec_bit_depth"):
                getattr(lib, fn).restype = ctypes.c_int
                getattr(lib, fn).argtypes = [ctypes.c_void_p]
            lib.avdec_frame_rate.restype = ctypes.c_double
            lib.avdec_frame_rate.argtypes = [ctypes.c_void_p]
            lib.avdec_read.restype = ctypes.c_int
            lib.avdec_read.argtypes = [ctypes.c_void_p] * 4 + [
                ctypes.POINTER(ctypes.c_int64)]
            lib.avdec_close.argtypes = [ctypes.c_void_p]
            lib.avenc_open.restype = ctypes.c_void_p
            lib.avenc_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                       ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_int]
            lib.avenc_error.restype = ctypes.c_char_p
            lib.avenc_error.argtypes = [ctypes.c_void_p]
            lib.avenc_write.restype = ctypes.c_int
            lib.avenc_write.argtypes = [ctypes.c_void_p] * 4
            lib.avenc_close.restype = ctypes.c_int
            lib.avenc_close.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception as e:  # missing toolchain/libs: stay optional
            _lib_err = str(e)
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


@dataclass
class DecodedFrame:
    y: np.ndarray
    u: np.ndarray
    v: np.ndarray
    bit_depth: int
    pts_ns: int | None


class SourceDecoder:
    """Iterates decoded I420 frames of the main video stream."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"libavdec unavailable: {_lib_err}")
        self._lib = lib
        self._h = lib.avdec_open(path.encode())
        err = lib.avdec_error(self._h)
        if err:
            msg = err.decode(errors="replace")
            self.close()
            raise RuntimeError(f"avdec_open({path}): {msg}")
        self.width = lib.avdec_width(self._h)
        self.height = lib.avdec_height(self._h)
        self.bit_depth = lib.avdec_bit_depth(self._h)
        self.frame_rate = lib.avdec_frame_rate(self._h)

    def close(self):
        if getattr(self, "_h", None):
            self._lib.avdec_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __iter__(self) -> Iterator[DecodedFrame]:
        lib, h = self._lib, self._h
        w, hh = self.width, self.height
        dt = np.uint8 if self.bit_depth == 8 else np.uint16
        pts = ctypes.c_int64()
        while True:
            y = np.empty((hh, w), dt)
            u = np.empty((hh // 2, w // 2), dt)
            v = np.empty((hh // 2, w // 2), dt)
            rc = lib.avdec_read(
                h, y.ctypes.data_as(ctypes.c_void_p),
                u.ctypes.data_as(ctypes.c_void_p),
                v.ctypes.data_as(ctypes.c_void_p), ctypes.byref(pts))
            if rc == 0:
                return
            if rc < 0:
                err = lib.avdec_error(h)
                raise RuntimeError(
                    "decode failed: " +
                    (err.decode(errors="replace") if err else "?"))
            p = None if pts.value == -(2 ** 63) else int(pts.value)
            yield DecodedFrame(y=y, u=u, v=v, bit_depth=self.bit_depth,
                               pts_ns=p)


def encode_fixture(path: str, frames, *, codec: str = "libx264",
                   fps: tuple[int, int] = (24, 1), bit_depth: int = 8,
                   crf: int = 26) -> None:
    """Encode (y, u, v) I420 frames to a compressed file — TEST-FIXTURE
    tooling only (realistic H.264/HEVC/10-bit sources for daemon and
    engine tests).  The product encode path is the in-repo TPU spec-AV1
    engine; this never feeds an output file."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"libavdec unavailable: {_lib_err}")
    frames = list(frames)
    y0 = np.asarray(frames[0][0])
    h, w = y0.shape
    e = lib.avenc_open(path.encode(), codec.encode(), w, h,
                       fps[0], fps[1], bit_depth, crf)
    try:
        err = lib.avenc_error(e)
        if err:
            raise RuntimeError(f"avenc_open: {err.decode()}")
        dt = np.uint8 if bit_depth == 8 else np.uint16
        for (y, u, v) in frames:
            ya = np.ascontiguousarray(np.asarray(y, dt))
            ua = np.ascontiguousarray(np.asarray(u, dt))
            va = np.ascontiguousarray(np.asarray(v, dt))
            rc = lib.avenc_write(e, ya.ctypes.data_as(ctypes.c_void_p),
                                 ua.ctypes.data_as(ctypes.c_void_p),
                                 va.ctypes.data_as(ctypes.c_void_p))
            if rc < 0:
                err = lib.avenc_error(e)
                raise RuntimeError(
                    "avenc_write: " + (err.decode() if err else "?"))
    finally:
        rc = lib.avenc_close(e)
    if rc < 0:
        raise RuntimeError("avenc_close failed")
