"""Host-side entropy coding: C++ range coder via ctypes + bit I/O.

The range coder (native/ec.cc) is the sequential hot loop of the bitstream
layer; Python wrappers here exist for tests, tools, and low-rate call sites
(headers).  The per-coefficient syntax writer also lives in C++ (native/)
because per-symbol Python call overhead would dominate at video rates.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libav1ec.so")
_HASH_PATH = _LIB_PATH + ".srchash"
_lock = threading.Lock()
_lib = None


def _src_hash() -> str:
    """Content hash of all native sources.  The normative bitstream
    depends on this code, so staleness is gated on *content*, never
    mtimes (git checkouts do not preserve mtimes)."""
    h = hashlib.sha256()
    legacy = os.path.normpath(os.path.join(
        _NATIVE_DIR, "..", "..", "..", "legacy", "native"))
    for d in (_NATIVE_DIR, legacy):
        if not os.path.isdir(d):
            continue
        for n in sorted(os.listdir(d)):
            if n.endswith((".cc", ".h")) or n == "Makefile":
                with open(os.path.join(d, n), "rb") as f:
                    h.update(n.encode() + b"\0" + f.read() + b"\0")
    return h.hexdigest()


def _build(want_hash: str) -> None:
    subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                   capture_output=True)
    with open(_HASH_PATH, "w") as f:
        f.write(want_hash)


def load_library() -> ctypes.CDLL:
    """Load (building on demand) the native entropy library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        want = _src_hash()
        have = None
        if os.path.exists(_LIB_PATH) and os.path.exists(_HASH_PATH):
            with open(_HASH_PATH) as f:
                have = f.read().strip()
        if have != want:
            _build(want)
        lib = ctypes.CDLL(_LIB_PATH)
        # encoder
        lib.ec_enc_create.restype = ctypes.c_void_p
        lib.ec_enc_reset.argtypes = [ctypes.c_void_p]
        lib.ec_enc_destroy.argtypes = [ctypes.c_void_p]
        lib.ec_enc_symbol.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                      ctypes.c_void_p, ctypes.c_int]
        lib.ec_enc_symbol_adapt.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                            ctypes.c_void_p, ctypes.c_int]
        lib.ec_enc_bool.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                    ctypes.c_uint]
        lib.ec_enc_bool_adapt.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                          ctypes.c_void_p]
        lib.ec_enc_literal.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                                       ctypes.c_int]
        lib.ec_enc_done.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_int32]
        lib.ec_enc_done.restype = ctypes.c_int32
        lib.ec_enc_size_hint.argtypes = [ctypes.c_void_p]
        lib.ec_enc_size_hint.restype = ctypes.c_int32
        lib.ec_enc_tell_bits.argtypes = [ctypes.c_void_p]
        lib.ec_enc_tell_bits.restype = ctypes.c_int64
        # decoder
        lib.ec_dec_create.restype = ctypes.c_void_p
        lib.ec_dec_create.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.ec_dec_destroy.argtypes = [ctypes.c_void_p]
        lib.ec_dec_symbol.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_int]
        lib.ec_dec_symbol.restype = ctypes.c_int
        lib.ec_dec_symbol_adapt.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                            ctypes.c_int]
        lib.ec_dec_symbol_adapt.restype = ctypes.c_int
        lib.ec_dec_bool.argtypes = [ctypes.c_void_p, ctypes.c_uint]
        lib.ec_dec_bool.restype = ctypes.c_int
        lib.ec_dec_bool_adapt.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.ec_dec_bool_adapt.restype = ctypes.c_int
        lib.ec_dec_literal.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ec_dec_literal.restype = ctypes.c_uint32
        lib.cdf_init_uniform.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.cdf_update.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        _lib = lib
        return lib


def uniform_cdf(nsyms: int) -> np.ndarray:
    """icdf layout [icdf_0..icdf_{n-1}, counter]; icdf[n-1] = 0."""
    lib = load_library()
    cdf = np.zeros(nsyms + 1, dtype=np.uint16)
    lib.cdf_init_uniform(cdf.ctypes.data, nsyms)
    return cdf


def cdf_from_probs(probs) -> np.ndarray:
    """Build an icdf table (with counter slot) from symbol probabilities."""
    p = np.asarray(probs, dtype=np.float64)
    p = p / p.sum()
    cum = np.cumsum(p)
    icdf = np.round(32768 * (1.0 - cum)).astype(np.int64)
    icdf[-1] = 0
    # enforce strictly decreasing so every symbol keeps nonzero width
    for i in range(len(icdf) - 2, -1, -1):
        icdf[i] = max(icdf[i], icdf[i + 1] + 1)
    icdf = np.minimum(icdf, 32767)
    out = np.zeros(len(p) + 1, dtype=np.uint16)
    out[:len(p)] = icdf
    return out


class SymbolEncoder:
    """Thin OO wrapper over the native encoder (for headers/tests/tools)."""

    def __init__(self):
        self._lib = load_library()
        self._h = self._lib.ec_enc_create()

    def symbol(self, s: int, cdf: np.ndarray, adapt: bool = True) -> None:
        nsyms = len(cdf) - 1
        if adapt:
            self._lib.ec_enc_symbol_adapt(self._h, s, cdf.ctypes.data, nsyms)
        else:
            self._lib.ec_enc_symbol(self._h, s, cdf.ctypes.data, nsyms)

    def boolean(self, val: bool, f15: int = 16384) -> None:
        self._lib.ec_enc_bool(self._h, 1 if val else 0, f15)

    def literal(self, val: int, bits: int) -> None:
        self._lib.ec_enc_literal(self._h, val, bits)

    def tell_bits(self) -> int:
        return self._lib.ec_enc_tell_bits(self._h) // 8

    def done(self) -> bytes:
        cap = self._lib.ec_enc_size_hint(self._h)
        out = np.zeros(cap, dtype=np.uint8)
        n = self._lib.ec_enc_done(self._h, out.ctypes.data, cap)
        if n < 0:
            raise RuntimeError("ec_enc_done: buffer too small")
        return bytes(out[:n].tobytes())

    def reset(self) -> None:
        self._lib.ec_enc_reset(self._h)

    def __del__(self):
        try:
            self._lib.ec_enc_destroy(self._h)
        except Exception:
            pass


class SymbolDecoder:
    """Thin OO wrapper over the native decoder (conformance inverse path)."""

    def __init__(self, data: bytes):
        self._lib = load_library()
        self._buf = np.frombuffer(data, dtype=np.uint8).copy()
        self._h = self._lib.ec_dec_create(self._buf.ctypes.data,
                                          len(self._buf))

    def symbol(self, cdf: np.ndarray, adapt: bool = True) -> int:
        nsyms = len(cdf) - 1
        if adapt:
            return self._lib.ec_dec_symbol_adapt(self._h, cdf.ctypes.data,
                                                 nsyms)
        return self._lib.ec_dec_symbol(self._h, cdf.ctypes.data, nsyms)

    def boolean(self, f15: int = 16384) -> bool:
        return bool(self._lib.ec_dec_bool(self._h, f15))

    def literal(self, bits: int) -> int:
        return int(self._lib.ec_dec_literal(self._h, bits))

    def __del__(self):
        try:
            self._lib.ec_dec_destroy(self._h)
        except Exception:
            pass
