"""Bit-exact readers/writers for AV1 uncompressed syntax (spec §4/§5.3).

Covers every descriptor the sequence/frame headers use: f(n), uvlc,
le(n), leb128, su(n), ns(n).  The arithmetic-coded tile payload uses
msac.py instead.
"""

from __future__ import annotations


class BitReader:
    """MSB-first bit reader over bytes (spec f(n) semantics)."""

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def f(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def uvlc(self) -> int:
        lead = 0
        while self.f(1) == 0:
            lead += 1
            if lead > 32:
                raise ValueError("uvlc overflow")
        if lead == 32:
            return (1 << 32) - 1
        return (1 << lead) - 1 + self.f(lead)

    def le(self, n: int) -> int:
        """n-byte little-endian (must be byte-aligned)."""
        assert self.pos % 8 == 0
        v = 0
        for i in range(n):
            v |= self.data[self.pos >> 3] << (8 * i)
            self.pos += 8
        return v

    def leb128(self) -> int:
        v = 0
        for i in range(8):
            b = self.data[self.pos >> 3]
            self.pos += 8
            v |= (b & 0x7F) << (7 * i)
            if not (b & 0x80):
                break
        return v

    def su(self, n: int) -> int:
        """Signed: n-1 magnitude bits + sign interpretation (spec su(n))."""
        v = self.f(n)
        sign_mask = 1 << (n - 1)
        if v & sign_mask:
            v = v - 2 * sign_mask
        return v

    def ns(self, n: int) -> int:
        """Non-symmetric unsigned with max n (spec ns(n))."""
        w = n.bit_length()
        m = (1 << w) - n
        v = self.f(w - 1)
        if v < m:
            return v
        extra = self.f(1)
        return (v << 1) - m + extra

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def bits_left(self) -> int:
        return len(self.data) * 8 - self.pos


class BitWriter:
    """MSB-first bit writer (encoder-side duals of BitReader)."""

    def __init__(self):
        self.bits: list[int] = []

    def f(self, v: int, n: int) -> "BitWriter":
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)
        return self

    def uvlc(self, v: int) -> "BitWriter":
        lead = (v + 1).bit_length() - 1
        self.f(0, lead)
        self.f(1, 1)
        self.f(v + 1 - (1 << lead), lead)
        return self

    def le(self, v: int, n: int) -> "BitWriter":
        assert len(self.bits) % 8 == 0
        for i in range(n):
            self.f((v >> (8 * i)) & 0xFF, 8)
        return self

    def leb128(self, v: int, min_bytes: int = 1) -> "BitWriter":
        out = []
        while True:
            byte = v & 0x7F
            v >>= 7
            out.append(byte)
            if v == 0:
                break
        while len(out) < min_bytes:
            out.append(0)
        for i, byte in enumerate(out):
            self.f(byte | (0x80 if i + 1 < len(out) else 0), 8)
        return self

    def su(self, v: int, n: int) -> "BitWriter":
        self.f(v & ((1 << n) - 1), n)
        return self

    def ns(self, v: int, n: int) -> "BitWriter":
        w = n.bit_length()
        m = (1 << w) - n
        if v < m:
            self.f(v, w - 1)
        else:
            x = v + m
            self.f(x >> 1, w - 1)
            self.f(x & 1, 1)
        return self

    def byte_align(self) -> "BitWriter":
        while len(self.bits) % 8:
            self.bits.append(0)
        return self

    def trailing_bits(self) -> "BitWriter":
        """spec trailing_bits(): a 1 then 0s to byte alignment."""
        self.f(1, 1)
        return self.byte_align()

    def tobytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | self.bits[i + j]
            out.append(b)
        return bytes(out)
