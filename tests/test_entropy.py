"""Entropy layer tests: range-coder round-trips, CDF adaptation, bit I/O."""

import numpy as np
import pytest

from av1tpu.encoder import entropy
from av1tpu.encoder.entropy import (SymbolDecoder, SymbolEncoder,
                                    cdf_from_probs, uniform_cdf)
from av1tpu.encoder.entropy.bitio import (BitReader, BitWriter, read_leb128,
                                          write_leb128)


def test_uniform_cdf_shape():
    cdf = uniform_cdf(4)
    assert cdf.dtype == np.uint16
    assert len(cdf) == 5
    assert cdf[3] == 0          # icdf of last symbol
    assert cdf[4] == 0          # counter
    assert cdf[0] > cdf[1] > cdf[2] > cdf[3]


def test_roundtrip_static_uniform():
    rng = np.random.default_rng(42)
    syms = rng.integers(0, 8, 500).tolist()
    cdf = uniform_cdf(8)
    enc = SymbolEncoder()
    for s in syms:
        enc.symbol(s, cdf, adapt=False)
    data = enc.done()
    dec = SymbolDecoder(data)
    out = [dec.symbol(cdf, adapt=False) for _ in syms]
    assert out == syms


def test_roundtrip_adaptive():
    """Encoder and decoder CDFs must evolve identically."""
    rng = np.random.default_rng(0)
    # biased source: mostly symbol 0
    syms = rng.choice(4, 2000, p=[0.7, 0.15, 0.1, 0.05]).tolist()
    enc_cdf = uniform_cdf(4)
    dec_cdf = uniform_cdf(4)
    enc = SymbolEncoder()
    for s in syms:
        enc.symbol(s, enc_cdf, adapt=True)
    data = enc.done()
    dec = SymbolDecoder(data)
    out = [dec.symbol(dec_cdf, adapt=True) for _ in syms]
    assert out == syms
    assert np.array_equal(enc_cdf, dec_cdf)
    # adaptation actually happened
    assert not np.array_equal(enc_cdf, uniform_cdf(4))


def test_adaptive_compression_beats_uniform():
    rng = np.random.default_rng(1)
    syms = rng.choice(8, 4000, p=[0.55, 0.2, 0.1, 0.05, 0.04, 0.03,
                                  0.02, 0.01]).tolist()
    enc_u = SymbolEncoder()
    cdf_static = uniform_cdf(8)
    for s in syms:
        enc_u.symbol(s, cdf_static, adapt=False)
    size_uniform = len(enc_u.done())
    enc_a = SymbolEncoder()
    cdf_a = uniform_cdf(8)
    for s in syms:
        enc_a.symbol(s, cdf_a, adapt=True)
    size_adaptive = len(enc_a.done())
    assert size_adaptive < size_uniform * 0.85


def test_roundtrip_mixed_everything():
    """Symbols of varying alphabet sizes, bools, literals, interleaved."""
    rng = np.random.default_rng(7)
    ops = []
    for _ in range(3000):
        kind = rng.integers(0, 3)
        if kind == 0:
            n = int(rng.integers(2, 17))
            ops.append(("sym", n, int(rng.integers(0, n))))
        elif kind == 1:
            ops.append(("bool", int(rng.integers(1, 32768)),
                        int(rng.integers(0, 2))))
        else:
            bits = int(rng.integers(1, 17))
            ops.append(("lit", bits, int(rng.integers(0, 1 << bits))))

    enc_cdfs = {n: uniform_cdf(n) for n in range(2, 17)}
    dec_cdfs = {n: uniform_cdf(n) for n in range(2, 17)}
    enc = SymbolEncoder()
    for kind, a, b in ops:
        if kind == "sym":
            enc.symbol(b, enc_cdfs[a], adapt=True)
        elif kind == "bool":
            enc.boolean(bool(b), f15=a)
        else:
            enc.literal(b, a)
    data = enc.done()
    dec = SymbolDecoder(data)
    for kind, a, b in ops:
        if kind == "sym":
            assert dec.symbol(dec_cdfs[a], adapt=True) == b
        elif kind == "bool":
            assert dec.boolean(f15=a) == bool(b)
        else:
            assert dec.literal(a) == b


def test_roundtrip_skewed_cdf_from_probs():
    cdf_e = cdf_from_probs([0.9, 0.05, 0.03, 0.02])
    cdf_d = cdf_e.copy()
    syms = [0] * 100 + [3] * 3 + [0] * 100 + [1, 2] * 5
    enc = SymbolEncoder()
    for s in syms:
        enc.symbol(s, cdf_e, adapt=False)
    data = enc.done()
    # highly skewed + mostly symbol 0 → strong compression
    assert len(data) < len(syms) // 4
    dec = SymbolDecoder(data)
    assert [dec.symbol(cdf_d, adapt=False) for _ in syms] == syms


def test_empty_stream():
    enc = SymbolEncoder()
    data = enc.done()
    assert isinstance(data, bytes)


def test_tell_bits_monotonic():
    enc = SymbolEncoder()
    cdf = uniform_cdf(8)
    prev = enc.tell_bits()
    for s in [3, 1, 4, 1, 5]:
        enc.symbol(s, cdf, adapt=False)
        cur = enc.tell_bits()
        assert cur >= prev
        prev = cur


# --- bit I/O ---------------------------------------------------------------

def test_bitwriter_f_roundtrip():
    w = BitWriter()
    w.f(5, 3)
    w.f(1, 1)
    w.f(1023, 10)
    w.f(0, 2)
    w.byte_align()
    r = BitReader(w.bytes())
    assert r.f(3) == 5
    assert r.f(1) == 1
    assert r.f(10) == 1023
    assert r.f(2) == 0


def test_uvlc_roundtrip():
    values = [0, 1, 2, 3, 4, 7, 8, 127, 128, 100000]
    w = BitWriter()
    for v in values:
        w.uvlc(v)
    w.byte_align()
    r = BitReader(w.bytes())
    assert [r.uvlc() for _ in values] == values


def test_ns_roundtrip():
    cases = [(0, 5), (1, 5), (4, 5), (0, 7), (6, 7), (2, 3), (9, 10)]
    w = BitWriter()
    for v, n in cases:
        w.ns(v, n)
    w.byte_align()
    r = BitReader(w.bytes())
    assert [r.ns(n) for _, n in cases] == [v for v, _ in cases]


def test_su_roundtrip():
    cases = [(-3, 5), (3, 5), (0, 4), (-8, 5), (7, 5)]
    w = BitWriter()
    for v, n in cases:
        w.su(v, n)
    w.byte_align()
    r = BitReader(w.bytes())
    assert [r.su(n) for _, n in cases] == [v for v, _ in cases]


def test_leb128_roundtrip():
    for v in (0, 1, 127, 128, 300, 2 ** 20, 2 ** 32 - 1):
        data = write_leb128(v)
        got, pos = read_leb128(data)
        assert got == v and pos == len(data)


def test_trailing_bits():
    w = BitWriter()
    w.f(0b101, 3)
    w.trailing_bits()
    data = w.bytes()
    assert len(data) == 1
    assert data[0] == 0b10110000


def test_tile_decoder_survives_garbage():
    """Fuzz: random payloads must terminate without crashing (the range
    decoder reads zeros past the end; golomb prefixes and magnitudes are
    clamped for corrupt streams)."""
    from av1tpu.legacy import entropy_tile as tc
    rng = np.random.default_rng(0)
    for trial in range(25):
        data = rng.bytes(int(rng.integers(1, 400)))
        try:
            tc.decode_tile_intra(data, 12, 16, 8)
            tc.decode_tile_inter(data, 12, 16, 8)
            tc.decode_tile_inter(data, 12, 16, 8, use_refs=True)
        except ValueError:
            pass  # clean rejection is fine; hanging/crashing is not
