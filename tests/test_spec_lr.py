"""Spec loop restoration (7.17; BASELINE config #4 names loop
restoration as a required in-loop filter —
internal/ffmpeg/transcode.go:119-123).

Encode-direction conformance: host streams with per-RU Wiener
filters signaled decode bit-exactly in system libaom across stripe
boundaries, multi-RU grids with adapting subexp refs, chroma (tap0
forced 0), inter GOPs, and chained CDEF -> LR (whose stripe rows read
the PRE-CDEF planes).

The restore_wiener initial CDF was pinned exactly (= 21198)
behaviorally — see tools/extract_cdfs.py NOTE — after round-2's
signature scan stored garbage for all three restoration CDFs.
"""
import numpy as np
import pytest

from av1tpu.conformance import aomcodec
from av1tpu.specav1 import decoder as D
from av1tpu.specav1 import encode as E
from av1tpu.specav1 import lr as LR

needs_libaom = pytest.mark.skipif(not aomcodec.available(),
                                  reason="libaom unavailable")

W_ = LR.RESTORE_WIENER
MID = [3, -7, 15]
T1 = [-2, 5, 30]
T2 = [5, -10, 8]
T3 = [0, 8, -17]


def _mk(w, h, n, seed=7, noise=6):
    rng = np.random.default_rng(seed)
    base = rng.integers(20, 230, (h * 2, w * 2)).astype(np.int32)
    out = []
    for i in range(n):
        y = np.clip(base[2 * i:2 * i + h, 3 * i:3 * i + w] +
                    rng.integers(-noise, noise + 1, (h, w)), 0, 255)
        u = np.clip(118 + rng.integers(-14, 15, (h // 2, w // 2)), 0, 255)
        v = np.clip(130 + rng.integers(-14, 15, (h // 2, w // 2)), 0, 255)
        out.append((y, u, v))
    return out


def _assert_bitexact(tus, recons):
    out = aomcodec.decode_stream(tus)
    assert len(out) == len(recons)
    for i, (got, want) in enumerate(zip(out, recons)):
        for p in range(3):
            a = np.asarray(got[p], np.int64)
            b = np.asarray(want[p], np.int64)
            assert np.array_equal(a[:b.shape[0], :b.shape[1]], b), \
                f"frame {i} plane {p}"


@needs_libaom
def test_wiener_single_ru():
    frames = _mk(64, 64, 1)
    tus, recons = E.encode_stream_host(
        frames, qindex=72,
        lr={"types": (W_, 0, 0),
            "decisions": {(0, 0, 0): ("wiener", MID, T1)}})
    _assert_bitexact(tus, recons)


@needs_libaom
def test_wiener_stripes():
    """192 rows cross the 56- and 120-row stripe boundaries: vertical
    taps there must read the pre-CDEF (here: unfiltered) rows."""
    frames = _mk(128, 192, 1)
    tus, recons = E.encode_stream_host(
        frames, qindex=72,
        lr={"types": (W_, 0, 0),
            "decisions": {(0, 0, 0): ("wiener", MID, T1)}})
    _assert_bitexact(tus, recons)


@needs_libaom
def test_wiener_multi_ru_adapting_refs():
    """Size-64 RUs, different taps per RU: the subexp ref chain
    (prev RU's taps) must track across units."""
    dec = {}
    taps = [MID, T1, T2, T3]
    for ur in range(2):
        for uc in range(3):
            dec[(0, ur, uc)] = ("wiener", taps[(ur * 3 + uc) % 4],
                                taps[(ur * 3 + uc + 1) % 4])
    frames = _mk(192, 128, 1)
    tus, recons = E.encode_stream_host(
        frames, qindex=72,
        lr={"types": (W_, 0, 0), "size": 64, "decisions": dec})
    _assert_bitexact(tus, recons)


@needs_libaom
def test_wiener_mixed_on_off():
    frames = _mk(256, 192, 1)
    tus, recons = E.encode_stream_host(
        frames, qindex=72,
        lr={"types": (W_, 0, 0), "size": 64,
            "decisions": {(0, 0, 1): ("wiener", MID, MID),
                          (0, 2, 3): ("wiener", T2, T3),
                          (0, 1, 2): ("wiener", T1, [0, 0, 0])}})
    _assert_bitexact(tus, recons)


@needs_libaom
def test_wiener_chroma():
    """Chroma Wiener: tap 0 is forced 0 (5-tap)."""
    frames = _mk(128, 128, 1)
    tus, recons = E.encode_stream_host(
        frames, qindex=72,
        lr={"types": (W_, W_, W_),
            "decisions": {(0, 0, 0): ("wiener", MID, MID),
                          (1, 0, 0): ("wiener", [0, -7, 15], [0, 5, 30]),
                          (2, 0, 0): ("wiener", [0, 8, -17],
                                      [0, -10, 8])}})
    _assert_bitexact(tus, recons)


@needs_libaom
def test_wiener_inter_gop():
    frames = _mk(128, 128, 4)
    tus, recons = E.encode_stream_host(
        frames, qindex=72,
        lr={"types": (W_, 0, 0),
            "decisions": {(0, 0, 0): ("wiener", MID, T2)}})
    _assert_bitexact(tus, recons)


@needs_libaom
def test_cdef_then_wiener():
    """Full filter chain CDEF -> LR; LR's stripe-boundary rows must
    come from the PRE-CDEF planes (spec 7.17.2)."""
    frames = _mk(128, 192, 2)
    tus, recons = E.encode_stream_host(
        frames, qindex=72, cdef=(4, 3, 1, 2, 1),
        lr={"types": (W_, 0, 0),
            "decisions": {(0, 0, 0): ("wiener", T1, MID)}})
    _assert_bitexact(tus, recons)


def test_own_decoder_matches_recon():
    frames = _mk(128, 192, 3)
    lr = {"types": (W_, 0, 0),
          "decisions": {(0, 0, 0): ("wiener", MID, T1)}}
    tus, recons = E.encode_stream_host(frames, qindex=80,
                                       cdef=(4, 3, 1, 2, 1), lr=lr)
    got = D.decode_stream(tus)
    assert len(got) == len(recons)
    for i, (g, want) in enumerate(zip(got, recons)):
        for p in range(3):
            a = np.asarray(g[p], np.int64)
            b = np.asarray(want[p], np.int64)
            assert np.array_equal(a[:b.shape[0], :b.shape[1]], b), \
                f"frame {i} plane {p}"


# ---- device parity ------------------------------------------------------

@pytest.mark.parametrize("dims,taps", [
    ((64, 64), (3, -7, 15)),
    ((192, 128), (0, 2, 14)),
    ((200, 136), (1, 4, 20)),    # non-SB-aligned true dims
    ((256, 192), (-2, -5, 25)),
])
def test_jax_wiener_matches_numpy(dims, taps):
    import jax.numpy as jnp

    from av1tpu.specav1 import jax_lr as JL

    h, w = dims
    rng = np.random.default_rng(3)
    rec = rng.integers(0, 256, (h, w)).astype(np.int64)
    pre = np.clip(rec + rng.integers(-8, 9, rec.shape), 0,
                  255).astype(np.int64)
    want = rec.copy()
    for (s0, s1) in LR._stripe_ranges(h, 0):
        src = LR._padded_source(rec, pre, s0, s1, w)
        want[s0:s1 + 1, :] = LR.wiener_stripe(src, list(taps),
                                              list(taps), 0, w, 8)
    got = np.asarray(JL.wiener_apply(
        jnp.asarray(rec, jnp.int32), jnp.asarray(pre, jnp.int32),
        taps, h, w, 0, 8))
    assert np.array_equal(got, want)


def test_jax_search_decisions_apply_consistently():
    """search_apply's filtered plane equals the numpy per-RU apply of
    its own returned decisions."""
    import jax.numpy as jnp

    from av1tpu.specav1 import jax_lr as JL

    h, w = 320, 320
    rng = np.random.default_rng(5)
    # smooth source + independent recon noise: low-pass filtering must
    # win somewhere, so the search fires
    yy, xx = np.mgrid[0:h, 0:w]
    src = ((yy * 2 + xx) // 3 % 200 + 20).astype(np.int64)
    rec = np.clip(src + rng.integers(-7, 8, src.shape), 0,
                  255).astype(np.int64)
    pre = np.clip(rec + rng.integers(-3, 4, rec.shape), 0,
                  255).astype(np.int64)
    fy, choice, taps6 = JL.lr_search_apply(
        jnp.asarray(rec, jnp.int32), jnp.asarray(pre, jnp.int32),
        jnp.asarray(src, jnp.int32), th=h, tw=w)
    fy = np.asarray(fy)
    choice = np.asarray(choice)
    taps6 = np.asarray(taps6)
    urows = LR.count_units_in_frame(256, h)
    ucols = LR.count_units_in_frame(256, w)
    dec = {}
    for ur in range(urows):
        for uc in range(ucols):
            i = ur * ucols + uc
            k = int(choice[i])
            if 0 <= k < len(JL.PRESETS):
                t = list(JL.PRESETS[k])
                dec[(0, ur, uc)] = ("wiener", t, t)
            elif k == len(JL.PRESETS):  # per-RU solved taps
                dec[(0, ur, uc)] = ("wiener",
                                    [int(v) for v in taps6[i, :3]],
                                    [int(v) for v in taps6[i, 3:]])
    assert any(k >= 0 for k in choice), "search never fired"
    state = LR.LrEncState.for_encode((LR.RESTORE_WIENER, 0, 0), 256,
                                     w, h, dec)
    for key, d in dec.items():
        state.wiener[key] = (d[1], d[2])
        state.rtype[key] = LR.RESTORE_WIENER
    wy, _, _ = LR.apply_lr_frame(state, (rec, rec, rec),
                                 (pre, pre, pre), 8, h, w)
    assert np.array_equal(fy, wy)


def test_subexp_roundtrip():
    """Writer/reader duals of the signed subexp-with-ref primitive."""
    from av1tpu.encoder import entropy
    from av1tpu.specav1.msac import SymbolDecoder

    class _TW:
        def __init__(self):
            self.lib = entropy.load_library()
            self.enc = self.lib.ec_enc_create()
            self.lib.ec_enc_reset(self.enc)

        def literal(self, v, n):
            self.lib.ec_enc_literal(self.enc, int(v), n)

        def finish(self):
            import ctypes
            buf = (ctypes.c_uint8 * 4096)()
            n = self.lib.ec_enc_done(self.enc, buf, 4096)
            return bytes(buf[:n])

    cases = []
    for j in range(3):
        mn, mx, k = (LR.WIENER_TAPS_MIN[j], LR.WIENER_TAPS_MAX[j],
                     LR.WIENER_TAPS_K[j])
        for v in range(mn, mx + 1):
            for ref in (mn, LR.WIENER_TAPS_MID[j], mx):
                cases.append((mn, mx + 1, k, ref, v))
    tw = _TW()
    for (lo, hi, k, ref, v) in cases:
        LR.write_signed_subexp_with_ref(tw, lo, hi, k, ref, v)
    data = tw.finish()
    rd = SymbolDecoder(data)
    for (lo, hi, k, ref, v) in cases:
        got = LR.read_signed_subexp_with_ref(rd, lo, hi, k, ref)
        assert got == v, (lo, hi, k, ref, v, got)
