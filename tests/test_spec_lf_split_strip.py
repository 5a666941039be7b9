"""Deblock composed with PARTITION_SPLIT and 16px-strip geometry.

Round-3 silently stripped features by geometry class: split16 was
forced off whenever deblock was on, and deblock was forced off for
strip geometries (720/2160-class heights), so a 720p file got neither.
The loopfilter's masked mid-block passes decouple them; these tests
pin the compositions bit-exact vs libaom (spec 7.14 oracle) and our
own spec decoder (general grid-driven path).
"""
import numpy as np
import pytest

from av1tpu.conformance import aomcodec

pytestmark = pytest.mark.skipif(not aomcodec.available(),
                                reason="libaom unavailable")


def _smooth_moving_frames(w, h, n, box=True):
    """Low-noise drifting field (noise_floor <= 1 -> deblock ON) with a
    sharp-edged moving box so 32->16 split RD fires at its boundary."""
    from av1tpu.engine_tpu import Frame
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    out = []
    for i in range(n):
        y = (120 + 80 * np.sin(xx / 97 + i * 0.35) *
             np.cos(yy / 71 - i * 0.2)).clip(0, 255)
        if box:
            # a bright square moving 5px/frame diagonally: its halves
            # straddle 32x32 blocks, making one 32-MV a poor fit
            bx, by = 20 + 5 * i, 12 + 3 * i
            y[by:by + 24, bx:bx + 24] = 235
            y[by + 8:by + 16, bx + 8:bx + 16] = 30
        u = (128 + 30 * np.sin(xx[::2, ::2] / 53 + i * 0.1)).clip(0, 255)
        v = (128 + 30 * np.cos(yy[::2, ::2] / 67 - i * 0.1)).clip(0, 255)
        out.append(Frame(y=y.astype(np.uint8), u=u.astype(np.uint8),
                         v=v.astype(np.uint8)))
    return out


def _encode_and_check(frames, w, h, qindex=120, expect_split=False,
                      own_decoder=True):
    import jax
    from av1tpu.spec_engine import SpecTpuEngine
    from av1tpu.specav1 import decoder as specdec

    eng = SpecTpuEngine()
    eng.cfg.keyint = 100
    eng.cfg.chunk = 1
    eng.start_stream()
    payloads, recons = [], []
    nsplit = 0
    for fr in frames:
        pend = eng._submit(fr, qindex)
        if pend[0] == "inter":
            nsplit += int(np.asarray(pend[11][11]).sum())
        recons.append(tuple(np.asarray(p) for p in
                            jax.device_get(eng._resolve_refs())))
        payloads.append(eng._finalize(pend))
    assert eng._gop_deblock, "RD gate should enable deblock here"
    if expect_split:
        assert nsplit > 0, "content should trigger 32->16 splits"

    dec = aomcodec.Decoder()
    idx = 0
    for p, k in payloads:
        for f in dec.decode(bytes(p)):
            for pl, ss in ((0, 0), (1, 1), (2, 1)):
                a = np.asarray(f[pl], np.int64)
                b = np.asarray(recons[idx][pl],
                               np.int64)[:h >> ss, :w >> ss]
                assert np.array_equal(a, b), \
                    f"libaom frame {idx} plane {pl}"
            idx += 1
    assert idx == len(frames)

    if own_decoder:
        d = specdec.Decoder()
        idx = 0
        for p, k in payloads:
            for f in d.decode_tu(bytes(p)):
                for pl, ss in ((0, 0), (1, 1), (2, 1)):
                    a = np.asarray(f[pl], np.int64)
                    b = np.asarray(recons[idx][pl],
                                   np.int64)[:h >> ss, :w >> ss]
                    assert np.array_equal(a, b), \
                        f"own-decoder frame {idx} plane {pl}"
                idx += 1
        assert idx == len(frames)


def test_deblock_with_split16():
    """Split RD and deblock compose: masked 16px-offset edges."""
    w, h = 192, 128
    _encode_and_check(_smooth_moving_frames(w, h, 5), w, h,
                      expect_split=True)


def test_deblock_strip_geometry():
    """th % 32 == 16 (720/2160-class): strip rows now deblock too."""
    w, h = 192, 112  # 112 = 3*32 + 16 -> true-dims strip coding
    _encode_and_check(_smooth_moving_frames(w, h, 4), w, h)


def test_deblock_strip_keyframe_only():
    """Keyframe strip geometry deblocks (jax_intra path)."""
    w, h = 160, 80  # 80 = 2*32 + 16
    _encode_and_check(_smooth_moving_frames(w, h, 1, box=False), w, h)
