"""The independent spec-AV1 oracle (system libaom via ctypes).

This is the foundation of the spec-conformance work: every bitstream
the TPU encoder emits must decode with this independent decoder (the
analog of the reference's live self-test, binary.go:244-310).  These
tests pin the self-calibrating ctypes binding itself: struct layout
discovery, encode → decode round trip, 8- and 10-bit.

NOTE: cv2's bundled ffmpeg in this container has only the hwaccel AV1
decoder ("Your platform doesn't support hardware accelerated AV1
decoding") — system libaom/libdav1d are the real software decoders.
"""

import numpy as np
import pytest

from av1tpu.conformance import aomcodec

pytestmark = pytest.mark.skipif(
    not aomcodec.available(), reason="system libaom not present")


def _gradient_frames(w, h, n, shift=0):
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for i in range(n):
        y = ((xx + yy + 10 * i + shift) % 256).astype(np.uint8)
        u = np.full((h // 2, w // 2), 100 + i, np.uint8)
        v = np.full((h // 2, w // 2), 180 - i, np.uint8)
        out.append((y, u, v))
    return out


def test_calibration():
    lay = aomcodec._calibrate_image()
    assert lay.planes >= 0 and lay.stride == lay.planes + 24
    assert lay.d_w > 0 and lay.bit_depth > 0
    enc = aomcodec._calibrate_enc_cfg()
    assert enc.g_w > 0 and enc.g_timebase > 0
    assert enc.rc_end_usage > 0 and enc.rc_target_bitrate > 0
    assert enc.g_lag_in_frames > 0


def test_roundtrip_8bit():
    w, h = 192, 128
    frames = _gradient_frames(w, h, 3)
    tus = aomcodec.encode_frames(frames, w, h, cq_level=20, cpu_used=8)
    assert len(tus) == 3
    dec = aomcodec.decode_stream(tus)
    assert len(dec) == 3
    y, u, v, bd = dec[0]
    assert y.shape == (h, w) and u.shape == (h // 2, w // 2) and bd == 8
    assert np.abs(y.astype(int) - frames[0][0].astype(int)).mean() < 2.0


def test_roundtrip_10bit():
    w, h = 96, 64
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx * 8 + yy * 4) % 1024).astype(np.uint16)
    u = np.full((h // 2, w // 2), 512, np.uint16)
    v = np.full((h // 2, w // 2), 700, np.uint16)
    tus = aomcodec.encode_frames([(y, u, v)], w, h, bit_depth=10,
                                 cq_level=10, cpu_used=8)
    dec = aomcodec.decode_stream(tus)
    assert len(dec) == 1
    dy, du, dv, bd = dec[0]
    assert bd == 10 and dy.dtype == np.uint16
    assert np.abs(dy.astype(int) - y.astype(int)).mean() < 8.0


def test_odd_dimensions():
    # non-aligned display dims exercise the stored-vs-display w/h split
    w, h = 130, 98
    frames = _gradient_frames(w, h, 1)
    tus = aomcodec.encode_frames(frames, w, h, cq_level=20, cpu_used=8)
    dec = aomcodec.decode_stream(tus)
    assert dec[0][0].shape == (h, w)
