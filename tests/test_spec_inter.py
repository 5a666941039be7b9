"""Spec-AV1 inter-frame conformance: host encoder streams must decode
bit-exactly in the independent libaom decoder (the analog of the
reference's encoder self-test, internal/ffmpeg/binary.go:244-310)."""
import numpy as np
import pytest

from av1tpu.conformance import aomcodec
from av1tpu.specav1 import encode as E

pytestmark = pytest.mark.skipif(not aomcodec.available(),
                                reason="libaom unavailable")


def _mkframes(w, h, n, seed=3, motion=(3, 5), noise=2):
    rng = np.random.default_rng(seed)
    base = rng.integers(30, 220, (h * 2, w * 2)).astype(np.int32)
    out = []
    for i in range(n):
        dy, dx = motion[0] * i, motion[1] * i
        y = np.clip(base[dy:dy + h, dx:dx + w] +
                    rng.integers(-noise, noise + 1, (h, w)), 0, 255)
        u = np.clip(np.full((h // 2, w // 2), 120, np.int32) +
                    rng.integers(-3, 4, (h // 2, w // 2)), 0, 255)
        v = np.clip(np.full((h // 2, w // 2), 130, np.int32) +
                    rng.integers(-3, 4, (h // 2, w // 2)), 0, 255)
        out.append((y, u, v))
    return out


def _assert_bitexact(tus, recons):
    out = aomcodec.decode_stream(tus)
    assert len(out) == len(recons)
    for i, (got, want) in enumerate(zip(out, recons)):
        for p in range(3):
            a = np.asarray(got[p], np.int64)
            b = np.asarray(want[p], np.int64)
            a = a[:b.shape[0], :b.shape[1]]
            assert np.array_equal(a, b), f"frame {i} plane {p}"


def test_gop_112x80_bitexact():
    frames = _mkframes(112, 80, 6)
    tus, recons = E.encode_stream_host(frames, qindex=80)
    _assert_bitexact(tus, recons)


def test_gop_static_bitexact():
    frames = _mkframes(128, 64, 4, motion=(0, 0), noise=3)
    tus, recons = E.encode_stream_host(frames, qindex=60)
    _assert_bitexact(tus, recons)


def test_gop_midkeyframe():
    frames = _mkframes(64, 64, 5, motion=(2, 2))
    tus, recons = E.encode_stream_host(frames, qindex=100, keyint=3)
    _assert_bitexact(tus, recons)


@pytest.mark.slow
def test_gop_360p_bitexact():
    frames = _mkframes(640, 360, 3, noise=0)
    tus, recons = E.encode_stream_host(frames, qindex=96)
    _assert_bitexact(tus, recons)
