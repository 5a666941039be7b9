"""Spec deblocking filter: engine streams with lf enabled must decode
bit-exactly in libaom (the conformance oracle for spec 7.14) and in our
own spec decoder.  Smooth content so the RD gate turns the filter ON
(grainy sources disable it — deblocking noise hurts prediction)."""
import numpy as np
import pytest

from av1tpu.conformance import aomcodec
from av1tpu.media import obu as _unused  # noqa: F401  (keep import graph warm)

pytestmark = pytest.mark.skipif(not aomcodec.available(),
                                reason="libaom unavailable")


def _smooth_frames(w, h, n):
    """Low-noise drifting blobs: noise_floor <= 1 -> deblock enabled."""
    from av1tpu.engine_tpu import Frame
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    out = []
    for i in range(n):
        y = (120 + 90 * np.sin(xx / 97 + i * 0.4) *
             np.cos(yy / 71 - i * 0.2) +
             40 * np.sin((xx + yy) / 313 + i)).clip(0, 255)
        u = (128 + 30 * np.sin(xx[::2, ::2] / 53)).clip(0, 255)
        v = (128 + 30 * np.cos(yy[::2, ::2] / 67)).clip(0, 255)
        out.append(Frame(y=y.astype(np.uint8), u=u.astype(np.uint8),
                         v=v.astype(np.uint8)))
    return out


@pytest.mark.heavy
def test_deblock_gate_and_bitexact():
    import jax
    from av1tpu.spec_engine import SpecTpuEngine, noise_floor
    from av1tpu.specav1 import decoder as specdec
    from av1tpu.specav1 import headers, obu

    frames = _smooth_frames(192, 160, 5)
    assert noise_floor(frames[0].y) <= 1.0

    eng = SpecTpuEngine()
    eng.cfg.keyint = 4
    eng.cfg.chunk = 4
    eng.start_stream()
    payloads, recons = [], []
    for fr in frames:
        pend = eng._submit(fr, 120)
        recons.append(tuple(np.asarray(p) for p in
                            jax.device_get(eng._resolve_refs())))
        payloads.append(eng._finalize(pend))
    assert eng._gop_deblock

    # header carries nonzero filter levels
    seq = None
    for o in obu.parse_obus(bytes(payloads[0][0])):
        if o.type == obu.OBU_SEQUENCE_HEADER:
            seq = headers.parse_sequence_header(o.payload)
        elif o.type == obu.OBU_FRAME:
            hdr = headers.parse_frame_header(o.payload, seq)
            assert hdr.lf.level[0] > 0

    # libaom decode == device recon, bit-exact, filter applied
    dec = aomcodec.Decoder()
    idx = 0
    for p, k in payloads:
        for f in dec.decode(bytes(p)):
            for pl, ss in ((0, 0), (1, 1), (2, 1)):
                a = np.asarray(f[pl], np.int64)
                b = np.asarray(recons[idx][pl],
                               np.int64)[:160 >> ss, :192 >> ss]
                assert np.array_equal(a, b), f"frame {idx} plane {pl}"
            idx += 1
    assert idx == 5

    # our own spec decoder applies the same filter
    d = specdec.Decoder()
    idx = 0
    for p, k in payloads:
        for f in d.decode_tu(bytes(p)):
            a = np.asarray(f[0], np.int64)
            b = np.asarray(recons[idx][0], np.int64)[:160, :192]
            assert np.array_equal(a, b), f"own-decoder frame {idx}"
            idx += 1
    assert idx == 5


def test_grainy_content_disables_deblock():
    from av1tpu.spec_engine import noise_floor
    from av1tpu.utils.testsrc import testsrc2
    assert noise_floor(testsrc2(320, 240, 0).y) > 1.0
