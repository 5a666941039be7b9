"""10-bit pipeline tests (BASELINE config #4: 10-bit path done right —
the reference squeezed 10-bit sources through 8-bit nv12, SURVEY §2 note)."""

import numpy as np
import pytest

from av1tpu.legacy import decoder as dec_mod
from av1tpu.engine_tpu import TpuEngine
from av1tpu.utils.testsrc import testsrc2 as make_testsrc


def _psnr(a, b, maxval):
    err = a.astype(np.float64) - b.astype(np.float64)
    mse = (err ** 2).mean()
    return 99.0 if mse == 0 else 10 * np.log10(maxval ** 2 / mse)


def test_testsrc_10bit_range():
    fr = make_testsrc(160, 96, 0, bit_depth=10)
    assert fr.y.dtype == np.uint16
    assert fr.y.max() > 255  # actually uses the 10-bit range
    assert fr.y.max() <= 1023


@pytest.mark.heavy
def test_gop_10bit_roundtrip():
    """8 frames of 10-bit GOP: decode parity + 10-bit fidelity."""
    eng = TpuEngine()
    eng.cfg.keyint = 4
    eng.start_stream()
    state = dec_mod.DecoderState()
    state.seq = eng.sequence_header(160, 96, bit_depth=10)
    assert state.seq.bit_depth == 10
    for i in range(6):
        fr = make_testsrc(160, 96, i, bit_depth=10)
        payload, is_key = eng.encode_next(fr, 96)
        out = dec_mod.decode_frame_payload(payload, state)
        assert out.y.dtype == np.uint16
        # decoder recon == encoder recon bit-exactly
        enc_y = eng._ref[0][:96, :160]
        assert np.array_equal(enc_y, out.y.astype(np.int32)), f"frame {i}"
        p = _psnr(out.y, fr.y, 1023)
        assert p > 38, (i, p)


def test_10bit_beats_8bit_fidelity_on_gradients():
    """A smooth 10-bit ramp must survive with less banding than via 8-bit."""
    h, w = 96, 160
    ramp = np.linspace(0, 1023, w).astype(np.uint16)
    y10 = np.broadcast_to(ramp, (h, w)).copy()
    from av1tpu.utils.testsrc import Frame
    f10 = Frame(y=y10, u=np.full((48, 80), 512, np.uint16),
                v=np.full((48, 80), 512, np.uint16), bit_depth=10)
    eng = TpuEngine()
    eng.start_stream()
    payload, _ = eng.encode_next(f10, 60)
    state = dec_mod.DecoderState()
    state.seq = eng.sequence_header(w, h, bit_depth=10)
    out = dec_mod.decode_frame_payload(payload, state)
    # max error under 2 LSB at 10 bits (0.5 LSB at 8 bits)
    assert np.abs(out.y.astype(int) - y10.astype(int)).max() <= 4


def test_sequence_header_signals_10bit():
    from av1tpu.media import obu as obu_mod
    sh = obu_mod.SequenceHeader(width=320, height=176, bit_depth=10)
    sh2 = obu_mod.SequenceHeader.parse(sh.write())
    assert sh2.bit_depth == 10
