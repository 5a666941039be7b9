"""End-to-end intra encode→decode conformance tests (BASELINE config #1 core)."""

import os

import numpy as np
import pytest

from av1tpu.legacy import decoder as dec_mod
from av1tpu.engine_tpu import TpuEngine
from av1tpu.media import ivf, mkv, obu as obu_mod
from av1tpu.utils.testsrc import testsrc2 as make_testsrc


def _psnr(a, b):
    err = a.astype(np.float64) - b.astype(np.float64)
    mse = (err ** 2).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255 ** 2 / mse)


@pytest.fixture(scope="module")
def engine():
    return TpuEngine()


def test_keyframe_roundtrip_psnr(engine):
    frame = make_testsrc(320, 192, 0)
    payload = engine.encode_keyframe(frame, qindex=80)
    assert len(payload) > 100
    state = dec_mod.DecoderState()
    state.seq = engine.sequence_header(320, 192)
    out = dec_mod.decode_frame_payload(payload, state)
    assert out is not None
    assert out.y.shape == frame.y.shape
    assert out.u.shape == frame.u.shape
    y_psnr = _psnr(out.y, frame.y)
    assert y_psnr > 38, y_psnr
    assert _psnr(out.u, frame.u) > 35
    assert _psnr(out.v, frame.v) > 35


def test_qindex_rate_tradeoff(engine):
    """Lower qindex → bigger payload and higher PSNR."""
    frame = make_testsrc(320, 192, 3)
    sizes, psnrs = [], []
    for qi in (60, 120, 180):
        payload = engine.encode_keyframe(frame, qindex=qi)
        state = dec_mod.DecoderState()
        state.seq = engine.sequence_header(320, 192)
        out = dec_mod.decode_frame_payload(payload, state)
        sizes.append(len(payload))
        psnrs.append(_psnr(out.y, frame.y))
    assert sizes[0] > sizes[1] > sizes[2]
    assert psnrs[0] > psnrs[1] > psnrs[2]


def test_nonaligned_dimensions(engine):
    """Frame sizes not multiples of the block size pad + crop correctly."""
    frame = make_testsrc(100, 70, 0)  # 100x70: pads to 112x80
    payload = engine.encode_keyframe(frame, qindex=96)
    state = dec_mod.DecoderState()
    state.seq = engine.sequence_header(100, 70)
    out = dec_mod.decode_frame_payload(payload, state)
    assert out.y.shape == (70, 100)
    assert out.u.shape == (35, 50)
    assert _psnr(out.y, frame.y) > 35


def test_sequence_header_roundtrip():
    sh = obu_mod.SequenceHeader(width=1920, height=1080, bit_depth=8)
    data = sh.write()
    sh2 = obu_mod.SequenceHeader.parse(data)
    assert (sh2.width, sh2.height, sh2.bit_depth) == (1920, 1080, 8)
    sh10 = obu_mod.SequenceHeader(width=3840, height=2160, bit_depth=10)
    sh10b = obu_mod.SequenceHeader.parse(sh10.write())
    assert (sh10b.width, sh10b.height, sh10b.bit_depth) == (3840, 2160, 10)


def test_obu_framing_roundtrip():
    payloads = [(obu_mod.OBU_TEMPORAL_DELIMITER, b""),
                (obu_mod.OBU_SEQUENCE_HEADER, b"\x01\x02\x03"),
                (obu_mod.OBU_FRAME, bytes(range(200)))]
    blob = b"".join(obu_mod.write_obu(t, p) for t, p in payloads)
    assert obu_mod.parse_obus(blob) == payloads


def test_ivf_stream_decode(engine, tmp_path):
    """Multi-frame IVF: seq header + frames, decoded back frame by frame."""
    path = str(tmp_path / "clip.ivf")
    frames = [make_testsrc(160, 96, i) for i in range(3)]
    sh = engine.sequence_header(160, 96)
    with open(path, "wb") as f:
        ivf.write_header(f, 160, 96, 30, 1, 3)
        for i, fr in enumerate(frames):
            payload = engine.encode_keyframe(fr, qindex=100)
            unit = obu_mod.write_obu(obu_mod.OBU_TEMPORAL_DELIMITER, b"")
            if i == 0:
                unit += obu_mod.write_obu(obu_mod.OBU_SEQUENCE_HEADER,
                                          sh.write())
            unit += payload
            ivf.write_frame(f, unit, i)
    out = dec_mod.decode_ivf(path)
    assert len(out) == 3
    for fr, dec in zip(frames, out):
        assert _psnr(dec.y, fr.y) > 35


@pytest.fixture(scope="module")
def cv2_source(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path_factory.mktemp("src") / "source.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24.0,
                        (320, 240))
    assert w.isOpened()
    for i in range(8):
        fr = make_testsrc(320, 240, i)
        img = np.stack([fr.y, fr.y, fr.y], axis=-1)  # grayscale-ish source
        w.write(img)
    w.release()
    return path


@pytest.mark.heavy
def test_engine_transcode_e2e(engine, cv2_source, tmp_path):
    """Full transcode: mp4 source → AV1-in-MKV, parseable and decodable."""
    from av1tpu.media.probe import probe_file
    pr = probe_file(cv2_source)
    out_path = str(tmp_path / "out.mkv")
    engine.transcode(cv2_source, out_path, pr, is_webrip_like=True)
    assert os.path.exists(out_path)

    pr_out = probe_file(out_path)
    assert pr_out.has_av1
    assert pr_out.video_stream.codec_name == "av1"
    assert pr_out.video_stream.width == 320
    assert pr_out.video_stream.r_frame_rate == "24/1"

    # decode the AV1 track back with our decoder
    with open(out_path, "rb") as f:
        m = mkv.parse(f)
        v_track = [t for t in m.tracks if t.codec_id == "V_AV1"][0]
        assert v_track.codec_private[:1] == b"\x81"  # av1C marker
        config_obus = v_track.codec_private[4:]
        state = dec_mod.DecoderState()
        dec_mod.decode_frame_payload(config_obus, state)  # seq header
        assert state.seq is not None
        frames = []
        for pkt in mkv.iter_packets(f, m):
            if pkt.track_number == v_track.number:
                frames.append(dec_mod.decode_frame_payload(pkt.data, state))
    assert len(frames) == 8
    # compare against the engine's own view of the source
    src_frames = list(TpuEngine.iter_source_frames(cv2_source))
    psnr = _psnr(frames[0].y, src_frames[0].y)
    assert psnr > 32, psnr
    assert engine.stats.frames >= 8
    assert engine.stats.fps > 0
