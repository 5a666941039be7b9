"""BASELINE config #2/#3 e2e: quality ladder + stream stripping through a
real transcode of a multi-track MKV source."""

import numpy as np
import pytest

from av1tpu.engine_tpu import TpuEngine
from av1tpu.media import mkv, mkv_mux, mp4, obu as obu_mod
from av1tpu.media.mkv import Packet, Track
from av1tpu.media.probe import probe_file
from av1tpu.utils.testsrc import testsrc2 as make_testsrc


@pytest.fixture()
def multitrack_source(tmp_path):
    """cv2-decodable MKV: mpeg4 video + eng/rus audio + rus subtitles."""
    cv2 = pytest.importorskip("cv2")
    mp4_path = str(tmp_path / "src.mp4")
    w = cv2.VideoWriter(mp4_path, cv2.VideoWriter_fourcc(*"mp4v"), 24.0,
                        (160, 96))
    for i in range(6):
        fr = make_testsrc(160, 96, i)
        w.write(np.stack([fr.y] * 3, -1))
    w.release()
    with open(mp4_path, "rb") as f:
        m = mp4.parse(f)
        vt = [t for t in m.tracks if t.codec_type == "video"][0]
        pkts = list(mp4.iter_packets(f, m, vt))
    tracks = [
        Track(number=1, track_type=1, codec_id="V_MPEG4/ISO/ASP",
              width=160, height=96, codec_private=vt.codec_private,
              default_duration_ns=41666666),
        Track(number=2, track_type=2, codec_id="A_AC3", language="eng",
              sample_rate=48000.0, channels=2),
        Track(number=3, track_type=2, codec_id="A_AC3", language="rus",
              sample_rate=48000.0, channels=6),
        Track(number=4, track_type=17, codec_id="S_TEXT/UTF8",
              language="rus"),
        Track(number=5, track_type=17, codec_id="S_TEXT/UTF8",
              language="eng"),
    ]
    src = str(tmp_path / "Movie.mkv")
    with open(src, "wb") as f:
        wr = mkv_mux.MkvWriter(f, tracks)
        for p in pkts:
            p.track_number = 1
            wr.write_packet(p)
            wr.write_packet(Packet(2, p.timestamp_ns,
                                   b"\x0b\x77" + bytes(62), True))
            wr.write_packet(Packet(3, p.timestamp_ns,
                                   b"\x0b\x77" + bytes(62), True))
        wr.write_packet(Packet(4, 0, b"privet", True,
                               duration_ns=10 ** 9))
        wr.write_packet(Packet(5, 0, b"hello", True,
                               duration_ns=10 ** 9))
        wr.finalize()
    return src


def test_transcode_strips_russian_and_applies_ladder(multitrack_source,
                                                     tmp_path):
    pr = probe_file(multitrack_source)
    assert pr.video_stream.height == 96
    out = str(tmp_path / "out.mkv")
    eng = TpuEngine()
    eng.cfg.keyint = 50
    eng.transcode(multitrack_source, out, pr, pr.is_webrip_like)

    pr_out = probe_file(out)
    # video re-encoded as AV1
    assert pr_out.video_stream.codec_name == "av1"
    # audio: eng kept, rus dropped (transcode.go:77-81 semantics)
    auds = [s for s in pr_out.streams if s.codec_type == "audio"]
    assert len(auds) == 1
    assert auds[0].tags.get("language") == "eng"
    # subs: eng kept, rus dropped
    subs = [s for s in pr_out.streams if s.codec_type == "subtitle"]
    assert len(subs) == 1
    assert subs[0].tags.get("language") == "eng"

    # quality ladder: <1080p → quality 25 → qindex 100 on the first frame
    with open(out, "rb") as f:
        m = mkv.parse(f)
        v = [t for t in m.tracks if t.codec_id == "V_AV1"][0]
        first = next(p for p in mkv.iter_packets(f, m)
                     if p.track_number == v.number)
    obus = obu_mod.parse_obus(first.data)
    fh, _ = obu_mod.FrameHeader.parse(
        [p for t, p in obus if t == obu_mod.OBU_FRAME][0])
    # ladder point for <1080p is qindex 100; keyframes carry the
    # GOP-reference quality boost q//3 in [8, 48] (engine_tpu
    # encode_stream: the key is every GOP frame's reference)
    # keyframe q boost: normal (q/3) or the deep (3q/4) branch when
    # the lookahead classifies the GOP motion-predictable
    assert fh.base_q_idx in (
        100 - min(48, max(8, 100 // 3)),
        100 - min(88, max(8, (3 * 100) // 4)))

    # copied audio payloads intact
    with open(out, "rb") as f:
        m = mkv.parse(f)
        a = [t for t in m.tracks if t.codec_id == "A_AC3"][0]
        apkts = [p for p in mkv.iter_packets(f, m)
                 if p.track_number == a.number]
    assert len(apkts) == 6
    assert apkts[0].data.startswith(b"\x0b\x77")


def test_ladder_qindex_by_height():
    from av1tpu.encoder import ratectrl
    assert ratectrl.quality_to_qindex(
        ratectrl.determine_quality(2160)) == 92
    assert ratectrl.quality_to_qindex(
        ratectrl.determine_quality(1080)) == 96
    assert ratectrl.quality_to_qindex(
        ratectrl.determine_quality(720)) == 100
