"""VFR/PTS carry-through: the transcode keeps the SOURCE video packet
timestamps instead of synthesizing CFR (reference transcode.go:58-64,
125-131 — ffmpeg timestamp passthrough, WebRip normalized to zero)."""
import numpy as np
import pytest

from av1tpu.media import mkv, mkv_mux
from av1tpu.media.probe import probe_file


VFR_PTS_MS = [0, 41, 83, 150, 191, 233, 300, 341]  # irregular steps
SHIFT_MS = 700  # webrip sources often start at a nonzero pts


def _make_vfr_source(path: str, shift_ms: int = 0):
    """An MKV with a video track whose packets carry irregular PTS.
    The payload bytes are dummies — the engine's frame decode is
    monkeypatched; only container timing matters here."""
    track = mkv.Track(number=1, uid=1, track_type=mkv.TRACK_TYPE_VIDEO,
                      codec_id="V_MPEG4/ISO/AVC", width=64, height=64,
                      default_duration_ns=41_666_666)
    with open(path, "wb") as f:
        w = mkv_mux.MkvWriter(f, [track])
        for i, t in enumerate(VFR_PTS_MS):
            w.write_packet(mkv.Packet(
                track_number=1,
                timestamp_ns=(t + shift_ms) * 1_000_000,
                data=b"\x00" * 16, keyframe=(i == 0),
                duration_ns=41_666_666))
        w.finalize((VFR_PTS_MS[-1] + shift_ms + 42) / 1000.0)


def _fake_frames(n):
    from av1tpu.engine_tpu import Frame
    rng = np.random.default_rng(3)
    base = rng.integers(0, 255, (64, 64)).astype(np.uint8)
    for i in range(n):
        yield Frame(y=np.roll(base, i, 1),
                    u=np.full((32, 32), 128, np.uint8),
                    v=np.full((32, 32), 128, np.uint8))


@pytest.mark.parametrize("webrip,shift", [(False, 0), (True, SHIFT_MS)])
@pytest.mark.heavy
def test_vfr_pts_carried(tmp_path, monkeypatch, webrip, shift):
    from av1tpu.spec_engine import SpecTpuEngine
    src = str(tmp_path / "vfr_src.mkv")
    _make_vfr_source(src, shift_ms=shift)
    pr = probe_file(src)
    assert pr.video_stream is not None

    eng = SpecTpuEngine()
    eng.cfg.keyint = 8
    monkeypatch.setattr(
        SpecTpuEngine, "iter_source_frames",
        staticmethod(lambda path: _fake_frames(len(VFR_PTS_MS))))
    out = str(tmp_path / "out.mkv")
    eng.transcode(src, out, pr, webrip)

    with open(out, "rb") as f:
        m = mkv.parse(f)
        v = [t for t in m.tracks if t.codec_id == "V_AV1"][0]
        got = [p.timestamp_ns for p in mkv.iter_packets(f, m)
               if p.track_number == v.number]
    # mkv timestamps quantize to the 1ms timestamp scale
    got_ms = sorted(round(t / 1e6) for t in got)
    if webrip:
        # normalized to start at zero, spacing preserved
        assert got_ms == VFR_PTS_MS
    else:
        assert got_ms == [t + shift for t in VFR_PTS_MS]


AUDIO_PTS_MS = [0, 21, 42, 63, 84, 105, 126, 147, 168, 189]


def _make_av_source(path: str, shift_ms: int):
    """An MKV whose video AND audio packets start at a nonzero offset
    (web-like capture).  Audio leads video by 10 ms."""
    vtrack = mkv.Track(number=1, uid=1, track_type=mkv.TRACK_TYPE_VIDEO,
                       codec_id="V_MPEG4/ISO/AVC", width=64, height=64,
                       default_duration_ns=41_666_666)
    atrack = mkv.Track(number=2, uid=2, track_type=mkv.TRACK_TYPE_AUDIO,
                       codec_id="A_AAC")
    with open(path, "wb") as f:
        w = mkv_mux.MkvWriter(f, [vtrack, atrack])
        pkts = [mkv.Packet(track_number=1,
                           timestamp_ns=(t + shift_ms + 10) * 1_000_000,
                           data=b"\x00" * 16, keyframe=(i == 0),
                           duration_ns=41_666_666)
                for i, t in enumerate(VFR_PTS_MS)]
        pkts += [mkv.Packet(track_number=2,
                            timestamp_ns=(t + shift_ms) * 1_000_000,
                            data=b"\x01" * 8, keyframe=True,
                            duration_ns=21_000_000)
                 for t in AUDIO_PTS_MS]
        for p in sorted(pkts, key=lambda p: p.timestamp_ns):
            w.write_packet(p)
        w.finalize((VFR_PTS_MS[-1] + shift_ms + 60) / 1000.0)


def test_webrip_zero_base_rebases_all_streams(tmp_path, monkeypatch):
    """The webrip zero-base must shift copied audio by the SAME offset
    as video (reference -start_at_zero/-avoid_negative_ts make_zero,
    transcode.go:59-65,126-131) — a video-only rebase bakes permanent
    A/V desync into the replaced file."""
    from av1tpu.spec_engine import SpecTpuEngine
    src = str(tmp_path / "av_src.mkv")
    _make_av_source(src, shift_ms=SHIFT_MS)
    pr = probe_file(src)

    eng = SpecTpuEngine()
    eng.cfg.keyint = 8
    monkeypatch.setattr(
        SpecTpuEngine, "iter_source_frames",
        staticmethod(lambda path: _fake_frames(len(VFR_PTS_MS))))
    out = str(tmp_path / "out.mkv")
    eng.transcode(src, out, pr, True)

    with open(out, "rb") as f:
        m = mkv.parse(f)
        v = [t for t in m.tracks if t.codec_id == "V_AV1"][0]
        a = [t for t in m.tracks if t.codec_id == "A_AAC"][0]
        vts, ats = [], []
        for p in mkv.iter_packets(f, m):
            (vts if p.track_number == v.number else ats).append(
                p.timestamp_ns)
    vts_ms = sorted(round(t / 1e6) for t in vts)
    ats_ms = sorted(round(t / 1e6) for t in ats)
    # earliest stream (audio) lands at zero; video keeps its +10ms lag
    assert ats_ms == AUDIO_PTS_MS[: len(ats_ms)] and ats_ms[0] == 0
    assert vts_ms == [t + 10 for t in VFR_PTS_MS]


def test_transcode_reports_live_progress(tmp_path, monkeypatch):
    """The real transcode loop calls progress_cb with a growing frame
    count (throttled by progress_interval; 0 here so every frame
    reports)."""
    from av1tpu.spec_engine import SpecTpuEngine
    src = str(tmp_path / "vfr_src.mkv")
    _make_vfr_source(src)
    pr = probe_file(src)

    eng = SpecTpuEngine()
    eng.cfg.keyint = 8
    eng.progress_interval = 0.0
    calls = []
    eng.progress_cb = lambda done, total: calls.append((done, total))
    monkeypatch.setattr(
        SpecTpuEngine, "iter_source_frames",
        staticmethod(lambda path: _fake_frames(len(VFR_PTS_MS))))
    eng.transcode(src, str(tmp_path / "out.mkv"), pr, False)
    dones = [d for d, _ in calls]
    assert dones and dones[-1] == len(VFR_PTS_MS)
    assert dones == sorted(dones) and max(dones) > 0


def test_hdr_source_refused_without_native_decode(tmp_path, monkeypatch):
    """PQ/HLG or >8-bit compressed sources decode natively via
    libavcodec (media/avdec); when that decoder is UNAVAILABLE they
    must fail cleanly (the 8-bit cv2 fallback would silently destroy
    the grade), leaving the source alone."""
    from av1tpu.daemon.core import TranscodeError
    from av1tpu.media import avdec
    from av1tpu.media import probe as probe_mod
    from av1tpu.spec_engine import SpecTpuEngine

    monkeypatch.setattr(avdec, "available", lambda: False)
    vs = probe_mod.StreamInfo(index=0, codec_type="video",
                              codec_name="hevc", width=64, height=64)
    vs.color_transfer_code = 16  # SMPTE 2084 (PQ)
    pr = probe_mod.ProbeResult(
        format=probe_mod.FormatInfo(format_name="matroska"),
        streams=[vs], has_video=True, video_stream=vs)
    eng = SpecTpuEngine()
    with pytest.raises(TranscodeError, match="HDR"):
        eng.transcode(str(tmp_path / "in.mkv"),
                      str(tmp_path / "out.mkv"), pr, False)

    vs.color_transfer_code = 0
    vs.bit_depth = 10
    with pytest.raises(TranscodeError, match="bit"):
        eng.transcode(str(tmp_path / "in.mkv"),
                      str(tmp_path / "out.mkv"), pr, False)
