"""Stream mapping tests (ref: internal/ffmpeg/transcode.go:71-83)."""

from av1tpu.media.mkv import Packet
from av1tpu.media.probe import (FormatInfo, ProbeResult, StreamInfo,
                                finalize_probe)
from av1tpu.media.streamcopy import interleave, output_tracks, plan_streams


def _pr(tmp_path):
    pr = ProbeResult(
        format=FormatInfo(format_name="matroska,webm"),
        streams=[
            StreamInfo(index=0, codec_name="h264", codec_type="video",
                       width=1920, height=1080, codec_id="V_MPEG4/ISO/AVC"),
            StreamInfo(index=1, codec_name="ac3", codec_type="audio",
                       language="eng", codec_id="A_AC3"),
            StreamInfo(index=2, codec_name="ac3", codec_type="audio",
                       language="rus", codec_id="A_AC3"),
            StreamInfo(index=3, codec_name="aac", codec_type="audio",
                       tags={"language": "ru"}, codec_id="A_AAC"),
            StreamInfo(index=4, codec_name="subrip", codec_type="subtitle",
                       language="eng", codec_id="S_TEXT/UTF8"),
            StreamInfo(index=5, codec_name="subrip", codec_type="subtitle",
                       language="rus", codec_id="S_TEXT/UTF8"),
            StreamInfo(index=6, codec_name="ttf", codec_type="attachment"),
        ],
    )
    return finalize_probe(str(tmp_path / "x.mkv"), pr)


def test_russian_tracks_pruned(tmp_path):
    plan = plan_streams(_pr(tmp_path))
    assert plan.video_stream.index == 0
    kept = [s.index for s in plan.copied]
    assert kept == [1, 4]          # eng audio + eng subs
    dropped = [s.index for s in plan.dropped]
    assert dropped == [2, 3, 5]    # rus + ru tagged
    # attachments never copied (-map -0:t)
    assert all(s.codec_type != "attachment" for s in plan.copied)


def test_output_numbering(tmp_path):
    plan = plan_streams(_pr(tmp_path))
    assert plan.output_number[0] == 1   # video first
    assert plan.output_number[1] == 2
    assert plan.output_number[4] == 3


def test_output_tracks_codec_ids(tmp_path):
    plan = plan_streams(_pr(tmp_path))
    tracks = output_tracks(plan, 1920, 1080, 41708333)
    assert tracks[0].codec_id == "V_AV1"
    assert tracks[1].codec_id == "A_AC3"
    assert tracks[1].language == "eng"
    assert tracks[2].codec_id == "S_TEXT/UTF8"


def test_interleave_order():
    a = [Packet(1, t * 100, b"a") for t in range(5)]
    b = [Packet(2, 50 + t * 100, b"b") for t in range(5)]
    merged = list(interleave(a, b))
    ts = [p.timestamp_ns for p in merged]
    assert ts == sorted(ts)
    assert len(merged) == 10
