"""Classifier semantics tests (ref: internal/metadata/probe.go:208-394)."""

from av1tpu.classify import (SOURCE_DISC_LIKE, SOURCE_UNKNOWN,
                             SOURCE_WEB_LIKE, classify_web_source)
from av1tpu.media.probe import FormatInfo, StreamInfo


def _video(width=1920, height=1080, avg="24/1", r="24/1"):
    return StreamInfo(codec_type="video", width=width, height=height,
                      avg_frame_rate=avg, r_frame_rate=r)


def _dir(tmp_path):
    # pytest tmp_path embeds the test name, which can contain classifier
    # tokens (e.g. "webdl"); use a neutral subdir so directory scoring is inert
    d = tmp_path / "m"
    d.mkdir(exist_ok=True)
    return d


def test_filename_token_scores_web(tmp_path):
    d = classify_web_source(
        str(_dir(tmp_path) / "Show.S01E01.WEB-DL.1080p.mp4"),
        FormatInfo(format_name="mov,mp4,m4a,3gp,3g2,mj2"), [_video()])
    # +3 filename token, +2 .mp4 ext, +2.5 format name = 7.5
    assert d.source_class == SOURCE_WEB_LIKE
    assert d.score == 7.5
    assert any("web-dl" in r for r in d.reasons)


def test_disc_tokens_score_negative(tmp_path):
    d = classify_web_source(
        str(_dir(tmp_path) / "Movie.2020.BluRay.REMUX.mkv"),
        FormatInfo(format_name="matroska,webm",
                   tags={"muxing_app": "libmatroska v1.4.9"}),
        [_video()])
    # -4 bluray, -4 remux, -1 ext, -1.5 format, -3 muxer = -13.5
    assert d.source_class == SOURCE_DISC_LIKE
    assert d.score == -13.5


def test_unknown_near_zero(tmp_path):
    d = classify_web_source(
        str(_dir(tmp_path) / "home_video.mkv"),
        FormatInfo(format_name="matroska,webm"), [_video()])
    # -1 ext, -1.5 format = -2.5 → DiscLike actually; use neutral name + mp4
    d2 = classify_web_source(
        str(_dir(tmp_path) / "clip.m4v"), FormatInfo(format_name="matroska,webm"),
        [_video()])
    assert d.source_class == SOURCE_DISC_LIKE
    # .m4v ext isn't scored; matroska format -1.5 → Unknown
    assert d2.source_class == SOURCE_UNKNOWN
    assert d2.reasons[-1] == "ambiguous: score near zero"


def test_websafe_sidecar_override(tmp_path):
    f = _dir(tmp_path) / "Movie.BluRay.mkv"
    f.write_bytes(b"x")
    (_dir(tmp_path) / "Movie.BluRay.websafe").write_text("")
    d = classify_web_source(str(f), FormatInfo(format_name="matroska,webm"),
                            [_video()])
    assert d.source_class == SOURCE_WEB_LIKE
    assert d.score == 10.0
    assert d.reasons == ["override: .websafe sidecar file"]


def test_nowebsafe_sidecar_override(tmp_path):
    f = _dir(tmp_path) / "Show.WEB-DL.mp4"
    f.write_bytes(b"x")
    (_dir(tmp_path) / "Show.WEB-DL.nowebsafe").write_text("")
    d = classify_web_source(str(f), FormatInfo(format_name="mp4"), [_video()])
    assert d.source_class == SOURCE_DISC_LIKE
    assert d.score == -10.0


def test_vfr_counts_only_outside_matroska(tmp_path):
    vfr = _video(avg="2997/125", r="30/1")
    d_mp4 = classify_web_source(
        str(_dir(tmp_path) / "c.bin"), FormatInfo(format_name="mp4"), [vfr])
    assert any("VFR" in r for r in d_mp4.reasons)
    d_mkv = classify_web_source(
        str(_dir(tmp_path) / "c.bin"), FormatInfo(format_name="matroska,webm"),
        [vfr])
    assert not any("VFR" in r for r in d_mkv.reasons)


def test_odd_dimensions_and_ar(tmp_path):
    odd = _video(width=1919, height=801)
    d = classify_web_source(
        str(_dir(tmp_path) / "c.bin"), FormatInfo(format_name="mp4"), [odd])
    assert any("odd width" in r for r in d.reasons)
    assert any("odd height" in r for r in d.reasons)
    wide = _video(width=2560, height=800)  # AR 3.2 > 2.5
    d2 = classify_web_source(
        str(_dir(tmp_path) / "c.bin"), FormatInfo(format_name="mp4"), [wide])
    assert any("unusual AR" in r for r in d2.reasons)


def test_bpp_scoring(tmp_path):
    # low bpp at 1080p: bitrate/(w*h) < 0.1 → +1.0
    low = FormatInfo(format_name="mp4", bit_rate="150000")
    d = classify_web_source(str(_dir(tmp_path) / "c.bin"), low, [_video()])
    assert any("low for resolution" in r for r in d.reasons)
    high = FormatInfo(format_name="mp4", bit_rate="700000")
    d2 = classify_web_source(str(_dir(tmp_path) / "c.bin"), high, [_video()])
    assert any("high for resolution" in r for r in d2.reasons)


def test_unknown_is_web_like():
    from av1tpu.classify import WebSourceDecision
    assert WebSourceDecision(SOURCE_UNKNOWN, 0.0, []).is_web_like()
    assert WebSourceDecision(SOURCE_WEB_LIKE, 5.0, []).is_web_like()
    assert not WebSourceDecision(SOURCE_DISC_LIKE, -5.0, []).is_web_like()
