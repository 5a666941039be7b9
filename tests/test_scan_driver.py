"""Scan-driver filter ladder tests (ref: cmd/av1d/main.go:85-273)."""

import os

import pytest

from av1tpu import config as config_mod
from av1tpu import jobs, sidecars
from av1tpu.daemon import main as daemon_main
from av1tpu.media.probe import FormatInfo, ProbeResult, StreamInfo, ProbeError, finalize_probe


def _fake_probe(codec="h264", width=1920, height=1080, fail=False):
    def probe_file(path):
        if fail:
            raise ProbeError("synthetic")
        pr = ProbeResult(
            format=FormatInfo(format_name="matroska,webm", duration="60",
                              bit_rate="8000000"),
            streams=[
                StreamInfo(index=0, codec_name=codec, codec_type="video",
                           width=width, height=height,
                           avg_frame_rate="24/1", r_frame_rate="24/1"),
                StreamInfo(index=1, codec_name="ac3", codec_type="audio",
                           bit_rate="384000"),
            ],
        )
        return finalize_probe(path, pr)
    return probe_file


def _cfg(tmp_path, min_bytes=100):
    cfg = config_mod.default_config()
    cfg.library_roots = [str(tmp_path / "lib")]
    cfg.job_state_dir = str(tmp_path / "jobs")
    cfg.min_bytes = min_bytes
    return cfg


def _mkfile(tmp_path, name, size=1000):
    lib = tmp_path / "lib"
    lib.mkdir(exist_ok=True)
    p = lib / name
    p.write_bytes(b"\1" * size)
    return p


def test_accepts_large_h264(tmp_path, monkeypatch):
    monkeypatch.setattr(daemon_main.probe_mod, "probe_file", _fake_probe())
    _mkfile(tmp_path, "a.mkv")
    res = daemon_main.scan_library(_cfg(tmp_path), [])
    assert len(res.candidates) == 1
    assert len(res.new_jobs) == 1
    j = res.new_jobs[0]
    assert j.status == jobs.STATUS_PENDING
    assert j.source_codec == "h264"
    assert j.resolution == "1920x1080"
    assert j.audio_streams == 1
    assert j.container == "matroska,webm"
    assert j.estimated_bytes > 0
    # classification sidecar written (main.go:261)
    assert (tmp_path / "lib" / "a.av1qsvd-classification.txt").exists()
    # job persisted
    assert len(jobs.load_all_jobs(str(tmp_path / "jobs"))) == 1


def test_extension_filter(tmp_path, monkeypatch):
    monkeypatch.setattr(daemon_main.probe_mod, "probe_file", _fake_probe())
    _mkfile(tmp_path, "notes.txt")
    _mkfile(tmp_path, "clip.avi")
    res = daemon_main.scan_library(_cfg(tmp_path), [])
    assert res.candidates == [] and res.skipped == []


def test_min_size_filter_is_strict_le(tmp_path, monkeypatch):
    monkeypatch.setattr(daemon_main.probe_mod, "probe_file", _fake_probe())
    _mkfile(tmp_path, "small.mkv", size=100)  # == min_bytes → skipped
    res = daemon_main.scan_library(_cfg(tmp_path, min_bytes=100), [])
    assert len(res.skipped) == 1
    assert "file < 2GB" in res.skipped[0].reason


def test_skip_marker(tmp_path, monkeypatch):
    monkeypatch.setattr(daemon_main.probe_mod, "probe_file", _fake_probe())
    p = _mkfile(tmp_path, "a.mkv")
    sidecars.write_skip_marker(str(p))
    res = daemon_main.scan_library(_cfg(tmp_path), [])
    assert res.candidates == []
    assert res.skipped[0].reason == "marked with .av1qsvd-skip"


def test_already_av1_skipped(tmp_path, monkeypatch):
    monkeypatch.setattr(daemon_main.probe_mod, "probe_file",
                        _fake_probe(codec="av1"))
    _mkfile(tmp_path, "a.mkv")
    res = daemon_main.scan_library(_cfg(tmp_path), [])
    assert res.skipped[0].reason == "already av1"


def test_probe_failure_skipped(tmp_path, monkeypatch):
    monkeypatch.setattr(daemon_main.probe_mod, "probe_file",
                        _fake_probe(fail=True))
    _mkfile(tmp_path, "a.mkv")
    res = daemon_main.scan_library(_cfg(tmp_path), [])
    assert "probe failed" in res.skipped[0].reason


def test_success_job_not_rescanned(tmp_path, monkeypatch):
    monkeypatch.setattr(daemon_main.probe_mod, "probe_file", _fake_probe())
    p = _mkfile(tmp_path, "a.mkv")
    done = jobs.new_job(str(p))
    done.status = jobs.STATUS_SUCCESS
    res = daemon_main.scan_library(_cfg(tmp_path), [done])
    assert res.candidates == []


def test_failed_job_reset_to_pending(tmp_path, monkeypatch):
    monkeypatch.setattr(daemon_main.probe_mod, "probe_file", _fake_probe())
    p = _mkfile(tmp_path, "a.mkv")
    old = jobs.new_job(str(p))
    old.status = jobs.STATUS_FAILED
    old.reason = "old failure"
    old.finished_at = "2026-01-01T00:00:00Z"
    res = daemon_main.scan_library(_cfg(tmp_path), [old])
    assert len(res.new_jobs) == 1
    j = res.new_jobs[0]
    assert j.id == old.id  # job record reused (main.go:186-196)
    assert j.status == jobs.STATUS_PENDING
    assert j.reason == ""
    assert j.finished_at is None


def test_quality_ladder():
    from av1tpu.encoder.ratectrl import determine_quality
    assert determine_quality(2160) == 23
    assert determine_quality(1440) == 23
    assert determine_quality(1439) == 24
    assert determine_quality(1080) == 24
    assert determine_quality(1079) == 25
    assert determine_quality(720) == 25


def test_estimate_output_size(tmp_path):
    pr = _fake_probe()(str(tmp_path / "x.mkv"))
    # 1080p @24fps, q24: video bitrate = 8e6-384e3; av1 est = w*h*0.12*24
    est = __import__("av1tpu.encoder.ratectrl", fromlist=["x"]) \
        .estimate_output_size(1_000_000, pr, 24)
    assert 0 < est < 1_000_000


def test_estimate_returns_zero_without_bitrate(tmp_path):
    pr = _fake_probe()(str(tmp_path / "x.mkv"))
    pr.format.bit_rate = ""
    from av1tpu.encoder.ratectrl import estimate_output_size
    assert estimate_output_size(1_000_000, pr, 24) == 0
