"""Job lifecycle tests with a fake engine (ref: internal/daemon/daemon.go)."""

import os

import pytest

from av1tpu import jobs, sidecars
from av1tpu.daemon import core


class FakeEngine:
    """Writes a file of a configurable size, or raises."""

    def __init__(self, out_bytes=100, fail=False):
        self.out_bytes = out_bytes
        self.fail = fail
        self.calls = []

    def transcode(self, input_path, output_path, probe_result, is_webrip_like):
        self.calls.append((input_path, output_path, is_webrip_like))
        if self.fail:
            raise core.TranscodeError("synthetic failure", exit_code=42)
        with open(output_path, "wb") as f:
            f.write(b"\0" * self.out_bytes)


def _mk_job(tmp_path, size=1000):
    src = tmp_path / "movie.mkv"
    src.write_bytes(b"\1" * size)
    j = jobs.new_job(str(src))
    j.original_bytes = size
    return j, src


def _cfg(tmp_path):
    return core.DaemonConfig(job_state_dir=str(tmp_path / "jobs"),
                             max_size_ratio=0.90,
                             stability_wait_seconds=0.01,
                             decode_verify=False)  # fake engine output


def test_size_gate_math():
    assert core.check_size_gate(1000, 900, 0.90)
    assert not core.check_size_gate(1000, 901, 0.90)
    assert core.check_size_gate(0, 0, 0.90)


def test_tmp_output_path():
    assert core.tmp_output_path("/m/a.b.mkv") == "/m/a.b.av1-tmp.mkv"
    assert core.tmp_output_path("/m/x.mp4") == "/m/x.av1-tmp.mkv"


def test_atomic_replace(tmp_path):
    orig = tmp_path / "a.mkv"
    orig.write_bytes(b"old")
    new = tmp_path / "out.mkv"
    new.write_bytes(b"new")
    core.atomic_replace_file(str(orig), str(new))
    assert orig.read_bytes() == b"new"
    assert not new.exists()
    assert not (tmp_path / "a.av1-tmp.mkv").exists()


def test_success_path(tmp_path):
    j, src = _mk_job(tmp_path, size=1000)
    eng = FakeEngine(out_bytes=500)
    core.process_job(j, eng, None, _cfg(tmp_path))
    assert j.status == jobs.STATUS_SUCCESS
    assert j.new_bytes == 500
    assert src.read_bytes() == b"\0" * 500  # replaced
    assert j.started_at and j.finished_at
    # persisted
    loaded = jobs.load_all_jobs(str(tmp_path / "jobs"))
    assert loaded[0].status == jobs.STATUS_SUCCESS


def test_live_progress_persisted_mid_job(tmp_path):
    """process_job wires engine.progress_cb so per-frame progress is
    visible in the persisted job JSON WHILE the job runs (SURVEY §5
    tracing; the TUI renders the bar from progress_frames)."""
    j, src = _mk_job(tmp_path, size=1000)
    cfg = _cfg(tmp_path)
    seen = {}

    class ProgressEngine(FakeEngine):
        def transcode(self, input_path, output_path, probe_result,
                      is_webrip_like):
            # mid-job: report progress, then check the on-disk record
            self.progress_cb(7, 42)
            loaded = jobs.load_all_jobs(cfg.job_state_dir)
            seen["mid"] = (loaded[0].progress_frames,
                           loaded[0].total_frames)
            super().transcode(input_path, output_path, probe_result,
                              is_webrip_like)

    eng = ProgressEngine(out_bytes=500)
    core.process_job(j, eng, None, cfg)
    assert seen["mid"] == (7, 42)
    # the final success record drops the live counter
    loaded = jobs.load_all_jobs(cfg.job_state_dir)
    assert loaded[0].status == jobs.STATUS_SUCCESS
    assert loaded[0].progress_frames == 0


def test_size_gate_rejection(tmp_path):
    j, src = _mk_job(tmp_path, size=1000)
    eng = FakeEngine(out_bytes=950)  # > 90%
    core.process_job(j, eng, None, _cfg(tmp_path))
    assert j.status == jobs.STATUS_SKIPPED
    assert "size gate" in j.reason
    assert src.read_bytes() == b"\1" * 1000  # original untouched
    assert not os.path.exists(j.output_path)  # temp deleted
    # permanent skip marker + why file (daemon.go:140-146)
    assert sidecars.has_skip_marker(str(src))
    why = tmp_path / "movie.av1qsvd-why.txt"
    assert "size gate" in why.read_text()


def test_size_gate_reason_format(tmp_path):
    j, src = _mk_job(tmp_path, size=200 * 1024 * 1024)
    eng = FakeEngine(out_bytes=195 * 1024 * 1024)
    core.process_job(j, eng, None, _cfg(tmp_path))
    assert j.reason == "size gate: new 195.0 MB vs orig 200.0 MB (>90%)"


def test_engine_failure(tmp_path):
    j, src = _mk_job(tmp_path)
    eng = FakeEngine(fail=True)
    with pytest.raises(core.TranscodeError):
        core.process_job(j, eng, None, _cfg(tmp_path))
    assert j.status == jobs.STATUS_FAILED
    assert "42" in j.reason
    assert src.exists()


def test_unstable_file_skipped(tmp_path, monkeypatch):
    j, src = _mk_job(tmp_path)
    monkeypatch.setattr("av1tpu.scan.check_file_stable",
                        lambda p, w: False)
    eng = FakeEngine()
    core.process_job(j, eng, None, _cfg(tmp_path))
    assert j.status == jobs.STATUS_SKIPPED
    assert j.reason == "file still copying"
    assert eng.calls == []


def test_live_progress_written(tmp_path, monkeypatch):
    """The engine's progress callback streams into the job JSON while
    running, and the final record drops the live counter."""
    import json
    j, src = _mk_job(tmp_path, size=1000)

    class ProgressEngine(FakeEngine):
        def transcode(self, input_path, output_path, probe_result,
                      is_webrip_like):
            cb = getattr(self, "progress_cb", None)
            assert cb is not None
            cb(3, 10)
            # mid-flight job record carries the live counters
            mid = json.load(open(tmp_path / "jobs" / (j.id + ".json")))
            assert mid["progress_frames"] == 3
            assert mid["total_frames"] == 10
            super().transcode(input_path, output_path, probe_result,
                              is_webrip_like)

    eng = ProgressEngine(out_bytes=500)
    core.process_job(j, eng, None, _cfg(tmp_path))
    assert j.status == jobs.STATUS_SUCCESS
    final = json.load(open(tmp_path / "jobs" / (j.id + ".json")))
    assert "progress_frames" not in final  # dropped on completion
