"""TUI model/view tests (ref: internal/tui) — headless string rendering."""

import numpy as np

from av1tpu import jobs
from av1tpu.tui import view
from av1tpu.tui.metrics import SystemMetrics
from av1tpu.tui.model import Model


def _seed_jobs(tmp_path):
    d = str(tmp_path / "jobs")
    j1 = jobs.new_job("/media/Movie.One.2021.mkv")
    j1.status = jobs.STATUS_SUCCESS
    j1.original_bytes = 4_000_000_000
    j1.new_bytes = 2_000_000_000
    j1.resolution = "1920x1080"
    j1.source_codec = "h264"
    jobs.save_job(j1, d)
    j2 = jobs.new_job("/media/Show.S01E02.Very.Long.Episode.Name.mkv")
    j2.status = jobs.STATUS_RUNNING
    j2.started_at = jobs.now_rfc3339()
    j2.original_bytes = 8_000_000_000
    j2.estimated_bytes = 4_000_000_000
    j2.resolution = "3840x2160"
    j2.source_codec = "hevc"
    j2.bit_depth = 10
    j2.audio_streams = 2
    j2.subtitle_streams = 3
    j2.is_webrip_like = True
    jobs.save_job(j2, d)
    for i in range(3):
        j = jobs.new_job(f"/media/pending{i}.mkv")
        jobs.save_job(j, d)
    return d


def _model(tmp_path):
    m = Model(jobs_dir=_seed_jobs(tmp_path), with_tpu=False)
    m.refresh_jobs()
    m.metrics = SystemMetrics(cpu_percent=42.0, mem_percent=61.0,
                              mem_used_gb=9.8, mem_total_gb=16.0,
                              tpu_percent=37.5, tpu_kind="TPU v5 lite",
                              tpu_count=1, tpu_hbm_used_gb=6.0,
                              tpu_hbm_total_gb=16.0)
    return m


def test_counts_and_active(tmp_path):
    m = _model(tmp_path)
    c = m.counts_by_status()
    assert c["success"] == 1 and c["running"] == 1 and c["pending"] == 3
    assert m.active_job().source_codec == "hevc"
    assert m.total_savings_bytes() == 2_000_000_000


def test_render_bar():
    assert view.render_bar(0) == "░" * view.BAR_WIDTH
    assert view.render_bar(100) == "█" * view.BAR_WIDTH
    half = view.render_bar(50)
    assert half.count("█") == view.BAR_WIDTH // 2


def test_humanize():
    assert view.humanize_bytes(0) == "-"
    assert view.humanize_bytes(1536) == "1.5 KB"
    assert view.humanize_bytes(2_000_000_000) == "1.9 GB"
    assert view.humanize_duration(75) == "1m15s"
    assert view.humanize_duration(3700) == "1h01m40s"


def test_full_render(tmp_path):
    m = _model(tmp_path)
    lines = view.render(m, width=100)
    text = "\n".join(lines)
    assert "SYSTEM METRICS" in text
    assert "TPU" in text and "TPU v5 lite" in text
    assert "QUEUE SUMMARY" in text
    assert "ACTIVE JOB" in text
    assert "Show.S01E02" in text
    assert "JOB QUEUE" in text
    assert "q:quit" in text
    assert "3.7 GB" in text or "3.8 GB" in text  # est size humanized
    # all lines respect the width budget
    assert all(len(line) <= 100 for line in lines)


def test_table_truncation(tmp_path):
    d = str(tmp_path / "jobs2")
    for i in range(20):
        jobs.save_job(jobs.new_job(f"/m/file{i:02d}.mkv"), d)
    m = Model(jobs_dir=d, with_tpu=False)
    m.refresh_jobs()
    lines = view.render_job_table(m, max_rows=12)
    assert "… 8 more jobs" in lines[-1]


def test_jobs_sorted_newest_first(tmp_path):
    d = str(tmp_path / "jobs3")
    a = jobs.new_job("/m/a.mkv")
    a.created_at = "2026-01-01T00:00:00Z"
    b = jobs.new_job("/m/b.mkv")
    b.created_at = "2026-02-01T00:00:00Z"
    jobs.save_job(a, d)
    jobs.save_job(b, d)
    m = Model(jobs_dir=d, with_tpu=False)
    m.refresh_jobs()
    assert m.all_jobs[0].source_path == "/m/b.mkv"


def test_metrics_readers_never_raise():
    from av1tpu.tui import metrics
    m = metrics.collect(with_tpu=False)
    assert 0 <= m.mem_percent <= 100
    assert m.mem_total_gb > 0
