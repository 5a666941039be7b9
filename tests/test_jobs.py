"""Job schema + persistence parity tests (ref: internal/jobs/jobs.go)."""

import json
import os

from av1tpu import jobs


def test_new_job_defaults():
    j = jobs.new_job("/media/x.mkv")
    assert j.status == jobs.STATUS_PENDING
    assert j.source_path == "/media/x.mkv"
    assert j.is_webrip_like is False
    assert len(j.id) == 36  # uuid4 string
    assert j.created_at


def test_json_field_order_and_omitempty():
    j = jobs.Job(
        id="abc", source_path="/m/x.mkv", created_at="2026-01-01T00:00:00Z",
        status="pending",
    )
    d = j.to_dict()
    # omitempty fields absent when zero (jobs.go:25-46 tags)
    assert list(d.keys()) == ["id", "source_path", "created_at", "status",
                              "is_webrip_like"]

    j2 = jobs.Job(
        id="abc", source_path="/m/x.mkv", output_path="/m/x.av1-tmp.mkv",
        created_at="2026-01-01T00:00:00Z", started_at="2026-01-01T00:01:00Z",
        finished_at="2026-01-01T00:02:00Z", status="success", reason="r",
        original_bytes=100, new_bytes=50, estimated_bytes=60,
        is_webrip_like=True, source_codec="h264", resolution="1920x1080",
        bit_depth=8, frame_rate="24000/1001", container="matroska,webm",
        video_codec="av1", audio_streams=2, subtitle_streams=3,
    )
    d2 = j2.to_dict()
    assert list(d2.keys()) == [
        "id", "source_path", "output_path", "created_at", "started_at",
        "finished_at", "status", "reason", "original_bytes", "new_bytes",
        "estimated_bytes", "is_webrip_like", "source_codec", "resolution",
        "bit_depth", "frame_rate", "container", "video_codec",
        "audio_streams", "subtitle_streams",
    ]


def test_save_load_roundtrip(tmp_path):
    jobs_dir = str(tmp_path / "jobs")
    j = jobs.new_job("/m/a.mkv")
    j.original_bytes = 3_000_000_000
    j.source_codec = "hevc"
    jobs.save_job(j, jobs_dir)

    path = os.path.join(jobs_dir, j.id + ".json")
    assert os.path.exists(path)
    with open(path) as f:
        raw = json.load(f)
    assert raw["id"] == j.id
    assert raw["original_bytes"] == 3_000_000_000
    assert "new_bytes" not in raw  # omitempty

    loaded = jobs.load_all_jobs(jobs_dir)
    assert len(loaded) == 1
    assert loaded[0].source_codec == "hevc"
    assert loaded[0].original_bytes == j.original_bytes


def test_load_tolerates_corrupt_files(tmp_path):
    jobs_dir = tmp_path / "jobs"
    jobs_dir.mkdir()
    (jobs_dir / "bad.json").write_text("{nope")
    (jobs_dir / "notjson.txt").write_text("hi")
    (jobs_dir / "list.json").write_text("[1,2]")
    j = jobs.new_job("/m/a.mkv")
    jobs.save_job(j, str(jobs_dir))
    loaded = jobs.load_all_jobs(str(jobs_dir))
    assert len(loaded) == 1  # jobs.go:83-123 tolerant load


def test_load_missing_dir():
    assert jobs.load_all_jobs("/nonexistent/path/xyz") == []


def test_find_by_source_path():
    a = jobs.new_job("/m/a.mkv")
    b = jobs.new_job("/m/b.mkv")
    assert jobs.find_job_by_source_path([a, b], "/m/b.mkv") is b
    assert jobs.find_job_by_source_path([a, b], "/m/c.mkv") is None


def test_go_parses_our_output_shape(tmp_path):
    """Pretty-printed, 2-space indent, exactly like Go MarshalIndent."""
    j = jobs.Job(id="x", source_path="/m/a.mkv",
                 created_at="2026-01-01T00:00:00Z", status="pending")
    jobs.save_job(j, str(tmp_path))
    text = (tmp_path / "x.json").read_text()
    assert text.startswith('{\n  "id": "x",\n  "source_path": "/m/a.mkv"')
