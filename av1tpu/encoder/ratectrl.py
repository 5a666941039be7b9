"""Rate-control policy: quality ladder, qindex mapping, size estimation.

The ladder mirrors the reference's resolution-based global_quality selection
(internal/ffmpeg/transcode.go:157-165) and the output-size estimator mirrors
cmd/av1d/main.go:355-461 including its bits-per-pixel-per-frame model
(main.go:417-427).  The ladder-to-AV1-qindex mapping is new (the reference
delegates quality interpretation to the VAAPI driver).

Pure Python — no jax imports — so the daemon scan path stays light.
"""

from __future__ import annotations

from typing import Optional


def determine_quality(height: int) -> int:
    """global_quality by height (transcode.go:157-165).

    >=1440 -> 23; >=1080 -> 24; else 25.
    """
    if height >= 1440:
        return 23
    if height >= 1080:
        return 24
    return 25


# Mapping of the reference's VAAPI global_quality ladder onto AV1 base_q_idx
# (0..255).  VAAPI ICQ quality for av1_vaapi maps roughly like CRF; the
# Arc driver converts global_quality q to an AV1 quantizer comparable to
# libaom's --cq-level q.  libaom maps cq-level c to qindex ~= 4*c, so
# global_quality 23/24/25 land near qindex 92/96/100.  Tuned constants —
# the size-gate pass-rate parity target (BASELINE.md) is the real spec.
QUALITY_TO_QINDEX = {23: 92, 24: 96, 25: 100}


def quality_to_qindex(quality: int) -> int:
    if quality in QUALITY_TO_QINDEX:
        return QUALITY_TO_QINDEX[quality]
    return max(0, min(255, 4 * quality))


def bits_per_pixel_per_frame(quality: int) -> float:
    """Expected AV1 bits/pixel/frame by ladder point (main.go:417-427)."""
    return {23: 0.15, 24: 0.12, 25: 0.10}.get(quality, 0.12)


def _parse_fps(rate: str) -> Optional[float]:
    """Parse "24000/1001" or "23.976" (main.go:396-411)."""
    if not rate:
        return None
    parts = rate.split("/")
    try:
        if len(parts) == 2:
            num, den = float(parts[0]), float(parts[1])
            if den > 0:
                return num / den
            return None
        return float(rate)
    except ValueError:
        return None


def estimate_output_size(original_size: int, probe_result,
                         quality: int) -> int:
    """Estimated output bytes from bitrate analysis (main.go:355-461).

    Returns 0 when bitrate/duration data is missing, like the reference.
    ``probe_result`` must expose .video_stream, .format (with .duration,
    .bit_rate) and .streams (with .codec_type, .bit_rate).
    """
    vs = probe_result.video_stream
    if vs is None:
        return 0

    try:
        duration = float(probe_result.format.duration)
    except (TypeError, ValueError):
        return 0
    if duration <= 0:
        return 0

    try:
        total_bitrate = float(probe_result.format.bit_rate)
    except (TypeError, ValueError):
        return 0
    if total_bitrate <= 0:
        return 0

    # Video bitrate = total minus audio/subtitle stream bitrates
    video_bitrate = total_bitrate
    for stream in probe_result.streams:
        if stream.codec_type in ("audio", "subtitle") and stream.bit_rate:
            try:
                video_bitrate -= float(stream.bit_rate)
            except ValueError:
                pass

    # If stream bitrates unparseable, assume ~5% audio overhead (main.go:384-389)
    if video_bitrate >= total_bitrate * 0.95:
        video_bitrate = total_bitrate * 0.95

    pixels = float(vs.width * vs.height)
    fps = _parse_fps(vs.avg_frame_rate) or 24.0

    bppf = bits_per_pixel_per_frame(quality)
    estimated_av1_video_bitrate = pixels * bppf * fps
    compression_ratio = estimated_av1_video_bitrate / video_bitrate

    original_video_size = int(original_size * (video_bitrate / total_bitrate))
    estimated_av1_video_size = int(original_video_size * compression_ratio)
    audio_subtitle_size = original_size - original_video_size

    estimated_total = estimated_av1_video_size + audio_subtitle_size
    estimated_total = int(estimated_total * 1.02)  # container overhead

    if estimated_total <= 0:
        return 0
    if estimated_total > original_size:
        estimated_total = int(original_size * 0.95)
    return estimated_total
