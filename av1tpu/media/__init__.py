"""Media layer: container demux/mux and probing (no external ffmpeg).

  probe     — ProbeFile analog producing ffprobe-JSON-shaped results
              (ref: internal/metadata/probe.go:14-46,125-204)
  ebml      — EBML primitive reader/writer (Matroska's encoding layer)
  mkv       — Matroska demuxer (probe + packet/stream extraction)
  mkv_mux   — Matroska muxer (V_AV1 video + copied audio/subs + chapters)
  mp4       — ISOBMFF/MP4 demuxer (probe + sample extraction)
  ivf       — IVF container for raw AV1 streams (test/bench format)
  obu       — AV1 OBU framing + sequence header read/write
"""
