"""av1tpu — TPU-native AV1 transcoding daemon.

A from-scratch, TPU-first rebuild of the capabilities of IONIQ6000/av1-go:
the daemon surface (job JSON schema, sidecar semantics, size-gate and
atomic-replace behavior, config keys) is byte-compatible with the reference,
while the encode engine is a from-scratch JAX/Pallas AV1 encoder running on
TPU instead of an exec'd FFmpeg binary with Intel Arc VAAPI encoding.

Package layout (see SURVEY.md §7):
  av1tpu.config    — config load/defaults   (ref: internal/config/config.go)
  av1tpu.jobs      — job model/persistence  (ref: internal/jobs/jobs.go)
  av1tpu.scan      — stability check        (ref: internal/scan/scan.go)
  av1tpu.classify  — web/disc classifier    (ref: internal/metadata/probe.go:208-394)
  av1tpu.sidecars  — why/skip/classification sidecar files
  av1tpu.daemon    — job lifecycle + scan driver (ref: internal/daemon, cmd/av1d)
  av1tpu.media     — EBML/Matroska + MP4 demux/mux, probe, OBU/IVF
  av1tpu.encoder   — the JAX/Pallas AV1 encoder (core/kernels/entropy/mesh)
  av1tpu.tui       — dashboard (ref: internal/tui)
"""

__version__ = "0.1.0"
