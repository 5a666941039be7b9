"""Job orchestration and scan driver (ref: internal/daemon, cmd/av1d)."""
