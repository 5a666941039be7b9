"""Observability dashboard (ref: internal/tui): job queue + system metrics."""
