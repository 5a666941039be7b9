"""Shared utilities: synthetic sources, timing, logging."""
