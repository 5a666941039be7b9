"""Frame pipeline: GOP structure, per-frame encode orchestration, recon."""
