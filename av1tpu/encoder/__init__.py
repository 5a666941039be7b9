"""The TPU-native AV1 encode engine.

Subpackages (SURVEY.md §7 architecture):
  core     — frame pipeline, GOP structure, rate control, recon loop
  kernels  — dense compute: transforms, intra/inter prediction, motion
             search, MC interpolation, CDEF, RD cost (JAX / Pallas)
  entropy  — host-side bitstream: CDF range coder (C++), OBU/tile packing
  mesh     — multi-chip sharding: shard_map tile-row sharding + halos
  decoder  — the inverse path used for conformance testing

This package's __init__ stays import-light (no jax) so the daemon surface
can run without touching the accelerator runtime.
"""
