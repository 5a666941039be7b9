"""Retired round-1 private-bitstream engine (namespaced, heavy-tier
tested only).

The production encoder is the standard-AV1 SpecTpuEngine
(av1tpu/spec_engine.py + av1tpu/specav1/); these modules are the
round-1 engine it replaced: a private (non-conformant) bitstream with
its own decoder, tile codec, frame kernels, and mesh sharding.  They
are kept for the heavy-tier parity tests (tests/test_golden.py etc.)
and the `tpu.bitstream: "av1tpu"` compatibility profile, and are not
exercised by the driver's dryrun or the default test tier.
"""
