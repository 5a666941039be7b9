"""Headline benchmark: 1080p→AV1 encode fps per chip.

Measures the full per-frame encode path (TPU kernels + host C++ entropy
coding) in GOP steady state (1 keyframe + P-frames) on synthetic 1080p
content, excluding compilation warmup and source generation.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

vs_baseline is value / 400: the north-star target is ≥2× an Intel Arc
A310's av1_vaapi 1080p throughput (BASELINE.md); the reference publishes
no measured number, so we use ~200 fps as the Arc figure (typical
published Arc A310 AV1 1080p hardware-encode rates), giving a 400 fps
target.  vs_baseline ≥ 1.0 means the north star is met.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    import numpy as np

    from av1tpu.spec_engine import SpecTpuEngine
    from av1tpu.utils.testsrc import testsrc2

    width, height = 1920, 1080
    # warmup must cover BOTH dispatch shapes incl. one full P-frame
    # chunk (key + 12 P = one 8-chunk + remainder singles); otherwise
    # the timed region pays one-time chunk costs
    warmup, timed = 13, 24

    # the axon tunnel's first D2H transfer can stall for minutes:
    # absorb it on a side thread while source frames generate
    import threading

    def _warm_channel():
        try:
            import jax
            import jax.numpy as jnp
            jax.device_get(jnp.zeros((8,), jnp.int32) + 1)
        except Exception:
            pass

    warm = threading.Thread(target=_warm_channel, daemon=True)
    warm.start()

    frames = [testsrc2(width, height, i) for i in range(warmup + timed)]
    warm.join()

    engine = SpecTpuEngine()
    engine.cfg.keyint = 120
    engine.start_stream()

    # warmup covers both program shapes the timed region uses: the
    # keyframe jit and the chunked (lax.scan over cfg.chunk P frames)
    # jit.  timed is a multiple of cfg.chunk so no third shape compiles.
    # _prewarm compiles the shapes in parallel threads first (distinct
    # XLA programs compile concurrently; large wall-clock win).
    engine._prewarm(width, height, 8)
    for _ in engine.encode_stream(frames[:warmup], 96):
        pass

    t0 = time.monotonic()
    total_bytes = 0
    for payload, _ in engine.encode_stream(frames[warmup:warmup + timed],
                                           96):
        total_bytes += len(payload)
    dt = time.monotonic() - t0

    fps = timed / dt
    bpp = total_bytes * 8 / timed / (width * height)
    print(json.dumps({
        "metric": "1080p_encode_fps_per_chip",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 400.0, 4),
        "detail": {"frames": timed, "seconds": round(dt, 3),
                   "bits_per_pixel": round(bpp, 4), "qindex": 96,
                   "gop": "1 key + P-frames, keyint 120",
                   "bitstream": "spec-av1"},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
