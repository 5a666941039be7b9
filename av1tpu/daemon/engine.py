"""Engine bootstrap and self-test (the EnsureFFmpeg/VerifyFFmpeg analog).

The reference downloads a static ffmpeg, verifies its version and encoder
list, and runs a live 1-frame 1280x720 synthetic encode at every daemon
start (internal/ffmpeg/binary.go:21-310).  Our engine is in-process, so
"ensure" reduces to constructing it against the visible TPU devices, and
"verify" runs the same hermetic smoke test: one synthetic 1280x720 frame
through the full TPU encode path (binary.go:282-295 analog).
"""

from __future__ import annotations

import logging
import time

log = logging.getLogger("av1tpu.engine")


class EngineError(Exception):
    """Actionable engine bootstrap/self-test failure (binary.go:313-330 analog)."""


def make_engine(cfg):
    # multi-host (DCN) init is env-driven and a no-op on single hosts;
    # must run before the first device touch so jax.devices() spans the
    # whole job (encoder/mesh/distributed.py)
    from av1tpu.encoder.mesh import distributed
    distributed.maybe_initialize()
    """Construct the configured engine ("tpu" is the only real engine)."""
    if cfg.encoder != "tpu":
        raise EngineError(
            f"unknown encoder '{cfg.encoder}' (this build provides 'tpu'); "
            "set \"encoder\": \"tpu\" in the config")
    try:
        if getattr(cfg.tpu, "bitstream", "spec") == "av1tpu":
            from av1tpu.engine_tpu import TpuEngine
            return TpuEngine(cfg.tpu)
        from av1tpu.spec_engine import SpecTpuEngine
        return SpecTpuEngine(cfg.tpu)
    except ImportError as e:
        raise EngineError(f"TPU engine unavailable: {e}") from e


def verify_engine(engine, size: str = "1280x720") -> float:
    """1-frame synthetic encode self-test; returns elapsed seconds.

    Hermetic input, real hardware — the analog of the reference's
    ``-f lavfi -i testsrc2=s=1280x720:d=1 ... -c:v av1_qsv -f null -``
    startup probe (binary.go:244-310).  Raises EngineError on failure with
    an actionable message.  ``size`` is configurable (tpu.self_test_size)
    because first-compile of a fresh shape costs minutes on tunneled TPU
    platforms without an effective XLA compile cache.
    """
    from av1tpu.utils.testsrc import testsrc2
    try:
        w, h = (int(x) for x in size.lower().split("x"))
    except ValueError:
        w, h = 1280, 720
    frame = testsrc2(w, h, frame_index=0)
    t0 = time.monotonic()
    try:
        payload = engine.encode_smoke_frame(frame)
    except Exception as e:
        raise EngineError(
            f"TPU self-test encode failed: {e}; check that the TPU runtime "
            "is healthy (jax.devices()) and no other process holds the chip"
        ) from e
    if not payload:
        raise EngineError("TPU self-test encode produced no bitstream")
    dt = time.monotonic() - t0
    log.info("engine self-test OK: 1 frame 1280x720 in %.2fs (%d bytes)",
             dt, len(payload))
    return dt
