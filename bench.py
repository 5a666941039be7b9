"""Headline benchmark: 1080p→AV1 encode fps per chip (spec bitstream).

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

Harness design (round-3): the axon tunnel's first device→host transfer
stalls nondeterministically (observed 4 s … >9.5 min; round-2's recorded
bench timed out on it).  The bench therefore runs as a parent watchdog
plus a measuring child:

  * the parent enforces a total budget (AV1TPU_BENCH_BUDGET, default
    500 s), kills a child whose channel-warm stalls past a per-attempt
    deadline and re-execs it (a fresh process re-rolls the stall), and
    ALWAYS emits a parseable JSON line — relaying the child's, or a
    degraded line built from the child's partial progress — before any
    external timeout can fire (also on SIGTERM).
  * the child absorbs the stall on a side thread while source frames
    generate, compiles via the persistent XLA cache (verified to hit
    across processes: 1080p prewarm 53 s cold → 20 s cached), sizes the
    timed region to the time remaining, and streams progress lines
    ("#PROG {...}") the parent can fall back on.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

WIDTH, HEIGHT = 1920, 1080
TARGET_FPS = 400.0
# full config: warmup covers BOTH dispatch shapes incl. one full P-frame
# chunk (key + 12 P = one 8-chunk + remainder singles); timed is a
# multiple of cfg.chunk so no third shape compiles inside the timed region
FULL_WARMUP, FULL_TIMED = 13, 24


def _json_line(fps: float, bpp: float, frames: int, seconds: float,
               degraded: str | None = None) -> str:
    detail = {"frames": frames, "seconds": round(seconds, 3),
              "bits_per_pixel": round(bpp, 4), "qindex": 96,
              "gop": "1 key + P-frames, keyint 120",
              "bitstream": "spec-av1"}
    if degraded:
        detail["degraded"] = degraded
    return json.dumps({
        "metric": "1080p_encode_fps_per_chip",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / TARGET_FPS, 4),
        "detail": detail,
    })


# ---------------------------------------------------------------------------
# child: the actual measurement
# ---------------------------------------------------------------------------

def _prog(**kw) -> None:
    print("#PROG " + json.dumps(kw), flush=True)


def child_main() -> int:
    budget = float(os.environ.get("AV1TPU_BENCH_CHILD_BUDGET", "480"))
    t0 = time.monotonic()

    def rem() -> float:
        return budget - (time.monotonic() - t0)

    import threading

    import numpy as np  # noqa: F401  (import cost paid before timing)

    warm_done = threading.Event()

    def _warm_channel():
        # The claim of a pool chip can block for minutes (shared-pool
        # queue) or RAISE (e.g. a just-killed predecessor's session
        # lock not yet released).  A raise must not end the attempt:
        # retry inside the same process until the parent's budget says
        # stop — re-execing re-enters the queue at the back.
        while rem() > 15:
            try:
                import jax
                import jax.numpy as jnp
                jax.device_get(jnp.zeros((8,), jnp.int32) + 1)
                break
            except Exception as e:
                _prog(stage="warm_error", error=repr(e)[:200],
                      t=round(time.monotonic() - t0, 1))
                # a failed init is cached by xla_bridge — clear it or
                # every retry re-raises instantly
                try:
                    import jax
                    jax.extend.backend.clear_backends()
                except Exception:
                    pass
                time.sleep(5.0)
        warm_done.set()
        _prog(stage="warm_ok", t=round(time.monotonic() - t0, 1))

    threading.Thread(target=_warm_channel, daemon=True).start()

    # overlap the stall with source generation (the stall is wall-clock
    # idle; frame synthesis is pure host CPU)
    from av1tpu.utils.testsrc import testsrc2

    frames = [testsrc2(WIDTH, HEIGHT, i)
              for i in range(FULL_WARMUP + FULL_TIMED)]
    _prog(stage="frames_ready", t=round(time.monotonic() - t0, 1))
    warm_done.wait()  # parent enforces the deadline by killing us

    from av1tpu.spec_engine import SpecTpuEngine

    engine = SpecTpuEngine()
    engine.cfg.keyint = 120
    engine.start_stream()
    _prog(stage="prewarm_start", t=round(time.monotonic() - t0, 1))
    engine._prewarm(WIDTH, HEIGHT, 8)
    _prog(stage="prewarm_ok", t=round(time.monotonic() - t0, 1))

    # size the run to the time left: the degraded configs trade timed
    # frames (measurement noise) for fitting inside the watchdog budget
    r = rem()
    if r >= 60:
        warmup, timed = FULL_WARMUP, FULL_TIMED
    elif r >= 30:
        warmup, timed = 9, 8
    else:
        warmup, timed = 1, 4

    for _ in engine.encode_stream(frames[:warmup], 96):
        pass
    _prog(stage="warmed", t=round(time.monotonic() - t0, 1),
          warmup=warmup, timed=timed)

    ts = time.monotonic()
    total_bytes = 0
    done = 0
    for payload, _ in engine.encode_stream(
            frames[warmup:warmup + timed], 96):
        total_bytes += len(payload)
        done += 1
        dt = time.monotonic() - ts
        # partial-progress breadcrumbs: the parent can compute an honest
        # degraded number from the last one if it must kill us
        _prog(stage="timed", frames=done, seconds=round(dt, 3),
              bytes=total_bytes)
    dt = time.monotonic() - ts

    fps = done / dt
    bpp = total_bytes * 8 / done / (WIDTH * HEIGHT)
    degraded = None if (warmup, timed) == (FULL_WARMUP, FULL_TIMED) \
        else f"short timed region ({timed} frames) to fit time budget"
    print(_json_line(fps, bpp, done, dt, degraded), flush=True)
    return 0


# ---------------------------------------------------------------------------
# parent: watchdog + guaranteed emission
# ---------------------------------------------------------------------------

class _Watchdog:
    def __init__(self, budget: float):
        self.budget = budget
        self.t0 = time.monotonic()
        self.emitted = False
        self.last_partial = None  # dict from the child's "timed" PROGs
        self.child: subprocess.Popen | None = None

    def rem(self) -> float:
        return self.budget - (time.monotonic() - self.t0)

    def emit(self, line: str) -> None:
        if self.emitted:
            return
        self.emitted = True
        print(line, flush=True)

    def emit_degraded(self, why: str) -> None:
        p = self.last_partial
        if p and p.get("frames", 0) >= 2 and p.get("seconds", 0) > 0:
            fps = p["frames"] / p["seconds"]
            bpp = p["bytes"] * 8 / p["frames"] / (WIDTH * HEIGHT)
            self.emit(_json_line(fps, bpp, p["frames"], p["seconds"],
                                 degraded=f"partial timed region: {why}"))
        else:
            self.emit(_json_line(0.0, 0.0, 0, 0.0,
                                 degraded=f"no timed frames: {why}"))

    def kill_child(self) -> None:
        c = self.child
        if c is not None and c.poll() is None:
            try:
                c.kill()
            except OSError:
                pass


def parent_main() -> int:
    budget = float(os.environ.get("AV1TPU_BENCH_BUDGET", "500"))
    wd = _Watchdog(budget)

    def on_term(signum, frame):
        wd.emit_degraded(f"signal {signum} before completion")
        wd.kill_child()
        os._exit(0)

    signal.signal(signal.SIGTERM, on_term)
    signal.signal(signal.SIGINT, on_term)

    import queue
    import threading

    attempt = 0
    while not wd.emitted and wd.rem() > 45:
        attempt += 1
        # Attempt 1 bets on a fast stall roll (observed floor ~25 s):
        # short deadline, kill + re-exec re-rolls the distribution.
        # Attempt 2+ WAITS THE STALL OUT: the round-2 recorded bench
        # died by re-roll thrash when every roll came up long (>110 s),
        # so the fallback is a single long wait reserving ~90 s for the
        # (possibly cold-compile) prewarm + degraded timed region.
        if attempt == 1 and wd.rem() > 300:
            warm_deadline = 90.0
        else:
            warm_deadline = max(20.0, wd.rem() - 90.0)
        env = dict(os.environ)
        env["AV1TPU_BENCH_CHILD_BUDGET"] = str(max(30.0, wd.rem() - 10.0))
        err_path = f"/tmp/av1tpu_bench_child{attempt}.err"
        try:
            err_f = open(err_path, "w")
        except OSError:
            err_f = subprocess.DEVNULL
        wd.child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child"],
            stdout=subprocess.PIPE, stderr=err_f,
            text=True, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        lines: queue.Queue = queue.Queue()

        def _pump(pipe, q):
            for ln in pipe:
                q.put(ln)
            q.put(None)  # EOF sentinel

        threading.Thread(target=_pump, args=(wd.child.stdout, lines),
                         daemon=True).start()
        warm_ok = False
        t_attempt = time.monotonic()
        while True:
            if not warm_ok and time.monotonic() - t_attempt > warm_deadline:
                # stall exceeded the attempt deadline: re-exec re-rolls it
                wd.kill_child()
                break
            if wd.rem() < 8:
                wd.emit_degraded("budget exhausted")
                wd.kill_child()
                break
            try:
                ln = lines.get(timeout=1.0)
            except queue.Empty:
                continue
            if ln is None:
                break  # EOF: child exited without a JSON line
            line = ln.strip()
            if line.startswith("#PROG "):
                try:
                    p = json.loads(line[6:])
                except ValueError:
                    continue
                if p.get("stage") == "warm_ok":
                    warm_ok = True
                elif p.get("stage") == "timed":
                    wd.last_partial = p
            elif line.startswith("{"):
                wd.emit(line)
                break
        if wd.emitted:
            break
    if not wd.emitted:
        wd.emit_degraded(
            f"device channel stall exceeded budget over {attempt} attempts")
    wd.kill_child()
    return 0


def main() -> int:
    if "--child" in sys.argv:
        return child_main()
    return parent_main()


if __name__ == "__main__":
    sys.exit(main())
