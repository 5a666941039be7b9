"""Rate-control report: reactive vs lookahead on the gate target.

For each clip the controller gets a HARD bit budget (a fraction of
what fixed-q would spend — the daemon's size-gate situation on a file
that would otherwise fail, daemon.go:18-21) and the table records how
close each lands: |bpp - target| and gate pass/fail, plus Y-PSNR.

Clips cover the daemon's operating classes (SURVEY §6 configs):
720p-class strip geometry, 1080p textured pan, a mid-clip complexity
step (the lookahead's lead case), and 4K 10-bit.

Usage: python tools/rc_report.py [--quick]  (emits one JSON line per
clip x controller; paste the table into BASELINE.md)
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def make_clip(kind: str, w: int, h: int, n: int, bd: int = 8):
    from av1tpu.engine_tpu import Frame
    from av1tpu.utils.testsrc import testsrc2
    rng = np.random.default_rng(5)
    hi = (1 << bd) - 1
    dt = np.uint8 if bd == 8 else np.uint16
    out = []
    if kind == "moving":
        base = rng.integers(16, hi - 15, (h + 256, w + 256)).astype(
            np.int32)
        for _ in range(2):
            base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1) +
                    np.roll(base, -1, 0) + np.roll(base, -1, 1)) // 5
        for i in range(n):
            dy, dx = 3 * i, 5 * i
            y = base[dy:dy + h, dx:dx + w].astype(dt)
            u = np.full((h // 2, w // 2), hi // 2, dt)
            v = base[dy // 2:dy // 2 + h // 2,
                     dx // 2:dx // 2 + w // 2].astype(dt)
            out.append(Frame(y=y, u=u, v=v, bit_depth=bd))
    elif kind == "step":
        # smooth first half, noisy second half: the reactive
        # controller discovers the step 16 frames late
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        for i in range(n):
            y = (hi / 2 + hi / 3 * np.sin(xx / 61 + i * .3) *
                 np.cos(yy / 47 - i * .2))
            if i >= n // 2:
                y = y + rng.integers(0, hi // 4, (h, w))
            u = np.full((h // 2, w // 2), hi // 2, dt)
            v = np.full((h // 2, w // 2), hi // 2 + 8, dt)
            out.append(Frame(y=np.clip(y, 0, hi).astype(dt), u=u, v=v,
                             bit_depth=bd))
    else:  # grainy
        out = [testsrc2(w, h, i, bit_depth=bd) for i in range(n)]
    return out


def run_one(frames, qindex, ctrl, w, h, n):
    from av1tpu.spec_engine import SpecTpuEngine
    eng = SpecTpuEngine()
    eng.cfg.keyint = 120
    eng.start_stream()
    total = 0
    for payload, _ in eng.encode_stream(frames, ctrl if ctrl else qindex):
        total += len(payload)
    return total * 8 / (w * h * n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    from av1tpu.encoder import ratectrl

    q0 = 96
    clips = [
        ("moving-1080p", "moving", 1920, 1080, 8, 36),
        ("grainy-720p", "grainy", 1280, 720, 8, 36),
        ("step-512", "step", 512, 288, 8, 120),
        ("grainy-4k-10bit", "grainy", 3840, 2160, 10, 8),
    ]
    if args.quick:
        clips = [("step-320", "step", 320, 192, 8, 120),
                 ("moving-320", "moving", 320, 192, 8, 36)]
    for name, kind, w, h, bd, n in clips:
        frames = make_clip(kind, w, h, n, bd)
        # budget: 70% of the fixed-q spend (the gate-fail scenario)
        bpp_fixed = run_one(frames, q0, None, w, h, n)
        target = 0.70 * bpp_fixed
        tbits = target * w * h * n
        for label, mk in (
            ("reactive", lambda: ratectrl.GateRateController(
                q0, tbits, n, 120)),
            ("lookahead", lambda: ratectrl.LookaheadRateController(
                q0, tbits, n, 120)),
        ):
            bpp = run_one(frames, q0, mk(), w, h, n)
            print(json.dumps({
                "clip": name, "ctrl": label, "frames": n,
                "bpp_fixed_q": round(bpp_fixed, 4),
                "target_bpp": round(target, 4),
                "bpp": round(bpp, 4),
                "err_pct": round(100 * (bpp - target) / target, 1),
                "gate_pass": bool(bpp <= target * 1.0001),
            }), flush=True)


if __name__ == "__main__":
    main()
