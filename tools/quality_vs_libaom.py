"""Head-to-head quality: SpecTpuEngine vs the in-container libaom.

The only obtainable instantiation of BASELINE.json's "equal VMAF"
clause (libvmaf is absent): encode the same synthetic clips with our
engine and with the system libaom (the same binding the conformance
suite uses, av1tpu/conformance/aomcodec.py), then compare Y-PSNR/SSIM
at matched bits.  libaom runs at several cq levels to trace an RD
curve; its PSNR/SSIM are linearly interpolated at our measured bpp so
the comparison is rate-matched rather than point-lucky.

Both encoders are configured GOP-comparably: first frame key, then
P-frames (kf_max_dist high, lag 0).  libaom cpu_used is configurable
(reference hardware encoders sit near cpu 6-8 quality).

Usage: python tools/quality_vs_libaom.py [--clips smooth,grainy,moving]
           [--w 1920 --h 1080] [--frames 16] [--qindex 96] [--cpu 7]
Prints one JSON line per clip plus a summary table on stderr.
"""
from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np

from av1tpu.tools.quality import psnr, ssim


def make_clip(kind: str, w: int, h: int, n: int):
    """Synthetic source triplet generators (SURVEY §4e testsrc analog)."""
    from av1tpu.engine_tpu import Frame
    rng = np.random.default_rng(11)
    out = []
    if kind == "smooth":
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        for i in range(n):
            y = (120 + 80 * np.sin(xx / 97 + i * 0.35) *
                 np.cos(yy / 71 - i * 0.2) +
                 30 * np.sin((xx + 2 * yy) / 301 + i * 0.1)).clip(0, 255)
            bx, by = (20 + 5 * i) % (w - 40), (12 + 3 * i) % (h - 40)
            y[by:by + 32, bx:bx + 32] = 225
            u = (128 + 30 * np.sin(xx[::2, ::2] / 53 + i * .1)).clip(0, 255)
            v = (128 + 30 * np.cos(yy[::2, ::2] / 67 - i * .1)).clip(0, 255)
            out.append(Frame(y=y.astype(np.uint8), u=u.astype(np.uint8),
                             v=v.astype(np.uint8)))
    elif kind == "grainy":
        from av1tpu.utils.testsrc import testsrc2
        out = [testsrc2(w, h, i) for i in range(n)]
    elif kind == "moving":
        base = rng.integers(16, 240, (h + 256, w + 256)).astype(np.uint8)
        # blur the noise field into textured content
        b = base.astype(np.int32)
        for _ in range(2):
            b = (b + np.roll(b, 1, 0) + np.roll(b, 1, 1) +
                 np.roll(b, -1, 0) + np.roll(b, -1, 1)) // 5
        for i in range(n):
            dy, dx = 3 * i, 5 * i
            y = b[dy:dy + h, dx:dx + w].astype(np.uint8)
            u = np.full((h // 2, w // 2), 120, np.uint8)
            v = b[dy // 2:dy // 2 + h // 2,
                  dx // 2:dx // 2 + w // 2].astype(np.uint8)
            out.append(Frame(y=y, u=u, v=v))
    else:
        raise ValueError(kind)
    return out


def encode_ours(frames, qindex: int):
    """SpecTpuEngine encode; returns (total_bytes, [recon_y planes])."""
    from av1tpu.conformance import aomcodec
    from av1tpu.spec_engine import SpecTpuEngine
    eng = SpecTpuEngine()
    eng.cfg.keyint = 1000
    eng.start_stream()
    h, w = frames[0].y.shape
    eng._prewarm(w, h, frames[0].bit_depth)
    total = 0
    payloads = []
    for payload, _ in eng.encode_stream(frames, qindex):
        total += len(payload)
        payloads.append(payload)
    dec = aomcodec.Decoder()
    recons = []
    for p in payloads:
        for f in dec.decode(bytes(p)):
            recons.append(np.asarray(f[0]))
    return total, recons


def encode_libaom(frames, cq: int, cpu: int):
    from av1tpu.conformance import aomcodec
    h, w = frames[0].y.shape
    enc = aomcodec.Encoder(w, h, cpu_used=cpu, cq_level=cq, threads=1,
                           kf_max_dist=9999)
    tus = []
    for fr in frames:
        tus += enc.encode(fr.y, fr.u, fr.v)
    tus += enc.flush()
    enc.close()
    total = sum(len(t) for t in tus)
    dec = aomcodec.Decoder()
    recons = []
    for t in tus:
        for f in dec.decode(bytes(t)):
            recons.append(np.asarray(f[0]))
    return total, recons


def score(frames, recons):
    ps = [psnr(f.y, r) for f, r in zip(frames, recons)]
    ss = [ssim(f.y, r) for f, r in zip(frames, recons)]
    return float(np.mean(ps)), float(np.mean(ss))


def interp_at(bpp, pts):
    """Linear interp of (psnr, ssim) at bpp from [(bpp_i, ps, ss)];
    CLAMPED at the ladder ends (linear extrapolation of an RD curve
    fabricates absurd values — a +0.23 bpp overshoot once 'predicted'
    81 dB).  Returns (psnr, ssim, clamped_flag)."""
    pts = sorted(pts)
    bs = [p[0] for p in pts]
    if bpp <= bs[0]:
        return pts[0][1], pts[0][2], True
    if bpp >= bs[-1]:
        return pts[-1][1], pts[-1][2], True
    i1 = next(i for i, b in enumerate(bs) if b >= bpp)
    i0 = i1 - 1
    b0, p0, s0 = pts[i0]
    b1, p1, s1 = pts[i1]
    t = 0.0 if b1 == b0 else (bpp - b0) / (b1 - b0)
    return p0 + t * (p1 - p0), s0 + t * (s1 - s0), False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", default="smooth,grainy,moving")
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--qindex", type=int, default=96)
    ap.add_argument("--cpu", type=int, default=7)
    # NOTE libaom cq_level is 0..63 (values above clamp silently) and
    # maps ~qindex/4: our 1080p ladder point q96 sits near cq 24, so
    # the default ladder brackets it
    ap.add_argument("--cqs", default="12,24,36,48")
    args = ap.parse_args()
    cqs = [int(x) for x in args.cqs.split(",")]
    px = args.w * args.h * args.frames

    for kind in args.clips.split(","):
        frames = make_clip(kind, args.w, args.h, args.frames)
        ob, orec = encode_ours(frames, args.qindex)
        obpp = ob * 8 / px
        ops, oss = score(frames, orec)
        pts = []
        for cq in cqs:
            lb, lrec = encode_libaom(frames, cq, args.cpu)
            lps, lss = score(frames, lrec)
            pts.append((lb * 8 / px, lps, lss))
            print(f"#  libaom cq={cq}: {lb * 8 / px:.4f} bpp "
                  f"{lps:.2f} dB {lss:.4f}", file=sys.stderr, flush=True)
        ips, iss, clamped = interp_at(obpp, pts)
        print(json.dumps({
            "clip": kind, "w": args.w, "h": args.h,
            "frames": args.frames, "qindex": args.qindex,
            "ours": {"bpp": round(obpp, 4), "y_psnr": round(ops, 2),
                     "y_ssim": round(oss, 4)},
            "libaom_cpu": args.cpu,
            "libaom_rd": [[round(b, 4), round(p, 2), round(s, 4)]
                          for b, p, s in pts],
            "libaom_at_our_bpp": {"y_psnr": round(ips, 2),
                                  "y_ssim": round(iss, 4),
                                  "clamped_to_ladder_end": clamped},
            "delta": {"y_psnr": round(ops - ips, 2),
                      "y_ssim": round(oss - iss, 4)},
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
