"""Profile the native spec tile writer's host cost per 1080p frame.

The host entropy path is the production fps ceiling once device compute
is ~10 ms/frame (BASELINE.md round-2 accounting).  This tool times the
C++ tile walk (stw_encode_inter32) against realistic level densities,
broken down by (a) tile-row parallel speedup, (b) level density, and
(c) split fraction, and prints a one-line-per-config table for
BASELINE.md's host budget section.

Usage: python -m tools.profile_entropy [--frames N]
Run ALONE (any concurrent process halves the numbers on the 1-vCPU
container host).
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from av1tpu.specav1 import native
from av1tpu.specav1 import writer as W


def synth_frame(rng, w, h, density, split_frac):
    """Realistic post-quant grids: `density` fraction of nonzero luma
    coefficients clustered in txb low-frequency corners."""
    gh, gw = h // 32, w // 32
    ylv = np.zeros((h, w), np.int32)
    ulv = np.zeros((h // 2, w // 2), np.int32)
    vlv = np.zeros((h // 2, w // 2), np.int32)
    # low-freq clustered nonzeros: fill an 8x8 corner per 32x32 txb
    n_y = int(density * h * w)
    by = rng.integers(0, gh, n_y)
    bx = rng.integers(0, gw, n_y)
    oy = rng.integers(0, 8, n_y)
    ox = rng.integers(0, 8, n_y)
    ylv[by * 32 + oy, bx * 32 + ox] = rng.integers(1, 8, n_y) * \
        rng.choice([-1, 1], n_y)
    n_c = n_y // 8
    by = rng.integers(0, gh, n_c)
    bx = rng.integers(0, gw, n_c)
    oy = rng.integers(0, 4, n_c)
    ox = rng.integers(0, 4, n_c)
    ulv[by * 16 + oy, bx * 16 + ox] = rng.integers(1, 5, n_c)
    vlv[by * 16 + oy, bx * 16 + ox] = rng.integers(1, 5, n_c)
    modes = np.ones((gh, gw), np.int32)
    mvs = (rng.integers(-24, 25, (gh, gw, 2)) * 2).astype(np.int32)
    skips = (ylv.reshape(gh, 32, gw, 32).sum((1, 3)) == 0).astype(
        np.int32)
    splits = ((rng.random((gh, gw)) < split_frac) & (skips == 0)).astype(
        np.int32)
    mvs16 = (rng.integers(-24, 25, (gh, gw, 4, 2)) * 2).astype(np.int32)
    skips16 = (rng.random((gh, gw, 4)) < 0.3).astype(np.int32)
    return (modes, mvs, skips, ylv, ulv, vlv, splits, mvs16, skips16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1088)
    args = ap.parse_args()
    w, h = args.width, args.height
    mi_cols, mi_rows = w // 4, h // 4
    trl2, spans, _ = __import__(
        "av1tpu.spec_engine", fromlist=["_tile_plan"])._tile_plan(h)
    rng = np.random.default_rng(0)
    print(f"# native tile writer, {w}x{h}, {len(spans)} tile rows, "
          f"{args.frames} frames per point")
    for density in (0.01, 0.02, 0.04):
        for split_frac in (0.0, 0.25):
            frames = [synth_frame(rng, w, h, density, split_frac)
                      for _ in range(3)]
            # warm
            f = frames[0]
            native.encode_tile_rows(
                "inter", 96, mi_cols, mi_rows, spans,
                (f[0], f[1], f[2]), f[3], f[4], f[5],
                split3=(f[6], f[7], f[8]))
            t0 = time.perf_counter()
            nb = 0
            for i in range(args.frames):
                f = frames[i % 3]
                tiles = native.encode_tile_rows(
                    "inter", 96, mi_cols, mi_rows, spans,
                    (f[0], f[1], f[2]), f[3], f[4], f[5],
                    split3=(f[6], f[7], f[8]))
                nb += sum(len(t) for t in tiles)
            dt = (time.perf_counter() - t0) / args.frames
            print(f"density={density:.2f} split={split_frac:.2f}: "
                  f"{dt * 1000:7.2f} ms/frame  "
                  f"({nb / args.frames / 1024:.0f} KiB/frame)")


if __name__ == "__main__":
    main()
