"""Encode a clip (synthetic or video file) to av1tpu IVF; optionally verify.

Usage:
  python -m av1tpu.tools.encode_clip --width 320 --height 192 --frames 8 \
      --out /tmp/x.ivf [--qindex 96] [--input source.mp4] [--verify]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--qindex", type=int, default=96)
    p.add_argument("--keyint", type=int, default=120)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--fps", type=int, default=24)
    p.add_argument("--input", help="source video (default: synthetic testsrc)")
    p.add_argument("--out", required=True)
    p.add_argument("--verify", action="store_true",
                   help="decode back and report PSNR")
    args = p.parse_args(argv)

    import numpy as np

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from av1tpu.engine_tpu import TpuEngine
    from av1tpu.media import ivf, obu as obu_mod
    from av1tpu.utils.testsrc import testsrc2

    engine = TpuEngine()
    engine.cfg.keyint = args.keyint
    if args.input:
        frames = []
        for i, fr in enumerate(TpuEngine.iter_source_frames(args.input)):
            if i >= args.frames:
                break
            frames.append(fr)
    else:
        frames = [testsrc2(args.width, args.height, i)
                  for i in range(args.frames)]
    if not frames:
        print("no frames", file=sys.stderr)
        return 1
    w, h = frames[0].width, frames[0].height
    sh = engine.sequence_header(w, h)

    t0 = time.monotonic()
    total = 0
    with open(args.out, "wb") as f:
        ivf.write_header(f, w, h, args.fps, 1, len(frames))
        engine.start_stream()
        n_key = 0
        for i, fr in enumerate(frames):
            payload, is_key = engine.encode_next(fr, args.qindex)
            n_key += is_key
            unit = obu_mod.write_obu(obu_mod.OBU_TEMPORAL_DELIMITER, b"")
            if i == 0:
                unit += obu_mod.write_obu(obu_mod.OBU_SEQUENCE_HEADER,
                                          sh.write())
            unit += payload
            ivf.write_frame(f, unit, i)
            total += len(unit)
    dt = time.monotonic() - t0
    print(f"encoded {len(frames)} frames ({n_key} key) {w}x{h} "
          f"q={args.qindex} in {dt:.2f}s ({len(frames)/dt:.2f} fps), "
          f"{total} bytes ({total*8/len(frames)/(w*h):.4f} bpp)")

    if args.verify:
        from av1tpu.legacy import decoder
        out = decoder.decode_ivf(args.out)
        psnrs = []
        for src, dec in zip(frames, out):
            err = src.y.astype(np.float64) - dec.y.astype(np.float64)
            mse = (err ** 2).mean()
            psnrs.append(99.0 if mse == 0 else 10 * np.log10(255 ** 2 / mse))
        print(f"decoded {len(out)} frames, Y-PSNR avg "
              f"{sum(psnrs)/len(psnrs):.2f} dB "
              f"(min {min(psnrs):.2f}, max {max(psnrs):.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
