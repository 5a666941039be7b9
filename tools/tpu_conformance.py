"""On-TPU conformance smoke: encode on the attached chip, decode with
libaom, assert the device reconstruction is bit-exact.

The CPU test suite (tests/, JAX_PLATFORMS=cpu) proves the *semantics*;
this tool proves the *TPU numerics* — the class of bug it exists for is
real: TPU's default f32 matmul truncates inputs to bfloat16, which is
invisible on CPU and desyncs any float-matmul-derived PREDICTION from
the spec (caught live: the band-matrix quarter-pel refine produced +-1
pred errors on ~10% of luma; fixed with Precision.HIGHEST, see
specav1/jax_inter._qpel_refine9).  Run after ANY change to device-side
recon-affecting code, before benching.

Checks, in order:
  1. pallas_gather kernel vs fallback A/B at 8-bit and 10-bit ranges;
  2. SpecTpuEngine 512x512 GOP (1 key + inter frames with the full
     production toolset: golden, split16, CDEF, LR): libaom recon must
     equal the device recon bit-exactly, frame by frame.

Usage: python tools/tpu_conformance.py [--frames N]   (run ALONE)
"""
import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def check_gather():
    import jax
    import jax.numpy as jnp

    from av1tpu.encoder.kernels import pallas_gather as pg

    rng = np.random.default_rng(3)
    for maxv, tag in ((256, "8-bit"), (1024, "10-bit")):
        for (Hp, Wp, W, B) in [(368, 448, 25, 96), (1104, 1936, 41, 2040),
                               (560, 976, 39, 510)]:
            plane = jnp.asarray(
                rng.integers(0, maxv, (Hp, Wp)).astype(np.int32))
            oy = rng.integers(0, Hp - W + 1, (B,)).astype(np.int32)
            ox = rng.integers(0, Wp - W + 1, (B,)).astype(np.int32)
            ox[:4] = [127, 126, 128, 0]
            oy[:2] = [7, 8]
            a = np.asarray(pg._gather_tpu(plane, jnp.asarray(oy),
                                          jnp.asarray(ox), W))
            b = np.asarray(pg._gather_fallback(plane, jnp.asarray(oy),
                                               jnp.asarray(ox), W))
            assert np.array_equal(a, b), \
                f"gather mismatch {tag} {Hp}x{Wp} W={W} B={B}"
        print(f"gather A/B ok ({tag})")
    jax.clear_caches()


def check_engine(n_frames: int):
    import jax

    from av1tpu.conformance import aomcodec
    from av1tpu.spec_engine import SpecTpuEngine
    from av1tpu.utils.testsrc import testsrc2

    eng = SpecTpuEngine()
    eng.cfg.keyint = 8
    eng.start_stream()
    frames = [testsrc2(512, 512, i) for i in range(n_frames)]
    payloads, recons = [], []
    for fr in frames:
        pend = eng._submit(fr, 96)
        recons.append(tuple(np.asarray(p)
                            for p in jax.device_get(eng._ref_dev)))
        payloads.append(eng._finalize(pend))
    dec = aomcodec.Decoder()
    idx = 0
    for p, _k in payloads:
        for f in dec.decode(bytes(p)):
            for pl in range(3):
                a = np.asarray(f[pl]).astype(np.int64)
                b = np.asarray(recons[idx][pl]).astype(np.int64)
                assert np.array_equal(a, b), (
                    f"frame {idx} plane {pl}: libaom recon diverges "
                    f"from device recon at "
                    f"{np.argwhere(a != b)[:3].tolist()}")
            idx += 1
    assert idx == n_frames
    print(f"engine conformance ok: {n_frames} frames "
          f"(1 key + {n_frames - 1} inter, golden+split16+CDEF+LR) "
          "bit-exact vs libaom")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--skip-gather", action="store_true")
    args = ap.parse_args()
    import jax
    print("backend:", jax.default_backend(), jax.devices())
    if not args.skip_gather:
        check_gather()
    check_engine(args.frames)
    print("TPU CONFORMANCE OK")


if __name__ == "__main__":
    main()
