"""Micro-breakdown of the golden (LAST/GOLDEN selection) device cost.

The round-5 in-frame profile shows golden-only ~22 ms/frame at 1080p.
Times each component standalone (device-resident, RTT-subtracted):
seeded +-8 refine, zero-SSD block sums, full-pel gather SSD, stacked
2-ref MC vs single-ref MC, and 2-ref vs 1-ref qpel refine.
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--h", type=int, default=1088)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from av1tpu.encoder.kernels import motion, pallas_motion
    from av1tpu.specav1 import jax_inter

    H, W = args.h, args.w
    PAD = jax_inter.PAD
    n = 32
    B = (H // n) * (W // n)
    rng = np.random.default_rng(7)
    src = jnp.asarray(rng.integers(0, 256, (H, W)), jnp.int32)
    ref = jnp.asarray(rng.integers(0, 256, (H + 2 * PAD, W + 2 * PAD)),
                      jnp.int32)
    gld = jnp.asarray(rng.integers(0, 256, (H + 2 * PAD, W + 2 * PAD)),
                      jnp.int32)
    from av1tpu.encoder.kernels import pallas_gather
    refs3 = pallas_gather.make_wide2(ref, gld) + (ref.shape[1],)
    pos = jnp.asarray(motion.block_positions(H, W, n))
    blocks = src.reshape(H // n, n, W // n, n).transpose(
        0, 2, 1, 3).reshape(B, n, n)
    seeds = jnp.zeros((B, 2), jnp.int32)
    mv8 = jnp.zeros((B, 2), jnp.int32)
    ri = jnp.zeros((B,), jnp.int32)

    nfn = jax.jit(lambda a: (a + 1,))
    jax.device_get(nfn(jnp.zeros((2, 2), jnp.int32))[0][0, 0])
    rtts = []
    for _ in range(7):
        t0 = time.perf_counter()
        jax.device_get(nfn(jnp.zeros((2, 2), jnp.int32))[0][0, 0])
        rtts.append((time.perf_counter() - t0) * 1e3)
    rtt = min(rtts)
    print(f"{W}x{H} B={B} on {jax.devices()[0]}, rtt {rtt:.1f} ms")

    j_search = jax.jit(lambda s, r: motion.search_v3(s, r, n))
    j_refine = jax.jit(lambda b, g, p, s: pallas_motion.
                       refine_around_seeds(b, g, p, s, n, 8, PAD))
    j_zero = jax.jit(lambda s, g: motion._block_sum(
        (s.astype(jnp.float32) -
         jax.lax.dynamic_slice(g, (PAD, PAD),
                               (H, W)).astype(jnp.float32)) ** 2,
        n).reshape(B))
    j_fpssd = jax.jit(lambda r, m, b: (
        (b - motion.gather_blocks(r, pos, m, n).astype(jnp.int32)) ** 2
    ).sum(axis=(1, 2)))
    j_mc1 = jax.jit(lambda r, m: jax_inter._mc_blocks(r, pos, m, n, 0, 8))
    j_mc2 = jax.jit(lambda r3, m, i: jax_inter._mc_blocks2(
        r3, pos, m, i, n, 0, 8))
    j_q1 = jax.jit(lambda b, r, m: jax_inter._qpel_refine9(
        b, r, pos, m, ri, n, 8, golden=False))
    j_q2 = jax.jit(lambda b, r3, m, i: jax_inter._qpel_refine9(
        b, r3, pos, m, i, n, 8, golden=True))

    cases = [
        ("search_v3 (LAST full-pel)", lambda: jax.device_get(
            j_search(src, ref)[0])),
        ("refine_around_seeds +-8 (golden)", lambda: jax.device_get(
            j_refine(blocks, gld, pos, seeds)[0][0])),
        ("golden zero-SSD block sums", lambda: jax.device_get(
            j_zero(src, gld)[0])),
        ("fp_ssd (gather + SSD)", lambda: jax.device_get(
            j_fpssd(ref, seeds, blocks)[0])),
        ("_mc_blocks (1 ref)", lambda: jax.device_get(
            j_mc1(ref, mv8)[0][0, 0])),
        ("_mc_blocks2 (stacked 2 refs)", lambda: jax.device_get(
            j_mc2(refs3, mv8, ri)[0][0, 0])),
        ("_qpel_refine9 (1 ref)", lambda: jax.device_get(
            j_q1(blocks, ref, mv8)[0][0])),
        ("_qpel_refine9 (2 refs)", lambda: jax.device_get(
            j_q2(blocks, refs3, mv8, ri)[0][0])),
    ]
    for name, run in cases:
        t0 = time.perf_counter()
        run()
        comp = time.perf_counter() - t0
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            run()
            times.append((time.perf_counter() - t0) * 1e3 - rtt)
        print(f"  {name:34s} {min(times):8.1f} ms  "
              f"(med {sorted(times)[len(times) // 2]:.1f}, "
              f"compile {comp:.0f}s)")


if __name__ == "__main__":
    main()
