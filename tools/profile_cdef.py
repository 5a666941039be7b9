"""Device-only breakdown of the CDEF search cost (round-5 lead #2).

Times, RTT-subtracted with device-resident inputs (profile_device
protocol):
  * find_dir            — per-8x8 direction/variance search
  * cdef_apply          — tap prep + ONE full-frame filter pass
  * cdef_search_apply   — full production search (N candidates on the
                          unit subsample) + apply
The (search_apply - apply - find_dir) residual is the candidate-sweep
cost the restructure targets.

Usage: python tools/profile_cdef.py [--w 1920 --h 1088 --iters 5]
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
    ap.add_argument("--th", type=int, default=1080)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from av1tpu.specav1 import jax_cdef

    H, W = args.h, args.w
    rng = np.random.default_rng(7)
    y = jnp.asarray(rng.integers(0, 256, (H, W)), jnp.int32)
    u = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2)), jnp.int32)
    v = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2)), jnp.int32)
    sy = jnp.asarray(rng.integers(0, 256, (H, W)), jnp.uint8)
    su = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2)), jnp.uint8)
    sv = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2)), jnp.uint8)
    skip8 = jnp.zeros((H // 8, W // 8), jnp.int32)
    damp = jnp.int32(4)

    nfn = jax.jit(lambda a: (a + 1,))
    jax.device_get(nfn(jnp.zeros((2, 2), jnp.int32))[0][0, 0])
    rtts = []
    for _ in range(7):
        t0 = time.perf_counter()
        jax.device_get(nfn(jnp.zeros((2, 2), jnp.int32))[0][0, 0])
        rtts.append((time.perf_counter() - t0) * 1e3)
    rtt = min(rtts)
    print(f"{W}x{H} th={args.th} on {jax.devices()[0]}, "
          f"rtt {rtt:.1f} ms (subtracted)")

    fh8 = ((args.th + 7) >> 3) << 3
    uh, uw = fh8 // 8, W // 8

    fd = jax.jit(lambda p: jax_cdef.find_dir(
        p[:fh8].reshape(uh, 8, uw, 8).transpose(0, 2, 1, 3).reshape(
            -1, 8, 8), 0))

    cases = [
        ("find_dir", lambda: jax.device_get(fd(y)[0][0])),
        ("cdef_apply (prep + 1 filter)", lambda: jax.device_get(
            jax_cdef.cdef_apply(y, u, v, skip8, jnp.int32(4),
                                jnp.int32(2), jnp.int32(2), jnp.int32(1),
                                damp, th=args.th, tw=W)[0][0, 0])),
        ("cdef_search_apply (production)", lambda: jax.device_get(
            jax_cdef.cdef_search_apply(y, u, v, sy, su, sv, skip8, damp,
                                       th=args.th, tw=W)[3][0])),
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
