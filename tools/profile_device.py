"""Per-stage device timing for the spec inter encoder at 1080p.

Times specav1.jax_inter._encode_frame on the attached TPU with feature
flags enabled one at a time, so the cost of each round-3 feature (16
split RD, CDEF search, LR Wiener search, golden reference) is isolated.
Timing is device-only: inputs live on device, block_until_ready, no D2H
in the timed region.  Run ALONE (tunnel/host contention skews numbers).

Sync is a device_get of one scalar output (block_until_ready does NOT
synchronize over the axon tunnel — measured: a 4096^3 matmul "took"
0.03 ms under it); the tunnel's ~23 ms scalar-D2H RTT is measured as
a noop and subtracted from every row.

Usage: python tools/profile_device.py [--iters N] [--w 1920 --h 1088]
"""
import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--h", type=int, default=1088)
    ap.add_argument("--th", type=int, default=1080)
    ap.add_argument("--qindex", type=int, default=96)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from av1tpu.specav1 import jax_inter

    H, W = args.h, args.w
    rng = np.random.default_rng(7)

    def synth(h, w):
        yy, xx = np.mgrid[0:h, 0:w]
        base = (xx * 3 + yy * 2) % 256
        noise = rng.integers(0, 12, (h, w))
        return ((base + noise) % 256).astype(np.uint8)

    y = jnp.asarray(synth(H, W))
    u = jnp.asarray(synth(H // 2, W // 2))
    v = jnp.asarray(synth(H // 2, W // 2))
    ry = jnp.asarray(np.roll(np.asarray(y), 2, axis=1))
    ru = jnp.asarray(np.roll(np.asarray(u), 1, axis=1))
    rv = jnp.asarray(np.roll(np.asarray(v), 1, axis=1))

    configs = [
        ("base (32 only, no filters)",
         dict(split16=False)),
        ("+split16", dict(split16=True)),
        ("+golden", dict(split16=True, golden=True)),
        ("golden only (no split)", dict(split16=False, golden=True)),
        ("+deblock", dict(split16=False, deblock=True, lf_y=10, lf_uv=10)),
        ("+cdef", dict(split16=True, cdef=True)),
        ("cdef only (no split)", dict(split16=False, cdef=True)),
        ("+lr", dict(split16=True, lr=True)),
        ("FULL (split+golden+cdef+lr)",
         dict(split16=True, golden=True, cdef=True, lr=True)),
        ("FULL minus golden",
         dict(split16=True, cdef=True, lr=True)),
        ("FULL minus cdef",
         dict(split16=True, golden=True, lr=True)),
    ]

    def sync(out):
        # one scalar D2H forces completion of the whole dispatch
        return jax.device_get(out[0][0, 0])

    # measure the scalar-D2H RTT to subtract from every row
    nfn = jax.jit(lambda a: (a + 1,))
    _ = jax.device_get(nfn(jnp.zeros((2, 2), jnp.int32))[0][0, 0])
    rtts = []
    for _ in range(7):
        t0 = time.perf_counter()
        _ = jax.device_get(nfn(jnp.zeros((2, 2), jnp.int32))[0][0, 0])
        rtts.append((time.perf_counter() - t0) * 1e3)
    rtt = min(rtts)

    print(f"frame {W}x{H} (true h {args.th}) q{args.qindex}, "
          f"{args.iters} timed iters on {jax.devices()[0]}, "
          f"rtt {rtt:.1f} ms (subtracted)")
    results = {}
    for name, kw in configs:
        gkw = dict(kw)
        if gkw.pop("golden", False):
            gkw.update(golden=True, gld_y=ry, gld_u=ru, gld_v=rv)
        fn = functools.partial(jax_inter._encode_frame,
                               th=args.th, tw=W, **gkw)
        jfn = jax.jit(lambda a, b, c, d, e, f:
                      fn(a, b, c, d, e, f, args.qindex, 8))
        t0 = time.perf_counter()
        sync(jfn(y, u, v, ry, ru, rv))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            sync(jfn(y, u, v, ry, ru, rv))
            times.append((time.perf_counter() - t0) * 1e3 - rtt)
        ms = min(times)
        results[name] = ms
        print(f"  {name:34s} {ms:8.1f} ms/frame   "
              f"(med {sorted(times)[len(times)//2]:.1f}, compile {compile_s:.0f}s)")

    base = results.get("base (32 only, no filters)")
    if base:
        print("\ndeltas vs base:")
        for name, ms in results.items():
            if name != "base (32 only, no filters)":
                print(f"  {name:34s} +{ms - base:8.1f} ms")


if __name__ == "__main__":
    main()
