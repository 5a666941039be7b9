"""Lossless source-upload packing: mod-256 delta + 4-bit nibbles.

The tunnel (and any DCN-attached host) makes the per-chunk source
upload the e2e long pole: a 1080p 8-frame chunk is ~25 MB raw and the
observed link runs 10-50 MB/s, so H2D alone costs 0.5-2.5 s/chunk while
device compute is ~0.7 s.  This module halves the uploaded bytes
losslessly:

  * per plane class, per chunk, the host picks the better of two
    predictors — TEMPORAL (previous source frame; the previous chunk's
    last frame crosses chunks as a device-resident carry, never
    re-uploaded) or SPATIAL-H (left neighbor, column 0 temporal) —
    and stores the mod-256 prediction residual;
  * residuals in [-8, 7] (mod 256) pack two to a byte; the rare
    outliers ride a fixed-cap side list of (flat position, true byte)
    scattered over the nibble expansion on device;
  * the device inverts exactly (cumsum mod 256 along frame or row
    axis), inside the same jitted chunk program that consumes the
    planes — no extra dispatch, no extra D2H.

Everything is bit-lossless (mod-256 arithmetic is exact in int32), so
the emitted bitstream is byte-identical to the raw-upload path — tested
in tests/test_io_pack.py.  When a chunk's outliers exceed the cap (deep
noise), the engine falls back to the raw upload program for that chunk.

Replaces the H2D half of the reference's zero-copy VAAPI frame upload
(internal/ffmpeg/transcode.go:84-97 — hwupload into the encoder's
surface pool): the tpu-native equivalent concern is tunnel/PCIe bytes,
not surface mapping.
"""

from __future__ import annotations

import numpy as np

# outlier budget per frame (measured: synthetic 1080p luma needs ~2.7k,
# chroma ~0; real grain can exceed this — then the chunk goes raw)
CAP_PER_FRAME = 8192

MODE_TEMPORAL = 0
MODE_SPATIAL_H = 1


def _fit4(d: np.ndarray, mod: int = 256) -> np.ndarray:
    """Residual representable in one nibble: d in [0,7] u [mod-8,mod)
    (mod-2^bd encoding of [-8, 7])."""
    return (d < 8) | (d >= mod - 8)


def pack_chunk(planes: list, base: tuple, cap: int | None = None,
               bit_depth: int = 8):
    """Pack k frames of padded uint8/uint16 (y, u, v) planes against
    ``base`` (the previous source frame's padded planes).

    Returns (nib, exc_pos, exc_val, modes) or None when the outliers
    exceed ``cap`` (caller falls back to the raw upload).  Layout of
    the flat residual buffer matches _unpack_planes_chunk: all Y
    frames, then all U, then all V.  bit_depth > 8 packs mod-2^bd
    residuals with uint16 exception values (same nibble window).
    """
    k = len(planes)
    mod = 1 << bit_depth
    if cap is None:
        cap = CAP_PER_FRAME * k
    parts = []
    modes = np.empty(3, np.int32)
    mask = mod - 1
    for pi in range(3):
        cur = np.stack([p[pi] for p in planes])            # (k, H, W)
        prev = np.concatenate([base[pi][None], cur[:-1]])
        dt = (cur.astype(np.int32) - prev.astype(np.int32)) & mask
        # pick the predictor on a 1-in-8 row sample (full compare costs
        # a second 3 MB/frame pass for a decision that's stable per
        # content class)
        s = cur[:, ::8, :].astype(np.int32)
        et = int((~_fit4((s - prev[:, ::8, :].astype(np.int32))
                         & mask, mod)).sum())
        sh = np.empty_like(s)
        sh[:, :, 0] = (s[:, :, 0]
                       - prev[:, ::8, 0].astype(np.int32)) & mask
        sh[:, :, 1:] = (s[:, :, 1:] - s[:, :, :-1]) & mask
        es = int((~_fit4(sh, mod)).sum())
        if es < et:
            d = dt  # reuse storage shape; fill spatial in-place below
            d[:, :, 1:] = (cur[:, :, 1:].astype(np.int32)
                           - cur[:, :, :-1].astype(np.int32)) & mask
            modes[pi] = MODE_SPATIAL_H
        else:
            d = dt
            modes[pi] = MODE_TEMPORAL
        parts.append(d.reshape(-1))
    flat = np.concatenate(parts).astype(np.int32)
    fit = _fit4(flat, mod)
    pos = np.nonzero(~fit)[0]
    if pos.size > cap:
        return None
    nibs = np.where(fit, flat, 0).astype(np.uint8) & 15
    nib = (nibs[0::2] | (nibs[1::2] << 4)).astype(np.uint8)
    exc_pos = np.full(cap, flat.size, np.int32)   # OOB pad -> 'drop'
    exc_pos[:pos.size] = pos
    exc_dt = np.uint8 if bit_depth == 8 else np.uint16
    exc_val = np.zeros(cap, exc_dt)
    exc_val[:pos.size] = flat[pos].astype(exc_dt)
    return nib, exc_pos, exc_val, modes


def unpack_chunk(nib, exc_pos, exc_val, modes, base_y, base_u, base_v,
                 k: int, ph: int, pw: int, bit_depth: int = 8):
    """Device-side exact inverse of pack_chunk (traced; lives inside
    the jitted chunk program).  Returns (ys, us, vs) uint8/uint16
    stacks identical to the raw _unpack_planes_chunk output."""
    import jax.numpy as jnp

    mask = (1 << bit_depth) - 1
    out_dt = jnp.uint8 if bit_depth == 8 else jnp.uint16
    hc, wc = ph // 2, pw // 2
    ny = k * ph * pw
    nc = k * hc * wc
    n = ny + 2 * nc
    lo = (nib & 15).astype(jnp.int32)
    hi = (nib >> 4).astype(jnp.int32)
    d = jnp.stack([lo, hi], axis=-1).reshape(-1)[:n]
    d = jnp.where(d < 8, d, d + (mask - 15))   # nibble -> mod-2^bd
    d = d.at[exc_pos].set(exc_val.astype(jnp.int32), mode="drop")

    def plane(dk, base, mode):
        base32 = base.astype(jnp.int32)
        rt = (base32[None] + jnp.cumsum(dk, axis=0)) & mask
        # spatial-h: column 0 is temporal by construction
        col0 = (base32[:, 0][None] +
                jnp.cumsum(dk[:, :, 0], axis=0)) & mask
        ds = dk.at[:, :, 0].set(col0)
        rs = jnp.cumsum(ds, axis=2) & mask
        return jnp.where(mode == MODE_SPATIAL_H, rs, rt).astype(out_dt)

    ys = plane(d[:ny].reshape(k, ph, pw), base_y, modes[0])
    us = plane(d[ny:ny + nc].reshape(k, hc, wc), base_u, modes[1])
    vs = plane(d[ny + nc:].reshape(k, hc, wc), base_v, modes[2])
    return ys, us, vs
