"""Motion estimation + compensation kernels (full-pel v1).

TPU-first motion search: **exhaustive** SSD over a window, computed as
correlations via grouped convolution — the cross term Σ src·ref(d) for all
displacements d of all blocks at once is one depthwise conv (MXU work),
and Σ ref(d)² is one shared-kernel conv.  No data-dependent control flow,
no per-block branching, and no cost-surface assumptions (a greedy ladder
like TSS diverges on low-correlation content).  Two stages: a coarse
search on 4×-downsampled planes covering a wide window, then a fine
full-resolution search around the coarse seed.

Search is encoder-only (free to be approximate); motion compensation is a
pure gather and is part of the normative reconstruction path.

Out-of-frame motion: the reference plane is edge-replicated by PAD pixels
(normative), and MC clamps sample positions into the padded extent, so
encoder and decoder gather identically for any coded MV.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PAD = 64          # normative luma reference padding (pixels)
CHROMA_PAD = 32   # normative chroma padding (chroma MVs are half-range)
COARSE_SCALE = 4  # downsample factor of the coarse stage
COARSE_RADIUS = 12   # ±12 coarse = ±48 full-pel
FINE_RADIUS = 8      # ± window around the coarse seed
MAX_MV = PAD - 16    # keep gathers inside the padded extent


def pad_ref(plane: jnp.ndarray) -> jnp.ndarray:
    """Edge-replicate pad by PAD on all sides (normative)."""
    return jnp.pad(plane, ((PAD, PAD), (PAD, PAD)), mode="edge")


def block_positions(hp: int, wp: int, n: int) -> np.ndarray:
    """Top-left (row, col) of each block in raster order, (B, 2)."""
    rows, cols = hp // n, wp // n
    r, c = np.mgrid[0:rows, 0:cols]
    return np.stack([r.reshape(-1) * n, c.reshape(-1) * n], axis=1).astype(
        np.int32)


def _to_blocks(plane: jnp.ndarray, n: int) -> jnp.ndarray:
    hp, wp = plane.shape
    rows, cols = hp // n, wp // n
    return (plane.reshape(rows, n, cols, n).transpose(0, 2, 1, 3)
            .reshape(rows * cols, n, n))


def gather_blocks(ref_pad: jnp.ndarray, pos: jnp.ndarray, mvs: jnp.ndarray,
                  n: int, pad: int = PAD) -> jnp.ndarray:
    """Gather (B, n, n) blocks at pos+mv from the padded reference.

    pos is unpadded block origin; mv in full-pel; ``pad`` is the padding
    the reference was extended by.  Positions clamp into the padded
    extent (normative clamp).
    """
    hp2, wp2 = ref_pad.shape
    r = jnp.clip(pos[:, 0] + pad + mvs[:, 0], 0, hp2 - n)
    c = jnp.clip(pos[:, 1] + pad + mvs[:, 1], 0, wp2 - n)

    from av1tpu.encoder.kernels import pallas_gather
    # int32 keeps downstream SSD arithmetic exactly as before (the
    # float32 kernel output is exact for pixel values)
    return pallas_gather.gather_windows(ref_pad, r, c, n).astype(
        jnp.int32)


def _ssd_surface(blocks: jnp.ndarray, regions: jnp.ndarray) -> jnp.ndarray:
    """SSD of every block against every aligned window of its region.

    blocks (B, n, n); regions (B, n+2r, n+2r) → (B, 2r+1, 2r+1) float32.
    SSD(d) = Σref(d)² − 2·Σsrc·ref(d) + const.
    """
    B, n, _ = blocks.shape
    bf = blocks.astype(jnp.float32)
    rf = regions.astype(jnp.float32)
    # cross-correlation: depthwise conv, each block correlates its region
    cross = jax.lax.conv_general_dilated(
        rf[None],                      # (1, B, R, R)
        bf[:, None],                   # (B, 1, n, n)
        window_strides=(1, 1), padding="VALID",
        feature_group_count=B,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0]      # (B, S, S)
    ones = jnp.ones((1, 1, n, n), jnp.float32)
    ref_energy = jax.lax.conv_general_dilated(
        (rf * rf)[:, None], ones, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0]   # (B, S, S)
    return ref_energy - 2.0 * cross


def _argmin_2d(cost: jnp.ndarray, radius: int) -> jnp.ndarray:
    """(B, S, S) → displacement (B, 2) in [-radius, radius]."""
    B, S, _ = cost.shape
    flat = cost.reshape(B, S * S)
    k = jnp.argmin(flat, axis=1).astype(jnp.int32)
    return jnp.stack([k // S - radius, k % S - radius], axis=1)


def _search_stage(src: jnp.ndarray, ref_pad: jnp.ndarray, n: int,
                  radius: int, seeds: jnp.ndarray) -> jnp.ndarray:
    """Exhaustive ±radius around per-block seeds.  Returns absolute MVs."""
    hp, wp = src.shape
    pos = jnp.asarray(block_positions(hp, wp, n))
    blocks = _to_blocks(src.astype(jnp.int32), n)
    R = n + 2 * radius
    hp2, wp2 = ref_pad.shape
    r0 = jnp.clip(pos[:, 0] + PAD + seeds[:, 0] - radius, 0, hp2 - R)
    c0 = jnp.clip(pos[:, 1] + PAD + seeds[:, 1] - radius, 0, wp2 - R)

    def one(ri, ci):
        return jax.lax.dynamic_slice(ref_pad, (ri, ci), (R, R))

    regions = jax.vmap(one)(r0, c0)
    cost = _ssd_surface(blocks, regions)
    d = _argmin_2d(cost, radius)
    # displacement is relative to the clamped region origin
    base = jnp.stack([r0 - (pos[:, 0] + PAD), c0 - (pos[:, 1] + PAD)],
                     axis=1) + radius
    return jnp.clip(base + d, -MAX_MV, MAX_MV)


def _downsample(plane: jnp.ndarray, s: int) -> jnp.ndarray:
    h, w = plane.shape
    return (plane.astype(jnp.int32).reshape(h // s, s, w // s, s)
            .sum(axis=(1, 3)) // (s * s))


def search(src: jnp.ndarray, ref_pad: jnp.ndarray, n: int) -> jnp.ndarray:
    """Two-stage exhaustive full-pel search.  Returns MVs (B, 2) int32.

    Effective window: ±(COARSE_SCALE*COARSE_RADIUS + FINE_RADIUS) = ±56.
    Requires plane dims divisible by n and by COARSE_SCALE*[n/scale].
    """
    hp, wp = src.shape
    s = COARSE_SCALE
    cn = n // s
    zero = jnp.zeros((hp // n * (wp // n), 2), jnp.int32)
    pos = jnp.asarray(block_positions(hp, wp, n))
    blocks = _to_blocks(src.astype(jnp.int32), n)

    def ssd_of(mv):
        refb = gather_blocks(ref_pad, pos, mv, n)
        return jnp.sum((blocks - refb) ** 2, axis=(1, 2))

    # fine search around the zero seed (robust baseline, window ±FINE)
    mv_local = _search_stage(src, ref_pad, n, FINE_RADIUS, zero)
    best_mv, best_ssd = mv_local, ssd_of(mv_local)

    if cn >= 4:
        # wide-window candidate: coarse on 4x-downsampled planes, refined
        src_c = _downsample(src, s)
        ref_c = _downsample(ref_pad, s)
        coarse = _search_stage_coarse(src_c, ref_c, cn, COARSE_RADIUS)
        mv_wide = _search_stage(src, ref_pad, n, FINE_RADIUS, coarse * s)
        ssd_wide = ssd_of(mv_wide)
        take = ssd_wide < best_ssd
        best_mv = jnp.where(take[:, None], mv_wide, best_mv)
        best_ssd = jnp.minimum(best_ssd, ssd_wide)

    # always consider the zero MV: cheap to code, avoids noisy drift
    ssd_z = ssd_of(zero)
    better = best_ssd + (best_ssd >> 4) < ssd_z
    return jnp.where(better[:, None], best_mv, zero)


def _search_stage_coarse(src_c: jnp.ndarray, ref_c: jnp.ndarray, cn: int,
                         radius: int) -> jnp.ndarray:
    """Coarse stage on downsampled planes; ref_c already includes PAD/s."""
    hp, wp = src_c.shape
    pad_c = PAD // COARSE_SCALE
    pos = jnp.asarray(block_positions(hp, wp, cn))
    blocks = _to_blocks(src_c.astype(jnp.int32), cn)
    R = cn + 2 * radius
    hp2, wp2 = ref_c.shape
    r0 = jnp.clip(pos[:, 0] + pad_c - radius, 0, hp2 - R)
    c0 = jnp.clip(pos[:, 1] + pad_c - radius, 0, wp2 - R)

    def one(ri, ci):
        return jax.lax.dynamic_slice(ref_c, (ri, ci), (R, R))

    regions = jax.vmap(one)(r0, c0)
    cost = _ssd_surface(blocks, regions)
    d = _argmin_2d(cost, radius)
    base = jnp.stack([r0 - (pos[:, 0] + pad_c), c0 - (pos[:, 1] + pad_c)],
                     axis=1) + radius
    return base + d


# kept name for callers/tests
tss_search = search


def chroma_mv(mvs: jnp.ndarray) -> jnp.ndarray:
    """Full-pel chroma MV from luma MV (normative v1: round toward zero
    after halving; subpel chroma lands with the subpel milestone)."""
    return (mvs + jnp.where(mvs < 0, 1, 0)) >> 1


# ---------------------------------------------------------------------------
# v2 search: frame-level shifted-SSD scan (bandwidth-optimal, no gathers)

FINE_RADIUS_V2 = 16     # direct window ±16
COARSE_RADIUS_V2 = 16   # coarse window ±16 at 4x = ±64 full-pel
REFINE_RADIUS_V2 = 3    # per-block refine around the coarse seed


def _block_sum(x: jnp.ndarray, n: int) -> jnp.ndarray:
    h, w = x.shape
    return x.reshape(h // n, n, w // n, n).sum(axis=(1, 3))


def _shift_scan_search(src: jnp.ndarray, ref_pad: jnp.ndarray, n: int,
                       radius: int, pad: int) -> tuple[jnp.ndarray,
                                                       jnp.ndarray]:
    """Exhaustive ±radius via lax.scan over frame shifts.

    One step per displacement: slice the shifted reference window, SSD per
    block-aligned window by reshape-reduction.  Memory-bound: each step
    reads the two planes once; no gathers, no grouped convs.
    Returns (best_mv (rows, cols, 2) int32, best_cost (rows, cols) f32).
    """
    hp, wp = src.shape
    rows, cols = hp // n, wp // n
    srcf = src.astype(jnp.float32)
    reff = ref_pad.astype(jnp.float32)
    S = 2 * radius + 1
    dgrid = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    disps = jnp.asarray(
        dgrid.transpose(1, 2, 0).reshape(-1, 2).astype(np.int32))

    def body(carry, d):
        best_c, best_mv = carry
        win = jax.lax.dynamic_slice(reff, (pad + d[0], pad + d[1]), (hp, wp))
        diff = srcf - win
        c = _block_sum(diff * diff, n)
        better = c < best_c
        best_c = jnp.where(better, c, best_c)
        best_mv = jnp.where(better[..., None],
                            jnp.broadcast_to(d, (rows, cols, 2)), best_mv)
        return (best_c, best_mv), None

    init = (jnp.full((rows, cols), jnp.inf, jnp.float32),
            jnp.zeros((rows, cols, 2), jnp.int32))
    (best_c, best_mv), _ = jax.lax.scan(body, init, disps)
    return best_mv, best_c


def search_v2(src: jnp.ndarray, ref_pad: jnp.ndarray, n: int) -> jnp.ndarray:
    """Bandwidth-optimal exhaustive search.  Returns MVs (B, 2) int32.

    Stage 1: direct ±FINE_RADIUS_V2 shift scan at full resolution.
    Stage 2: ±COARSE_RADIUS_V2 shift scan on 4×-downsampled planes
             (window ±64), refined per block by ±REFINE_RADIUS_V2 gathers.
    Final:   best-of {fine, refined-coarse, zero} with a zero-MV bias.
    """
    hp, wp = src.shape
    rows, cols = hp // n, wp // n
    B = rows * cols
    pos = jnp.asarray(block_positions(hp, wp, n))
    blocks = _to_blocks(src.astype(jnp.int32), n)
    zero = jnp.zeros((B, 2), jnp.int32)

    def ssd_of(mv):
        refb = gather_blocks(ref_pad, pos, mv, n)
        return jnp.sum((blocks - refb) ** 2, axis=(1, 2)).astype(jnp.float32)

    mv_fine, c_fine = _shift_scan_search(src, ref_pad, n, FINE_RADIUS_V2, PAD)
    best_mv = mv_fine.reshape(B, 2)
    best_c = c_fine.reshape(B)

    s = COARSE_SCALE
    if n // s >= 4:
        src_c = _downsample(src, s)
        ref_c = _downsample(ref_pad, s)
        mv_c, _cc = _shift_scan_search(src_c, ref_c, n // s,
                                       COARSE_RADIUS_V2, PAD // s)
        seed = (mv_c.reshape(B, 2) * s)
        # per-block refine: static unroll over the small offset grid
        r = REFINE_RADIUS_V2
        cand_best_mv = jnp.clip(seed, -MAX_MV, MAX_MV)
        cand_best_c = ssd_of(cand_best_mv)
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                if dy == 0 and dx == 0:
                    continue
                mv = jnp.clip(seed + jnp.array([dy, dx], jnp.int32),
                              -MAX_MV, MAX_MV)
                c = ssd_of(mv)
                take = c < cand_best_c
                cand_best_mv = jnp.where(take[:, None], mv, cand_best_mv)
                cand_best_c = jnp.minimum(cand_best_c, c)
        take = cand_best_c < best_c
        best_mv = jnp.where(take[:, None], cand_best_mv, best_mv)
        best_c = jnp.minimum(best_c, cand_best_c)

    # zero-MV bias (rate-aware)
    c_zero = ssd_of(zero)
    better = best_c + best_c / 16.0 < c_zero
    return jnp.where(better[:, None], best_mv, zero)


def search_v3(src: jnp.ndarray, ref_pad: jnp.ndarray, n: int) -> jnp.ndarray:
    """Pallas-accelerated search: coarse shift-scan + in-VMEM refinement.

    Stage 1: ±COARSE_RADIUS_V2 shift scan on 4×-downsampled planes
             (window ±64 full-pel) — cheap, sets per-block seeds.
    Stage 2: one region gather per block per seed family ({zero, coarse}),
             then the Pallas refine kernel evaluates all ±8 displacements
             in VMEM (av1tpu.encoder.kernels.pallas_motion).
    Final:   best-of with an exact zero-SSD (sliced, no gather) and a
             rate-aware zero bias.
    """
    from av1tpu.encoder.kernels import pallas_motion

    hp, wp = src.shape
    rows, cols = hp // n, wp // n
    B = rows * cols
    pos = jnp.asarray(block_positions(hp, wp, n))
    blocks = _to_blocks(src.astype(jnp.int32), n)
    zero = jnp.zeros((B, 2), jnp.int32)
    r = 8

    # zero-seed refinement (local ±8 window)
    mv_a, ssd_a = pallas_motion.refine_around_seeds(
        blocks, ref_pad, pos, zero, n, r, PAD)

    # coarse stage for wide motion; 32-blocks downsample 8x (same ±64
    # window in a quarter of the lax.scan steps — the coarse scan is
    # loop-overhead-bound, not bandwidth-bound)
    cscale = 8 if n // 8 >= 4 else COARSE_SCALE
    cradius = 8 if cscale == 8 else COARSE_RADIUS_V2
    if n // cscale >= 4:
        src_c = _downsample(src, cscale)
        ref_c = _downsample(ref_pad, cscale)
        mv_c, _ = _shift_scan_search(src_c, ref_c, n // cscale,
                                     cradius, PAD // cscale)
        seed = jnp.clip(mv_c.reshape(B, 2) * cscale, -MAX_MV, MAX_MV)
        mv_b, ssd_b = pallas_motion.refine_around_seeds(
            blocks, ref_pad, pos, seed, n, r, PAD)
        take = ssd_b < ssd_a
        mv_a = jnp.where(take[:, None], mv_b, mv_a)
        ssd_a = jnp.minimum(ssd_a, ssd_b)
    mv_best = jnp.clip(mv_a, -MAX_MV, MAX_MV)

    # exact zero SSD without a gather: aligned center slice
    center = jax.lax.dynamic_slice(ref_pad, (PAD, PAD), (hp, wp))
    diff0 = (src.astype(jnp.float32) - center.astype(jnp.float32))
    ssd_zero = _block_sum(diff0 * diff0, n).reshape(B)

    better = ssd_a + ssd_a / 16.0 < ssd_zero
    return jnp.where(better[:, None], mv_best, zero)


def subpel_refine(src_blocks: jnp.ndarray, ref_pad: jnp.ndarray,
                  pos: jnp.ndarray, mv_full: jnp.ndarray, n: int,
                  pad: int = PAD, maxval: int = 255) -> jnp.ndarray:
    """Quarter-pel refinement around the full-pel winner.

    Evaluates the 7x7 quarter-pel grid (±3/4 pel) with the NORMATIVE
    interpolation (static phases per candidate — the full-pel anchor makes
    every candidate's phase the same for all blocks, so this is pure
    dense math on one gathered region).  Returns MVs in q4 units.
    Keeps the full-pel center unless a candidate wins by >1/32 SSD
    (rate-aware bias).
    """
    from av1tpu.encoder.kernels import mc

    taps = mc.LUMA_TAPS
    B = src_blocks.shape[0]
    R = n + taps - 1 + 1          # covers candidate floor in {-1, 0}
    off = taps // 2 - 1
    hp2, wp2 = ref_pad.shape
    r0 = jnp.clip(pos[:, 0] + pad + mv_full[:, 0] - off - 1, 0, hp2 - R)
    c0 = jnp.clip(pos[:, 1] + pad + mv_full[:, 1] - off - 1, 0, wp2 - R)

    def one(ri, ci):
        return jax.lax.dynamic_slice(ref_pad, (ri, ci), (R, R))

    regions = jax.vmap(one)(r0, c0).astype(jnp.int32)
    src_f = src_blocks.astype(jnp.int32)

    center_q = mv_full * (1 << mc.MV_PREC)

    # full 7x7 quarter-pel grid, with the horizontal filter pass shared
    # across the 7 vertical phases of each column offset: 7 horizontal +
    # 49 vertical passes instead of 49+49 (each pass reads the whole
    # region set - this loop is bandwidth-bound, not FLOP-bound)
    best_ssd = None
    center_ssd = None
    best_dq = jnp.zeros((src_blocks.shape[0], 2), jnp.int32)
    ftab = mc.luma_filters()
    for qx in range(-3, 4):
        fx, px = (qx >> 2), qx & 3
        sub_x = regions[:, :, 1 + fx:1 + fx + n + taps - 1]
        fh = jnp.asarray(ftab[px])
        htmp = mc._hfilter(sub_x, fh, n, taps)      # (B, R, n)
        for qy in range(-3, 4):
            fy, py = (qy >> 2), qy & 3
            fv = jnp.asarray(ftab[py])
            vt = htmp[:, 1 + fy:1 + fy + n + taps - 1, :]
            out = mc._vfilter(vt, fv, n, taps)
            out = (out + (1 << (mc.FINAL_SHIFT - 1))) >> mc.FINAL_SHIFT
            pred = jnp.clip(out, 0, maxval)
            ssd = jnp.sum(jnp.abs(src_f - pred), axis=(1, 2))
            if qy == 0 and qx == 0:
                center_ssd = ssd
            if best_ssd is None:
                best_ssd = ssd
            else:
                take = ssd < best_ssd
                best_ssd = jnp.minimum(best_ssd, ssd)
                best_dq = jnp.where(take[:, None],
                                    jnp.array([qy, qx], jnp.int32), best_dq)
    best_q = center_q + best_dq

    # conservative acceptance: interpolated prediction must clearly win.
    # SAD gains on noise-like residuals do not convert into rate savings
    # (phase-shifted references spread energy across coefficients and the
    # prediction chain re-codes detail every frame), so require a 25%
    # improvement before leaving the full-pel anchor — real subpel motion
    # clears this easily, reference-noise smoothing does not.
    keep_center = best_ssd >= center_ssd - center_ssd / 4.0
    return jnp.where(keep_center[:, None], center_q, best_q)
