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

    def one(ri, ci):
        return jax.lax.dynamic_slice(ref_pad, (ri, ci), (n, n))

    return jax.vmap(one)(r, c)


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
