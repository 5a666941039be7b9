"""Pallas motion-refinement kernel: all-displacement SSD in VMEM.

The hot search op (SURVEY.md §7 "motion search (SAD/SATD over SB tiles)"):
for every block, evaluate the SSD of all (2r+1)² displacements of its
search region in one kernel.  HBM traffic is optimal — each region and
block is read exactly once into VMEM; the 289-displacement loop runs on
VPU registers/VMEM.  The pure-XLA version of this op either materializes
a (B, 289, 256) tensor (2.4 GB at 1080p) or issues 49+ gather kernels
(~400 ms measured over the axon tunnel); this kernel replaces that.

Layout: block-index-last — blocks (n, n, TB), regions (R, R, TB) — so the
128-lane dimension is the block batch and every VPU lane does one block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_TILE = 128  # blocks per kernel program (lane dimension)


def _refine_kernel(blocks_ref, regions_ref, ssd_ref, idx_ref, *, n: int,
                   radius: int):
    S = 2 * radius + 1
    blocks = blocks_ref[...]          # (n, n, TB) f32

    def body(k, carry):
        best_ssd, best_k = carry
        dy = k // S
        dx = k % S
        window = regions_ref[pl.ds(dy, n), pl.ds(dx, n), :]
        diff = window - blocks
        ssd = jnp.sum(diff * diff, axis=(0, 1))[None, :]   # (1, TB)
        better = ssd < best_ssd
        best_ssd = jnp.where(better, ssd, best_ssd)
        best_k = jnp.where(better, jnp.full_like(best_k, k), best_k)
        return best_ssd, best_k

    tb = blocks.shape[-1]
    init = (jnp.full((1, tb), jnp.inf, jnp.float32),
            jnp.zeros((1, tb), jnp.int32))
    best_ssd, best_k = jax.lax.fori_loop(0, S * S, body, init)
    ssd_ref[...] = best_ssd
    idx_ref[...] = best_k


@functools.partial(jax.jit, static_argnames=("n", "radius", "interpret"))
def refine_ssd(blocks_t: jnp.ndarray, regions_t: jnp.ndarray, n: int,
               radius: int, interpret: bool = False):
    """All-displacement SSD argmin.

    blocks_t: (n, n, B) f32; regions_t: (n+2r, n+2r, B) f32; B a multiple
    of LANE_TILE.  Returns (best_ssd (B,), disp (B, 2) in [-r, r]).
    """
    nB = blocks_t.shape[-1]
    assert nB % LANE_TILE == 0, nB
    R = n + 2 * radius
    S = 2 * radius + 1
    grid = (nB // LANE_TILE,)
    kernel = functools.partial(_refine_kernel, n=n, radius=radius)
    ssd, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, n, LANE_TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, R, LANE_TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, LANE_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, nB), jnp.float32),
            jax.ShapeDtypeStruct((1, nB), jnp.int32),
        ],
        interpret=interpret,
    )(blocks_t, regions_t)
    disp = jnp.stack([idx[0] // S - radius, idx[0] % S - radius], axis=1)
    return ssd[0], disp


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def refine_around_seeds(src_blocks: jnp.ndarray, ref_pad: jnp.ndarray,
                        pos: jnp.ndarray, seeds: jnp.ndarray, n: int,
                        radius: int, pad: int):
    """Gather one region per block around pos+seed, refine in-kernel.

    src_blocks (B, n, n) int; returns (mvs (B,2) int32 absolute, ssd (B,)).
    """
    B = src_blocks.shape[0]
    R = n + 2 * radius
    hp2, wp2 = ref_pad.shape
    r0 = jnp.clip(pos[:, 0] + pad + seeds[:, 0] - radius, 0, hp2 - R)
    c0 = jnp.clip(pos[:, 1] + pad + seeds[:, 1] - radius, 0, wp2 - R)

    from av1tpu.encoder.kernels import pallas_gather
    regions = pallas_gather.gather_windows(ref_pad, r0, c0, R)  # (B,R,R)

    # pad B to a lane-tile multiple
    Bp = -(-B // LANE_TILE) * LANE_TILE
    if Bp != B:
        regions = jnp.pad(regions, ((0, Bp - B), (0, 0), (0, 0)))
        blocks = jnp.pad(src_blocks.astype(jnp.float32),
                         ((0, Bp - B), (0, 0), (0, 0)))
    else:
        blocks = src_blocks.astype(jnp.float32)

    ssd, disp = refine_ssd(blocks.transpose(1, 2, 0),
                           regions.transpose(1, 2, 0), n, radius,
                           interpret=_use_interpret())
    ssd = ssd[:B]
    disp = disp[:B]
    # absolute MV: displacement relative to the clamped region origin
    base = jnp.stack([r0 - (pos[:, 0] + pad), c0 - (pos[:, 1] + pad)],
                     axis=1) + radius
    return base + disp, ssd


def refine_around_seeds2(src_blocks: jnp.ndarray, refs_pad: jnp.ndarray,
                         ri: jnp.ndarray, pos: jnp.ndarray,
                         seeds: jnp.ndarray, n: int, radius: int,
                         pad: int):
    """refine_around_seeds with a per-block reference-plane index.

    refs_pad: (wide, off, Wp) — pallas_gather.make_wide2 handle of the
    padded (LAST, GOLDEN) planes (built once per frame by the caller);
    ri: (B,) int32 plane selector.  One region gather per block from
    its selected plane; same kernel refine.
    """
    B = src_blocks.shape[0]
    R = n + 2 * radius
    wide, off, wp2 = refs_pad
    hp2 = wide.shape[0]
    r0 = jnp.clip(pos[:, 0] + pad + seeds[:, 0] - radius, 0, hp2 - R)
    c0 = jnp.clip(pos[:, 1] + pad + seeds[:, 1] - radius, 0, wp2 - R)

    from av1tpu.encoder.kernels import pallas_gather
    regions = pallas_gather.gather_windows_wide(wide, off, ri, r0, c0, R)

    Bp = -(-B // LANE_TILE) * LANE_TILE
    if Bp != B:
        regions = jnp.pad(regions, ((0, Bp - B), (0, 0), (0, 0)))
        blocks = jnp.pad(src_blocks.astype(jnp.float32),
                         ((0, Bp - B), (0, 0), (0, 0)))
    else:
        blocks = src_blocks.astype(jnp.float32)

    ssd, disp = refine_ssd(blocks.transpose(1, 2, 0),
                           regions.transpose(1, 2, 0), n, radius,
                           interpret=_use_interpret())
    ssd = ssd[:B]
    disp = disp[:B]
    base = jnp.stack([r0 - (pos[:, 0] + pad), c0 - (pos[:, 1] + pad)],
                     axis=1) + radius
    return base + disp, ssd
