"""CDEF: constrained directional enhancement filter (NORMATIVE).

AV1-shaped (PAPERS.md: "The AV1 Constrained Directional Enhancement
Filter"): per 8×8 block, estimate the dominant edge direction, then apply
a small directional low-pass whose tap differences are *constrained* —
large differences (real edges/detail) pass through untouched, small ones
(ringing/quantization noise) are smoothed along the edge.

This codec's normative definition (documented deltas from AV1 in
docs/BITSTREAM.md):

* 8 directions with primary tap offsets per direction (two taps each
  side at distances 1 and 2 along the direction), weights (4, 2), and
  secondary taps from the two 45°-adjacent directions at distance 1,
  weight 2; total weight 16 (shift 4).
* ``constrain(d, s, damping) = sign(d)·min(|d|, max(0, s − (|d| >>
  (damping − ⌈log2 s⌉))))`` — AV1's constraint.
* Direction per 8×8 block = argmin over directions of the intra-block
  energy of (x − x shifted one step along the direction); derived from
  the pre-CDEF reconstruction on both encoder and decoder, so no
  signaling is needed.
* Strength from base_q_idx: ``pri = clamp((q − 40) // 16, 0, 12)``,
  damping 5 (4 for chroma); strength 0 disables (identity).

Applied after deblocking, before the frame becomes reference/output.
All integer ops — bit-exact across encoder/decoder and backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# primary tap offsets (dy, dx) at distance 1 and 2 for 8 directions,
# ordered like AV1 (0 = 45°, 2 = horizontal, 4 = 135°, 6 = vertical)
DIRECTIONS = (
    ((-1, 1), (-2, 2)),    # 0: 45° up-right
    ((0, 1), (-1, 2)),     # 1: ~22°
    ((0, 1), (0, 2)),      # 2: horizontal
    ((0, 1), (1, 2)),      # 3: ~-22°
    ((1, 1), (2, 2)),      # 4: 135° (down-right)
    ((1, 0), (2, 1)),      # 5
    ((1, 0), (2, 0)),      # 6: vertical
    ((1, 0), (2, -1)),     # 7
)


def strength_from_qindex(qindex):
    """Primary strength from base_q_idx; traced-friendly."""
    return jnp.clip((qindex - 40) // 16, 0, 12)


def _shift(plane: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Edge-replicated static shift."""
    h, w = plane.shape
    padded = jnp.pad(plane, ((2, 2), (2, 2)), mode="edge")
    return jax.lax.dynamic_slice(padded, (2 + dy, 2 + dx), (h, w))


def _constrain(diff: jnp.ndarray, s, damping: int) -> jnp.ndarray:
    """AV1 constraint: pass large differences, damp small ones."""
    mag = jnp.abs(diff)
    # ceil(log2(s)) for s in [1, 15]; s==0 handled by the outer max
    log2s = jnp.where(s > 0,
                      jnp.ceil(jnp.log2(jnp.maximum(s, 1).astype(
                          jnp.float32))).astype(jnp.int32), 0)
    shift = jnp.maximum(0, damping - log2s)
    limit = jnp.maximum(0, s - (mag >> shift))
    delta = jnp.minimum(mag, limit)
    return jnp.sign(diff) * delta


@functools.lru_cache(maxsize=None)
def _offset_tables():
    """Weight-map formulation: the 24 unique tap offsets used by any
    direction, plus an (8, 24) per-direction weight table.  One
    constrain pass per unique offset replaces the old
    8-filtered-planes-then-select structure (64 constrains + an
    (8,H,W) gather) — ~3x less HBM traffic for identical output."""
    offs: list[tuple[int, int]] = []
    index: dict[tuple[int, int], int] = {}

    def oi(o):
        if o not in index:
            index[o] = len(offs)
            offs.append(o)
        return index[o]

    entries = []
    for d, (p1, p2) in enumerate(DIRECTIONS):
        sec_a = DIRECTIONS[(d + 2) % 8][0]
        sec_b = DIRECTIONS[(d - 2) % 8][0]
        for (dy, dx), wgt in ((p1, 4), (p2, 2)):
            for sgn in (1, -1):
                entries.append((d, oi((sgn * dy, sgn * dx)), wgt))
        for (dy, dx) in (sec_a, sec_b):
            for sgn in (1, -1):
                entries.append((d, oi((sgn * dy, sgn * dx)), 1))
    wt = np.zeros((8, len(offs)), np.int32)
    for d, i, wgt in entries:
        wt[d, i] += wgt
    return tuple(offs), wt


def _block_directions(plane: jnp.ndarray, blk: int = 8) -> jnp.ndarray:
    """Per-8×8-block dominant direction: argmin over directions of the
    summed first-difference energy along BOTH direction steps (distance
    1 and 2).  The two-step cost distinguishes the ±22° directions,
    which share their distance-1 offset with horizontal/vertical.
    Shared offsets are computed once."""
    h, w = plane.shape
    energies: dict[tuple[int, int], jnp.ndarray] = {}

    def energy(dy, dx):
        if (dy, dx) not in energies:
            diff = plane - _shift(plane, dy, dx)
            energies[(dy, dx)] = (diff * diff).reshape(
                h // blk, blk, w // blk, blk).sum(axis=(1, 3))
        return energies[(dy, dx)]

    costs = [energy(*p1) + energy(*p2) for (p1, p2) in DIRECTIONS]
    cost = jnp.stack(costs, axis=0)            # (8, H/8, W/8)
    return jnp.argmin(cost, axis=0)            # (H/8, W/8)


def cdef_plane(rec: jnp.ndarray, qindex, bit_depth: int = 8,
               is_chroma: bool = False) -> jnp.ndarray:
    """Filter one recon plane (int32 H×W, dims multiples of 8)."""
    h, w = rec.shape
    if h % 8 or w % 8:
        return rec  # safety: only whole 8x8 grids (padded planes qualify)
    depth_scale = 1 << (bit_depth - 8)
    s = strength_from_qindex(qindex) * depth_scale
    if is_chroma:
        s = s >> 1
    damping = (4 if is_chroma else 5) + (bit_depth - 8)
    maxval = (1 << bit_depth) - 1

    dirs = _block_directions(rec, 8)           # (H/8, W/8)
    offs, wt = _offset_tables()
    wt_j = jnp.asarray(wt)
    padded = jnp.pad(rec, ((2, 2), (2, 2)), mode="edge")
    acc = jnp.zeros_like(rec)
    for i, (dy, dx) in enumerate(offs):
        tap = jax.lax.dynamic_slice(padded, (2 + dy, 2 + dx), (h, w))
        c = _constrain(tap - rec, s, damping)
        w_blk = jnp.take(wt_j[:, i], dirs)     # (H/8, W/8) weights
        w_px = jnp.repeat(jnp.repeat(w_blk, 8, axis=0), 8, axis=1)
        acc = acc + w_px * c
    return jnp.clip(rec + ((acc + 8) >> 4), 0, maxval)


def cdef_gate(src_y: jnp.ndarray, rec_y: jnp.ndarray,
              cdef_y: jnp.ndarray) -> jnp.ndarray:
    """Frame-level gate (traced bool): keep CDEF only when it moves the
    luma recon toward the source.  On noisy content CDEF smooths real
    texture out of the reference and inflates the next frame's residual;
    this converts the filter into a win-only tool (one header bit)."""
    # 4x4-subsampled f32 sums: selection-only metric (one header bit,
    # not normative), 1/16 the HBM traffic (int32 overflows at 1080p;
    # int64 unavailable on TPU)
    sf = src_y[::4, ::4].astype(jnp.float32)
    e_off = jnp.sum((rec_y[::4, ::4].astype(jnp.float32) - sf) ** 2)
    e_on = jnp.sum((cdef_y[::4, ::4].astype(jnp.float32) - sf) ** 2)
    return e_on < e_off


def select(flag, a, b):
    """where-select whole planes by a traced scalar flag."""
    return jnp.where(flag, a, b)
