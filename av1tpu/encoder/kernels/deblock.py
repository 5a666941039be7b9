"""In-loop deblocking filter (NORMATIVE).

Applied to the reconstructed frame after residual reconstruction — it
affects the display output and the inter-prediction reference, but not
in-frame intra prediction (which uses unfiltered recon, matching AV1's
loop-filter placement).  The reference delegated deblocking to ffmpeg's
in-loop filters (SURVEY.md §2 #16).

Filter: a conditional 2-pixel smoother at every transform-block edge
(AV1's weak filter shape).  For edge pixels p1 p0 | q0 q1:
  active  = |p1−p0| ≤ thr  ∧  |q1−q0| ≤ thr  ∧  |p0−q0| < blimit
  delta   = clip3( rs(3·(q0−p0) + (p1−q1), 3), −limit, limit )
  p0 += delta, q0 −= delta            (when active)
Strength derives from base_q_idx (no extra syntax):
  level  = clamp(qindex//8 − 4, 0, 16);  level 0 disables (limit 0).
  thr = 1 + level//4,  blimit = 3·level + 4,  limit = level.
All integer ops — bit-exact across encoder/decoder and TPU/CPU.  The
qindex may be a traced scalar (params are computed with jnp ops).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def filter_params(qindex, bit_depth: int = 8):
    """(thr, blimit, limit) from qindex; works traced or concrete.
    Thresholds scale with sample range (×4 at 10-bit)."""
    level = jnp.clip(qindex // 8 - 4, 0, 16)
    s = 1 << (bit_depth - 8)
    return (1 + level // 4) * s, (3 * level + 4) * s, level * s


def _edge_filter(p1, p0, q0, q1, thr, blimit, limit, maxval):
    active = ((jnp.abs(p1 - p0) <= thr) & (jnp.abs(q1 - q0) <= thr)
              & (jnp.abs(p0 - q0) < blimit))
    delta = (3 * (q0 - p0) + (p1 - q1) + 4) >> 3
    delta = jnp.clip(delta, -limit, limit)
    delta = jnp.where(active, delta, 0)
    return (jnp.clip(p0 + delta, 0, maxval), jnp.clip(q0 - delta, 0, maxval))


def deblock_plane(rec: jnp.ndarray, n: int, qindex,
                  bit_depth: int = 8) -> jnp.ndarray:
    """Filter all interior block edges of a recon plane (int32 H×W).

    ``qindex`` may be traced; with level 0 the limit clamps every delta
    to zero, so the filter self-disables without control flow.
    """
    thr, blimit, limit = filter_params(qindex, bit_depth)
    maxval = (1 << bit_depth) - 1
    h, w = rec.shape

    cols = np.arange(n, w, n)
    if len(cols):
        p1 = rec[:, cols - 2]
        p0 = rec[:, cols - 1]
        q0 = rec[:, cols]
        q1 = rec[:, cols + 1]
        new_p0, new_q0 = _edge_filter(p1, p0, q0, q1, thr, blimit, limit,
                                      maxval)
        rec = rec.at[:, cols - 1].set(new_p0)
        rec = rec.at[:, cols].set(new_q0)

    rows = np.arange(n, h, n)
    if len(rows):
        p1 = rec[rows - 2, :]
        p0 = rec[rows - 1, :]
        q0 = rec[rows, :]
        q1 = rec[rows + 1, :]
        new_p0, new_q0 = _edge_filter(p1, p0, q0, q1, thr, blimit, limit,
                                      maxval)
        rec = rec.at[rows - 1, :].set(new_p0)
        rec = rec.at[rows, :].set(new_q0)
    return rec
