"""Intra prediction kernels: batched, integer, normative.

The reconstruction-side predictors (shared bit-exactly by encoder commit
pass and decoder): DC, V, H, SMOOTH/SMOOTH_V/SMOOTH_H, PAETH — all
vectorized over a batch of blocks as pure VPU ops (broadcast/select/
shift), with integer arithmetic only.  The TPU-first design evaluates
*all* modes for *all* blocks densely, then argmins (SURVEY.md §7 hard
part #2: restructure branchy RD as evaluate-all-then-argmin).

Neighbor convention: each block sees ``above`` (N pixels), ``left``
(N pixels) and ``corner`` (1 pixel) from the reconstructed frame, with
out-of-frame neighbors filled with the mid value (128 at 8-bit) by the
caller's padded recon buffer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Mode enum (bitstream order of our syntax)
DC_PRED = 0
V_PRED = 1
H_PRED = 2
SMOOTH_PRED = 3
SMOOTH_V_PRED = 4
SMOOTH_H_PRED = 5
PAETH_PRED = 6
N_INTRA_MODES = 7


@functools.lru_cache(maxsize=None)
def smooth_weights(n: int) -> np.ndarray:
    """Normative quadratic blend weights: w[0]=255 .. w[n-1]=16."""
    i = np.arange(n, dtype=np.float64)
    w = np.round(16 + 239.0 * ((n - 1 - i) / max(1, n - 1)) ** 2)
    return w.astype(np.int32)


def predict_all_modes(above: jnp.ndarray, left: jnp.ndarray,
                      corner: jnp.ndarray, n: int) -> jnp.ndarray:
    """All-mode prediction: (B,N),(B,N),(B,) → (B, M, N, N) int32.

    Depth-agnostic: all modes are linear/select ops on neighbor samples,
    so 8-bit and 10-bit share this code (only the caller's clip differs).
    """
    B = above.shape[0]
    a = above.astype(jnp.int32)           # (B, N)
    l = left.astype(jnp.int32)            # (B, N)
    c = corner.astype(jnp.int32)          # (B,)

    # DC: mean of above+left
    dc = (jnp.sum(a, axis=1) + jnp.sum(l, axis=1) + n) >> (
        int(np.log2(2 * n)))
    dc_pred = jnp.broadcast_to(dc[:, None, None], (B, n, n))

    v_pred = jnp.broadcast_to(a[:, None, :], (B, n, n))
    h_pred = jnp.broadcast_to(l[:, :, None], (B, n, n))

    w = jnp.asarray(smooth_weights(n))    # (N,)
    wy = w[None, :, None]                 # over rows
    wx = w[None, None, :]                 # over cols
    bottom = l[:, n - 1][:, None, None]
    right = a[:, n - 1][:, None, None]
    av = a[:, None, :]                    # (B,1,N)
    lv = l[:, :, None]                    # (B,N,1)
    smooth = (wy * av + (256 - wy) * bottom
              + wx * lv + (256 - wx) * right + 256) >> 9
    smooth_v = (wy * av + (256 - wy) * bottom + 128) >> 8
    smooth_h = (wx * lv + (256 - wx) * right + 128) >> 8

    base = lv + av - c[:, None, None]
    pl = jnp.abs(base - lv)
    pa = jnp.abs(base - av)
    pc = jnp.abs(base - c[:, None, None])
    paeth = jnp.where((pl <= pa) & (pl <= pc), jnp.broadcast_to(lv, base.shape),
                      jnp.where(pa <= pc, jnp.broadcast_to(av, base.shape),
                                jnp.broadcast_to(c[:, None, None], base.shape)))

    return jnp.stack([dc_pred, v_pred, h_pred, smooth, smooth_v, smooth_h,
                      paeth], axis=1)


def predict_mode(above: jnp.ndarray, left: jnp.ndarray, corner: jnp.ndarray,
                 mode: jnp.ndarray, n: int) -> jnp.ndarray:
    """Per-block selected-mode prediction: modes (B,) → (B, N, N)."""
    allp = predict_all_modes(above, left, corner, n)  # (B, M, N, N)
    return jnp.take_along_axis(
        allp, mode[:, None, None, None].astype(jnp.int32), axis=1)[:, 0]
