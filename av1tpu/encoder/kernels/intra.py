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


# ---------------------------------------------------------------------------
# Directional modes (v2 alphabet): D45, D67, D135, D157

D45_PRED = 7      # from the above(+right) diagonal, 45°
D67_PRED = 8      # steeper from above
D135_PRED = 9     # from the corner diagonal (above + left)
D157_PRED = 10    # shallower from the left
N_INTRA_MODES_V2 = 11


@functools.lru_cache(maxsize=None)
def _dir_tables(n: int):
    """Static gather tables for the directional predictors."""
    y, x = np.mgrid[0:n, 0:n]
    t = {}
    # D45: pred = smooth(a[x+y+1]) over the extended above row (len 2n)
    t["d45"] = np.minimum(x + y + 1, 2 * n - 1)
    # D67: pred = a[x + ceil((y+1)/2)]
    t["d67"] = np.minimum(x + ((y + 2) >> 1), 2 * n - 1)
    # D135: d = x - y; d>0 → a[d-1], d<0 → l[-d-1], d==0 → corner
    d = x - y
    t["d135_a"] = np.clip(d - 1, 0, n - 1)
    t["d135_l"] = np.clip(-d - 1, 0, n - 1)
    t["d135_sel"] = np.sign(d)  # -1 left, 0 corner, +1 above
    # D157: pred = l[y + ceil((x+1)/2)] with below-left clamped
    t["d157"] = np.minimum(y + ((x + 2) >> 1), n - 1)
    # keep numpy (not jnp): lru_cache must never hold traced values
    return t


def predict_all_modes_v2(above_ext: jnp.ndarray, left: jnp.ndarray,
                         corner: jnp.ndarray, n: int) -> jnp.ndarray:
    """All 11 modes: above_ext (B, 2N) includes the above-right run
    (callers replicate the last valid sample past the frame edge).
    Returns (B, 11, N, N) int32.
    """
    base = predict_all_modes(above_ext[:, :n], left, corner, n)
    a = above_ext.astype(jnp.int32)       # (B, 2N)
    l = left.astype(jnp.int32)
    c = corner.astype(jnp.int32)
    tbl = _dir_tables(n)

    def take_a(idx):                      # (N,N) table → (B,N,N)
        return jnp.take(a, idx.reshape(-1), axis=1).reshape(
            a.shape[0], n, n)

    def take_l(idx):
        return jnp.take(l, idx.reshape(-1), axis=1).reshape(
            l.shape[0], n, n)

    # smoothed diagonal sample: (p[i-1] + 2 p[i] + p[i+1] + 2) >> 2
    a_sm = jnp.pad(a, ((0, 0), (1, 1)), mode="edge")
    a_smooth = (a_sm[:, :-2] + 2 * a_sm[:, 1:-1] + a_sm[:, 2:] + 2) >> 2
    l_sm = jnp.pad(l, ((0, 0), (1, 1)), mode="edge")
    l_smooth = (l_sm[:, :-2] + 2 * l_sm[:, 1:-1] + l_sm[:, 2:] + 2) >> 2

    def take_asm(idx):
        return jnp.take(a_smooth, idx.reshape(-1), axis=1).reshape(
            a.shape[0], n, n)

    def take_lsm(idx):
        return jnp.take(l_smooth, idx.reshape(-1), axis=1).reshape(
            l.shape[0], n, n)

    d45 = take_asm(tbl["d45"])
    d67 = take_asm(tbl["d67"])
    d135_a = take_asm(tbl["d135_a"])
    d135_l = take_lsm(tbl["d135_l"])
    sel = tbl["d135_sel"][None]
    d135 = jnp.where(sel > 0, d135_a,
                     jnp.where(sel < 0, d135_l, c[:, None, None]))
    d157 = take_lsm(tbl["d157"])

    extra = jnp.stack([d45, d67, d135, d157], axis=1)
    return jnp.concatenate([base, extra], axis=1)


def predict_mode_v2(above_ext: jnp.ndarray, left: jnp.ndarray,
                    corner: jnp.ndarray, mode: jnp.ndarray,
                    n: int) -> jnp.ndarray:
    allp = predict_all_modes_v2(above_ext, left, corner, n)
    return jnp.take_along_axis(
        allp, mode[:, None, None, None].astype(jnp.int32), axis=1)[:, 0]
