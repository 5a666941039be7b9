"""Loop restoration (NORMATIVE): frame-level separable smoothing filter.

The AV1-shaped third loop-filter stage (after deblock and CDEF): the
encoder picks a restoration mode per frame by comparing each candidate's
luma SSE against the source, codes the mode in the frame header (lr_mode
f(2)), and the decoder applies the same filter — the structure of AV1's
Wiener restoration with the coefficient search collapsed to a small
normative preset table (per-unit signaling and free coefficients are the
planned extension; docs/BITSTREAM.md known-deltas).

Presets: symmetric separable 7-tap filters (a, b, c, d, c, b, a) with
d = 128 − 2(a+b+c); applied as rs(conv_h → conv_v, 7) per pass with edge
replication.  Mode 0 is identity (off).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# (a, b, c) per mode; d is derived.  Mild → stronger smoothing.
PRESETS = (
    None,              # 0: off
    (-1, 2, 8),        # 1: mild detail-preserving
    (0, 4, 14),        # 2: medium
    (1, 8, 22),        # 3: strong
)
N_MODES = len(PRESETS)


def _taps(mode: int) -> np.ndarray:
    a, b, c = PRESETS[mode]
    d = 128 - 2 * (a + b + c)
    return np.array([a, b, c, d, c, b, a], np.int32)


def apply_restoration(plane: jnp.ndarray, mode: int = 0,
                      maxval: int = 255) -> jnp.ndarray:
    """Apply preset ``mode`` (static int) to an int32 plane."""
    if mode == 0:
        return plane
    taps = _taps(mode)
    h, w = plane.shape
    p = jnp.pad(plane, ((3, 3), (3, 3)), mode="edge")
    acc = None
    for t in range(7):
        term = int(taps[t]) * p[3:3 + h, t:t + w]
        acc = term if acc is None else acc + term
    tmp = (acc + 64) >> 7
    tmp = jnp.pad(tmp, ((3, 3), (0, 0)), mode="edge")
    acc = None
    for t in range(7):
        term = int(taps[t]) * tmp[t:t + h, :]
        acc = term if acc is None else acc + term
    out = (acc + 64) >> 7
    return jnp.clip(out, 0, maxval)


def choose_mode(src_y: jnp.ndarray, rec_y: jnp.ndarray,
                maxval: int = 255, tile_rows: int = 1) -> jnp.ndarray:
    """Encoder-side: SSE argmin over all modes on luma.  Returns a traced
    int32 scalar mode (0..3).

    Evaluated on 4×4-subsampled planes — selection-only metric (the
    signaled mode, not the filter, so not normative), 1/16 the HBM
    traffic.  float32 sums (int32 overflows at 1080p; int64 is
    unavailable on TPU).

    The candidate filters are applied per tile stripe (stripe heights
    are multiples of 16, so the stripe-local [::4] grid equals the
    global one) — this makes the metric decomposable: the sharded
    encoder computes the identical value as a psum of per-device
    partial SSEs, keeping mode decisions bit-identical across layouts.
    """
    src = src_y[::4, ::4].astype(jnp.float32)
    rec_s = rec_y[::4, ::4]
    T = tile_rows
    costs = []
    for m in range(N_MODES):
        if T > 1:
            h4, w4 = rec_s.shape
            st = rec_s.reshape(T, h4 // T, w4)
            out = jax.vmap(lambda s: apply_restoration(s, m, maxval))(
                st).reshape(h4, w4).astype(jnp.float32)
        else:
            out = apply_restoration(rec_s, m, maxval).astype(jnp.float32)
        costs.append(jnp.sum((out - src) ** 2))
    return jnp.argmin(jnp.stack(costs)).astype(jnp.int32)


def apply_restoration_dynamic(plane: jnp.ndarray, mode,
                              maxval: int = 255) -> jnp.ndarray:
    """Apply with a traced mode via lax.switch — only the selected
    preset's branch executes (the old all-presets-then-index version did
    4x the filtering work)."""
    import jax
    return jax.lax.switch(
        mode, [functools.partial(apply_restoration, mode=m, maxval=maxval)
               for m in range(N_MODES)], plane)
