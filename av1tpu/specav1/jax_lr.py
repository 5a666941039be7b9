"""Device-side spec loop restoration: Wiener apply + per-RU search.

Bit-for-bit the same integer arithmetic as specav1.lr (the numpy
normative reference, itself verified against libaom), restructured
for the TPU:

  * stripe-boundary handling becomes per-row GATHERS: the horizontal
    pass commutes with row selection, so we h-filter the post-CDEF and
    pre-CDEF planes once each, then each of the 7 vertical taps is a
    row-gather with a per-row select between the two h-filtered planes
    (in-stripe rows read post-CDEF; rows within +-2 beyond a stripe
    boundary read pre-CDEF; everything clamps like the spec);
  * the tap search evaluates a static PRESET list per restoration
    unit by SSE against the source (libaom solves per-RU normal
    equations; a preset sweep keeps the whole search one fused device
    pass and the syntax is identical — taps are coded per RU either
    way).

Presets are (tap0, tap1, tap2) for BOTH directions; the spec codes
vertical and horizontal taps independently but the search ties them
(cheap, and symmetric blur/sharpen is what the solve usually finds at
this operating point).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from av1tpu.specav1 import lr as NL

FILTER_BITS = 7

# (tap0, tap1, tap2) candidates — mild detail-preserving smoothing to
# strong, plus band/sharpen shapes.  All within the spec tap ranges
# (tap0 [-5,10], tap1 [-23,8], tap2 [-17,46]).
PRESETS = (
    (0, 1, 8),      # very mild
    (0, 2, 14),     # mild
    (1, 4, 20),     # medium
    (2, 7, 27),     # strong
    (3, -7, 15),    # band (the spec mid taps)
    (-1, 2, 20),    # detail-preserving medium
    (0, -4, 12),    # mild sharpen-band
    (-2, -5, 25),   # sharpen
)


def _taps7(c):
    c0, c1, c2 = c
    return (c0, c1, c2, 128 - 2 * (c0 + c1 + c2), c2, c1, c0)


def _hpass(plane, taps, nh: int, nw: int, bit_depth: int):
    """Horizontal Wiener pass with 3-px edge replication, spec
    rounding/clamping.  plane: (nh, nw) int32."""
    r0b = 5 if bit_depth == 12 else 3
    base = 1 << (bit_depth + FILTER_BITS - 1)
    limit = (1 << (bit_depth + 1 + FILTER_BITS - r0b)) - 1
    p = jnp.concatenate([jnp.repeat(plane[:, :1], 3, 1), plane,
                         jnp.repeat(plane[:, -1:], 3, 1)], axis=1)
    acc = jnp.zeros((nh, nw), jnp.int32)
    tp = _taps7(taps)
    for t in range(7):
        acc = acc + int(tp[t]) * jax.lax.dynamic_slice(
            p, (0, t), (nh, nw))
    v = (acc + base + (1 << (r0b - 1))) >> r0b
    return jnp.clip(v, 0, limit)


def _stripe_row_plan(nh: int, sub_y: int):
    """Static per-(row, tap) gather plan: (row_idx (7, nh), use_pre
    (7, nh)) following spec get_source_sample clamping."""
    sh = 64 >> sub_y
    off = NL.RESTORATION_UNIT_OFFSET >> sub_y
    rows = np.arange(nh)
    s = (rows + off) // sh
    s0 = np.maximum(s * sh - off, 0)
    s1 = np.minimum(s * sh - off + sh - 1, nh - 1)
    idx = np.zeros((7, nh), np.int32)
    pre = np.zeros((7, nh), bool)
    for t in range(7):
        # frame-edge clamp happens BEFORE the stripe classification
        # (spec get_source_sample order): rows replicated at the frame
        # top/bottom read the post-CDEF frame pixels, not saved rows
        yy = np.clip(rows + t - 3, 0, nh - 1)
        below = yy < s0
        above = yy > s1
        r = yy.copy()
        r[below] = np.maximum(s0[below] - 2, yy[below])
        r[above] = np.minimum(s1[above] + 2, yy[above])
        r = np.clip(r, 0, nh - 1)
        idx[t] = r
        pre[t] = below | above
    return idx, pre


def _stripe_shift_plan(nh: int, sub_y: int):
    """The gather plan restated as SHIFTS: the stripe clamp only ever
    moves a tap's source row by delta in {-1, 0, +1} relative to the
    frame-edge-clipped plain shift (stripe rows clamp to boundary+-2
    and taps reach +-3), so each tap's source is a row-shifted plane
    plus static-mask row selects — no gather (a leading-axis take
    lowers to a scalar gather on TPU; this was 150 ms/frame at 1080p).

    Returns per tap: (deltas present, delta row-masks (nh,) bool,
    use_pre row-mask)."""
    idx, pre = _stripe_row_plan(nh, sub_y)
    rows = np.arange(nh)
    plans = []
    for t in range(7):
        clipped = np.clip(rows + t - 3, 0, nh - 1)
        delta = idx[t] - clipped
        assert delta.min() >= -1 and delta.max() <= 1, delta
        masks = {int(d): delta == d
                 for d in np.unique(delta) if d != 0}
        plans.append((masks, pre[t]))
    return plans


def wiener_apply(rec, pre, taps, nh: int, nw: int, sub_y: int,
                 bit_depth: int):
    """Full-plane spec Wiener with stripe semantics.  rec: post-CDEF
    plane; pre: post-deblock pre-CDEF plane; taps: (c0, c1, c2) python
    ints (static).  Returns (nh, nw) int32."""
    r0b = 5 if bit_depth == 12 else 3
    r1b = 9 if bit_depth == 12 else 11
    base = 1 << (bit_depth + FILTER_BITS - 1)
    hrec = _hpass(rec[:nh, :nw].astype(jnp.int32), taps, nh, nw,
                  bit_depth)
    hpre = _hpass(pre[:nh, :nw].astype(jnp.int32), taps, nh, nw,
                  bit_depth)
    plans = _stripe_shift_plan(nh, sub_y)
    tp = _taps7(taps)

    # edge-replicated row pads: a slice at offset (t + d + 1) reads
    # h[clip(row + t - 3 + d)] — clamp-to-edge via the repeated rows
    def _rowpad(h):
        return jnp.concatenate([jnp.repeat(h[:1], 4, 0), h,
                                jnp.repeat(h[-1:], 4, 0)], axis=0)

    hrec_p = _rowpad(hrec)
    hpre_p = _rowpad(hpre)

    def _shift(hp, t, d):
        return jax.lax.dynamic_slice(hp, (t + d + 1, 0), (nh, nw))

    acc = jnp.zeros((nh, nw), jnp.int32)
    for t in range(7):
        dmasks, pre_m = plans[t]

        def _src_from(hp):
            s = _shift(hp, t, 0)
            for d, m in dmasks.items():
                s = jnp.where(jnp.asarray(m)[:, None], _shift(hp, t, d),
                              s)
            return s

        src = _src_from(hrec_p)
        if pre_m.any():
            src = jnp.where(jnp.asarray(pre_m)[:, None],
                            _src_from(hpre_p), src)
        acc = acc + int(tp[t]) * src
    v = (acc - (base << (FILTER_BITS - r0b)) + (1 << (r1b - 1))) >> r1b
    return jnp.clip(v, 0, (1 << bit_depth) - 1)


def _ru_ids(nh: int, nw: int, size: int, urows: int, ucols: int,
            sub_y: int):
    """Static per-pixel restoration-unit id grid (row-major)."""
    off = NL.RESTORATION_UNIT_OFFSET >> sub_y
    ur = np.minimum((np.arange(nh) + off) // size, urows - 1)
    uc = np.minimum(np.arange(nw) // size, ucols - 1)
    return (ur[:, None] * ucols + uc[None, :]).astype(np.int32)


def _ru_reduce(delta, nh: int, nw: int, size: int, urows: int,
               ucols: int):
    """Per-restoration-unit sums of a (nh, nw) int32 plane as dense
    reshape reductions (a segment_sum lowers to a 2M-element scatter
    on TPU — 132 ms/frame at 1080p for the 8-preset search; this form
    is <2 ms).  Returns (urows*ucols,) float32, row-major RU order.

    Row unit id is min((r + off) // size, urows - 1) with the spec's
    RESTORATION_UNIT_OFFSET; col id is min(c // size, ucols - 1)."""
    off = NL.RESTORATION_UNIT_OFFSET
    rb = -(-(nh + off) // size)
    d = jnp.pad(delta, ((off, rb * size - nh - off), (0, 0)))
    # int32 row-block sums are exact (|delta| < 2^22 per px * size)
    rows = d.reshape(rb, size, nw).sum(axis=1).astype(jnp.float32)
    if rb > urows:
        rows = jnp.concatenate(
            [rows[:urows - 1],
             rows[urows - 1:].sum(axis=0, keepdims=True)], axis=0)
    cb = -(-nw // size)
    rows = jnp.pad(rows, ((0, 0), (0, cb * size - nw)))
    cols = rows.reshape(urows, cb, size).sum(axis=2)
    if cb > ucols:
        cols = jnp.concatenate(
            [cols[:, :ucols - 1],
             cols[:, ucols - 1:].sum(axis=1, keepdims=True)], axis=1)
    return cols.reshape(-1)


@functools.partial(jax.jit,
                   static_argnames=("bit_depth", "th", "tw", "size"))
def lr_search_apply(rec_y, pre_y, src_y, bit_depth: int = 8,
                    th: int = 0, tw: int = 0, size: int = 256):
    """Per-RU Wiener preset search on luma by SSE vs source, then
    apply.  Returns (filtered_y (H, W) int32, choice (urows*ucols,)
    int32 with -1 = RU off else preset index).

    The RU turns on only when the best preset improves SSE by more
    than ~the tap coding cost (a fixed per-RU bit charge at the
    engine's operating rates)."""
    H, W = rec_y.shape
    th = th or H
    tw = tw or W
    # LR runs on the TRUE frame dims (spec 7.17.1: the stripe ranges
    # and edge clamps are over FrameHeight/Width, not the SB pad — the
    # last stripe's +-2 clamp rows differ otherwise)
    nh = th
    nw = tw
    urows = NL.count_units_in_frame(size, th)
    ucols = NL.count_units_in_frame(size, tw)
    nru = urows * ucols
    ids = jnp.asarray(_ru_ids(nh, nw, size, urows, ucols, 0))
    x = rec_y[:nh, :nw].astype(jnp.int32)
    s = src_y[:nh, :nw].astype(jnp.int32)
    outs = []
    sses = []
    for taps in PRESETS:
        f = wiener_apply(rec_y, pre_y, taps, nh, nw, 0, bit_depth)
        outs.append(f)
        delta = (f - s) ** 2 - (x - s) ** 2
        sses.append(_ru_reduce(delta, nh, nw, size, urows, ucols))
    sse = jnp.stack(sses)                      # (P, nru)
    best = jnp.argmin(sse, axis=0)             # (nru,)
    best_sse = jnp.min(sse, axis=0)
    # ~56 bits/RU of tap+flag syntax; charge ~6 SSE per bit at q96-ish
    # operating points so marginal RUs stay off (SSE scales 2^(2cs) at
    # high bit depth)
    on = best_sse < -384.0 * (1 << (2 * (bit_depth - 8)))
    choice = jnp.where(on, best, -1).astype(jnp.int32)
    # per-pixel preset select as one-hot (a leading-axis gather lowers
    # to a scalar gather on TPU — same lesson as jax_cdef)
    pick = choice[ids]                         # (nh, nw), -1 = off
    filt = x
    for k, f in enumerate(outs):
        filt = jnp.where(pick == k, f, filt)
    out = rec_y.astype(jnp.int32)
    out = jax.lax.dynamic_update_slice(out, filt, (0, 0))
    return out, choice
