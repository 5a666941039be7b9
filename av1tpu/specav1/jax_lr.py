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
    unit by SSE against the source PLUS a per-RU SOLVED candidate:
    separable Wiener normal equations accumulated as dense per-RU
    reductions and solved in closed form (3x3 adjugate) ON DEVICE —
    horizontal taps against the post-CDEF recon, then vertical taps
    against the exact h-filtered intermediate (one Gauss-Seidel step
    of libaom's alternation), quantized to the spec tap ranges.  The
    exact integer apply with the solved per-RU taps then competes
    with the presets by SSE, so the solve can only improve the choice.

Presets are (tap0, tap1, tap2) tied for BOTH directions; the solved
candidate uses independent vertical/horizontal taps (the syntax codes
them independently either way).
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


# tap value ranges per position (spec wiener_info subexp bounds)
TAPS_MIN = (-5, -23, -17)
TAPS_MAX = (10, 8, 46)


def _basis3(xf, axis: int):
    """The three symmetric-tap basis planes along ``axis``:
    b_j(p) = x[p-(3-j)] + x[p+(3-j)] - 2 x[p], edge-replicated — the
    Wiener output is x + (1/128) sum_j c_j b_j, linear in the taps."""
    pad = [(0, 0), (0, 0)]
    pad[axis] = (3, 3)
    p = jnp.pad(xf, pad, mode="edge")
    nh, nw = xf.shape
    out = []
    for j in range(3):
        d = 3 - j
        if axis == 1:
            lo = jax.lax.dynamic_slice(p, (0, 3 - d), (nh, nw))
            hi = jax.lax.dynamic_slice(p, (0, 3 + d), (nh, nw))
        else:
            lo = jax.lax.dynamic_slice(p, (3 - d, 0), (nh, nw))
            hi = jax.lax.dynamic_slice(p, (3 + d, 0), (nh, nw))
        out.append(lo + hi - 2.0 * xf)
    return out


def _stats3(bs, ef, nh, nw, size, urows, ucols):
    """Per-RU normal-equation stats: A (nru, 3, 3), r (nru, 3)."""
    ent = {}
    for j in range(3):
        for k in range(j, 3):
            ent[(j, k)] = _ru_reduce(bs[j] * bs[k], nh, nw, size,
                                     urows, ucols)
    A = jnp.stack([jnp.stack([ent[(min(j, k), max(j, k))]
                              for k in range(3)], -1)
                   for j in range(3)], -2)
    r = jnp.stack([_ru_reduce(ef * bs[j], nh, nw, size, urows, ucols)
                   for j in range(3)], -1)
    return A, r


def _solve_quant(A, r, scale: float):
    """c = -scale * A^{-1} r per RU (3x3 adjugate closed form, trace
    regularization + normalization for f32 range), quantized to the
    spec's integer tap ranges.  Returns (nru, 3) int32."""
    tr = (A[:, 0, 0] + A[:, 1, 1] + A[:, 2, 2]) / 3.0 + 1e-6
    An = A / tr[:, None, None]
    eye = jnp.eye(3, dtype=An.dtype)
    An = An + 1e-4 * eye
    rn = r / tr[:, None]
    a, b, c = An[:, 0, 0], An[:, 0, 1], An[:, 0, 2]
    d, e, f = An[:, 1, 0], An[:, 1, 1], An[:, 1, 2]
    g, h, i = An[:, 2, 0], An[:, 2, 1], An[:, 2, 2]
    det = a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack([
        jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], -1),
        jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], -1),
        jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], -1),
    ], -2)
    cf = -scale * jnp.einsum("nij,nj->ni", adj, rn) / det[:, None]
    q = jnp.round(cf).astype(jnp.int32)
    return jnp.stack([jnp.clip(q[:, j], TAPS_MIN[j], TAPS_MAX[j])
                      for j in range(3)], -1)


@functools.lru_cache(maxsize=None)
def _band_sizes(nh: int, nw: int, size: int, urows: int, ucols: int,
                sub_y: int):
    """Static pixel-row/-col counts per restoration unit (spec
    RESTORATION_UNIT_OFFSET row shift, last-RU extension)."""
    off = NL.RESTORATION_UNIT_OFFSET >> sub_y
    ur = np.minimum((np.arange(nh) + off) // size, urows - 1)
    uc = np.minimum(np.arange(nw) // size, ucols - 1)
    return (tuple(np.bincount(ur, minlength=urows).tolist()),
            tuple(np.bincount(uc, minlength=ucols).tolist()))


def _unit_px(vals2d, nh: int, nw: int, size: int, urows: int,
             ucols: int, sub_y: int):
    """Broadcast an (urows, ucols) int grid to (nh, nw) pixels as
    static-band repeats (pure broadcasts + concat) — NOT a per-pixel
    table take (a leading-axis gather lowers to a scalar gather on
    TPU: measured +700 ms/frame at 4K; and the one-hot-matmul
    alternative blows XLA's scoped vmem at 4K)."""
    r_sizes, c_sizes = _band_sizes(nh, nw, size, urows, ucols, sub_y)
    cols = jnp.concatenate(
        [jnp.repeat(vals2d[..., c:c + 1], cs, axis=-1)
         for c, cs in enumerate(c_sizes)], axis=-1)
    return jnp.concatenate(
        [jnp.repeat(cols[..., r:r + 1, :], rs, axis=-2)
         for r, rs in enumerate(r_sizes)], axis=-2)


def _tap_maps(c3, nh: int, nw: int, size: int, urows: int, ucols: int,
              sub_y: int):
    """(7, nh, nw) int32 per-pixel tap planes from per-RU (nru, 3)
    integer taps (center derived), via the static-band broadcast."""
    center = 128 - 2 * (c3[:, 0] + c3[:, 1] + c3[:, 2])
    vecs = jnp.stack([c3[:, 0], c3[:, 1], c3[:, 2], center,
                      c3[:, 2], c3[:, 1], c3[:, 0]])      # (7, nru)
    vals = vecs.reshape(7, urows, ucols)
    return _unit_px(vals, nh, nw, size, urows, ucols, sub_y)


def _hpass_rumap(plane, tms, nh: int, nw: int, bit_depth: int):
    """Horizontal Wiener pass with PER-RU tap maps (solved), spec
    rounding/clamping — the tap-map form of _hpass."""
    r0b = 5 if bit_depth == 12 else 3
    base = 1 << (bit_depth + FILTER_BITS - 1)
    limit = (1 << (bit_depth + 1 + FILTER_BITS - r0b)) - 1
    p = jnp.concatenate([jnp.repeat(plane[:, :1], 3, 1), plane,
                         jnp.repeat(plane[:, -1:], 3, 1)], axis=1)
    acc = jnp.zeros((nh, nw), jnp.int32)
    for t in range(7):
        acc = acc + tms[t] * jax.lax.dynamic_slice(p, (0, t), (nh, nw))
    v = (acc + base + (1 << (r0b - 1))) >> r0b
    return jnp.clip(v, 0, limit)


def _apply_rumap(rec, pre, tms_h, tms_v, nh: int, nw: int,
                 sub_y: int, bit_depth: int):
    """Exact spec Wiener apply with PER-RU tap pairs.

    The spec filters each output pixel's whole 7x7 window with ITS
    restoration unit's taps, so at RU boundaries neighbor rows must be
    h-filtered with the OUTPUT row's taps — a single shared h plane is
    wrong there (a one-off +-1 bug the preset path never sees: its
    full-frame per-preset filters select per output pixel).  Hence the
    h pass runs INSIDE the vertical loop: each tap's source rows are
    row-shifted raw pixels (stripe plan selects rec vs pre rows — the
    h filter commutes with row selection), h-filtered with the
    destination pixel's RU taps, then accumulated with its v taps."""
    r0b = 5 if bit_depth == 12 else 3
    r1b = 9 if bit_depth == 12 else 11
    base = 1 << (bit_depth + FILTER_BITS - 1)
    limit = (1 << (bit_depth + 1 + FILTER_BITS - r0b)) - 1
    plans = _stripe_shift_plan(nh, sub_y)

    def _rowpad(h):
        return jnp.concatenate([jnp.repeat(h[:1], 4, 0), h,
                                jnp.repeat(h[-1:], 4, 0)], axis=0)

    rec_p = _rowpad(rec[:nh, :nw].astype(jnp.int32))
    pre_p = _rowpad(pre[:nh, :nw].astype(jnp.int32))

    def _shift(hp, t, d):
        return jax.lax.dynamic_slice(hp, (t + d + 1, 0), (nh, nw))

    acc = jnp.zeros((nh, nw), jnp.int32)
    for t in range(7):
        dmasks, pre_m = plans[t]

        def _src_from(hp):
            s = _shift(hp, t, 0)
            for d, m in dmasks.items():
                s = jnp.where(jnp.asarray(m)[:, None],
                              _shift(hp, t, d), s)
            return s

        raw = _src_from(rec_p)
        if pre_m.any():
            raw = jnp.where(jnp.asarray(pre_m)[:, None],
                            _src_from(pre_p), raw)
        rawp = jnp.concatenate([jnp.repeat(raw[:, :1], 3, 1), raw,
                                jnp.repeat(raw[:, -1:], 3, 1)], axis=1)
        h = jnp.zeros((nh, nw), jnp.int32)
        for s in range(7):
            h = h + tms_h[s] * jax.lax.dynamic_slice(
                rawp, (0, s), (nh, nw))
        h = jnp.clip((h + base + (1 << (r0b - 1))) >> r0b, 0, limit)
        acc = acc + tms_v[t] * h
    v = (acc - (base << (FILTER_BITS - r0b)) + (1 << (r1b - 1))) >> r1b
    return jnp.clip(v, 0, (1 << bit_depth) - 1)


@functools.partial(jax.jit,
                   static_argnames=("bit_depth", "th", "tw", "size",
                                    "solve"))
def lr_search_apply(rec_y, pre_y, src_y, bit_depth: int = 8,
                    th: int = 0, tw: int = 0, size: int = 256,
                    solve: bool = True):
    """Per-RU Wiener search on luma by SSE vs source, then apply.

    Candidates per RU: the 8 static presets PLUS a per-RU SOLVED tap
    pair — separable normal equations on device (horizontal taps
    solved against the post-CDEF recon, vertical taps against the
    exact h-filtered intermediate; 3x3 closed-form solves, quantized
    to the spec tap ranges).  Returns (filtered_y (H, W) int32,
    choice (urows*ucols,) int32 with -1 = RU off, 0..P-1 = preset,
    P = solved, and taps6 (urows*ucols, 6) int32 = the solved
    (v0, v1, v2, h0, h1, h2) per RU for the tile syntax).

    An RU turns on only when the best candidate improves SSE by more
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
    x = rec_y[:nh, :nw].astype(jnp.int32)
    s = src_y[:nh, :nw].astype(jnp.int32)
    outs = []
    sses = []
    for taps in PRESETS:
        f = wiener_apply(rec_y, pre_y, taps, nh, nw, 0, bit_depth)
        outs.append(f)
        delta = (f - s) ** 2 - (x - s) ** 2
        sses.append(_ru_reduce(delta, nh, nw, size, urows, ucols))

    # ---- per-RU solved candidate (normal equations on device) -------
    if not solve:
        taps6 = jnp.zeros((nru, 6), jnp.int32)
        sse = jnp.stack(sses)
        best = jnp.argmin(sse, axis=0)
        best_sse = jnp.min(sse, axis=0)
        on = best_sse < -384.0 * (1 << (2 * (bit_depth - 8)))
        choice = jnp.where(on, best, -1).astype(jnp.int32)
        pick = _unit_px(choice.reshape(urows, ucols), nh, nw, size,
                        urows, ucols, 0)
        filt = x
        for k, f in enumerate(outs):
            filt = jnp.where(pick == k, f, filt)
        out = rec_y.astype(jnp.int32)
        out = jax.lax.dynamic_update_slice(out, filt, (0, 0))
        return out, choice, taps6
    xf = x.astype(jnp.float32)
    sf = s.astype(jnp.float32)
    ef = xf - sf
    A_h, r_h = _stats3(_basis3(xf, 1), ef, nh, nw, size, urows, ucols)
    c_h = _solve_quant(A_h, r_h, 128.0)
    tms_h = _tap_maps(c_h, nh, nw, size, urows, ucols, 0)
    hrec = _hpass_rumap(x, tms_h, nh, nw, bit_depth)
    # vertical solve against the exact h-filtered intermediate: with
    # identity v-taps the output is (128 h - base<<(7-r0b)) >> r1b, so
    # the v perturbation per tap is b_j / 2^r1b
    r0b = 5 if bit_depth == 12 else 3
    r1b = 9 if bit_depth == 12 else 11
    base = 1 << (bit_depth + FILTER_BITS - 1)
    hf = hrec.astype(jnp.float32)
    out0 = (128.0 * hf - float(base << (FILTER_BITS - r0b))) \
        / float(1 << r1b)
    A_v, r_v = _stats3(_basis3(hf, 0), out0 - sf, nh, nw, size,
                       urows, ucols)
    c_v = _solve_quant(A_v, r_v, float(1 << r1b))
    tms_v = _tap_maps(c_v, nh, nw, size, urows, ucols, 0)
    f_solved = _apply_rumap(rec_y, pre_y, tms_h, tms_v, nh, nw, 0,
                            bit_depth)
    outs.append(f_solved)
    delta = (f_solved - s) ** 2 - (x - s) ** 2
    sses.append(_ru_reduce(delta, nh, nw, size, urows, ucols))
    taps6 = jnp.concatenate([c_v, c_h], axis=-1)

    sse = jnp.stack(sses)                      # (P + 1, nru)
    best = jnp.argmin(sse, axis=0)             # (nru,)
    best_sse = jnp.min(sse, axis=0)
    # ~56 bits/RU of tap+flag syntax; charge ~6 SSE per bit at q96-ish
    # operating points so marginal RUs stay off (SSE scales 2^(2cs) at
    # high bit depth)
    on = best_sse < -384.0 * (1 << (2 * (bit_depth - 8)))
    choice = jnp.where(on, best, -1).astype(jnp.int32)
    # per-pixel select via the one-hot broadcast (a leading-axis
    # gather lowers to a scalar gather on TPU — same lesson as
    # jax_cdef)
    pick = _unit_px(choice.reshape(urows, ucols), nh, nw, size,
                    urows, ucols, 0)           # (nh, nw), -1 = off
    filt = x
    for k, f in enumerate(outs):
        filt = jnp.where(pick == k, f, filt)
    out = rec_y.astype(jnp.int32)
    out = jax.lax.dynamic_update_slice(out, filt, (0, 0))
    return out, choice, taps6
