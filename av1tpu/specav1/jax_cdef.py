"""Device-side spec CDEF: filter + frame-level strength search (JAX).

Bit-for-bit the same integer arithmetic as specav1.cdef (the numpy
normative reference, itself verified against libaom) — tested in
tests/test_spec_cdef.py — but restructured for the TPU:

  * the 8-way direction search becomes 8 small matmuls (one-hot
    partial-sum matrices over the flattened 8x8 blocks) feeding a
    vectorized cost reduction;
  * the 12 directional taps are built as one-hot SELECTS over the 8
    per-direction shifted planes (a leading-axis take_along_axis
    lowers to a scalar gather on TPU — ~0.5 s/frame at 1080p; the
    select form fuses into one vectorized pass per tap plane);
  * the frame-level (pri, sec) strength search runs on a 1-in-4
    UNIT SUBSAMPLE (every other 8x8 unit in each dimension) — tap
    planes are sliced AFTER the full-frame gather so subsampled units
    keep their true frame neighbors — and the winning strengths are
    applied once, full-frame, through the same tap planes.

The search picks (pri, sec) per plane class per frame (cdef_bits = 0
streams).  Candidates never pair pri == 0 with sec > 0 for a class
(the dir-0 secondary geometry is worth ~nothing and it keeps the
filter's direction semantics trivially spec-safe).

Reference behavior replaced: the av1_vaapi in-loop CDEF
(internal/ffmpeg/transcode.go:119-123); BASELINE config #4 names this
filter explicitly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from av1tpu.specav1 import cdef as NC   # numpy reference (tables)

LARGE = NC.CDEF_VERY_LARGE

# (pri, sec) candidates per plane class; (0, 0) first so ties keep the
# filter off.  Sec 4 codes as 3 (the 3 -> 4 remap).  Round-5 prune:
# (2,0)/(3,1)/(4,0) measured redundant with their (pri,sec) neighbors
# on the strength sweep (the frame-level argmin lands on the kept
# ladder within 0.02 dB) — 12 -> 9 filter bodies in the search.
Y_CANDIDATES = ((0, 0), (1, 0), (1, 1), (2, 1), (2, 2),
                (4, 2), (6, 2), (8, 2), (12, 4))
UV_CANDIDATES = ((0, 0), (1, 0), (1, 1), (2, 1), (2, 2), (4, 2),
                 (8, 2))


def _onehots():
    """Per-direction (nbins, 64) partial-sum matrices (spec 7.15.2)."""
    i = np.arange(8)[:, None] + np.zeros((1, 8), np.int64)
    j = np.arange(8)[None, :] + np.zeros((8, 1), np.int64)
    bins = [i + j, i + j // 2, i + 0 * j, 3 + i - j // 2, 7 + i - j,
            3 - i // 2 + j, j + 0 * i, i // 2 + j]
    outs = []
    for d in range(8):
        nb = int(bins[d].max()) + 1
        outs.append((bins[d].reshape(64)[None, :] ==
                     np.arange(nb)[:, None]).astype(np.int32))
    return outs


_ONEHOTS = _onehots()


def find_dir(blocks, coeff_shift: int):
    """blocks: (B, 8, 8) int32.  Returns (dir (B,), var (B,)) int32."""
    B = blocks.shape[0]
    x = (blocks.astype(jnp.int32) >> coeff_shift) - 128
    xf = x.reshape(B, 64)
    div = jnp.asarray(NC.DIV_TABLE, jnp.int32)
    costs = []
    for d in range(8):
        p = xf @ jnp.asarray(_ONEHOTS[d]).T          # (B, nb)
        p2 = p * p
        if d in (2, 6):
            c = 105 * p2.sum(axis=1)
        elif d in (0, 4):
            w = jnp.concatenate([div[1:8], div[8:9], div[1:8][::-1]])
            c = (p2 * w[None, :]).sum(axis=1)
        else:
            w = jnp.asarray([NC.DIV_TABLE[2], NC.DIV_TABLE[4],
                             NC.DIV_TABLE[6], 105, 105, 105, 105, 105,
                             NC.DIV_TABLE[6], NC.DIV_TABLE[4],
                             NC.DIV_TABLE[2]], jnp.int32)
            c = (p2 * w[None, :]).sum(axis=1)
        costs.append(c)
    cost = jnp.stack(costs)                          # (8, B)
    best = jnp.argmax(cost, axis=0).astype(jnp.int32)
    bi = jnp.arange(B)
    var = (cost[best, bi] - cost[(best + 4) & 7, bi]) >> 10
    return best, var


def _floor_log2_map(v, kmax: int):
    """Vectorized max(0, FloorLog2(v)) for v >= 0, v < 2**(kmax+1)."""
    acc = jnp.zeros_like(v)
    for k in range(1, kmax + 1):
        acc = acc + (v >= (1 << k)).astype(v.dtype)
    return acc


def _select_tap(padded, dmap, offs, nh: int, nw: int):
    """One tap plane: per-pixel value at the direction-dependent offset.
    offs: per-direction (dy, dx).  One-hot select over the 8 shifted
    views (fuses into a single vectorized pass)."""
    out = None
    for d in range(8):
        dy, dx = int(offs[d][0]), int(offs[d][1])
        sh = jax.lax.dynamic_slice(padded, (2 + dy, 2 + dx), (nh, nw))
        out = sh if out is None else jnp.where(dmap == d, sh, out)
    return out


def _prep_taps(plane, dmap8, nh: int, nw: int):
    """x plus the 4 primary and 8 secondary tap planes for the per-pixel
    direction map.  Tap planes are int16 (pixels <= 12-bit, sentinel
    30000 fits) — the search sweep is HBM-bandwidth-bound and the
    narrower planes halve its traffic; arithmetic widens to int32 at
    use via jnp promotion."""
    x = plane[:nh, :nw].astype(jnp.int32)
    padded = jnp.full((nh + 4, nw + 4), LARGE, jnp.int16)
    padded = jax.lax.dynamic_update_slice(padded, x.astype(jnp.int16),
                                          (2, 2))
    dirs = NC.DIRECTIONS  # (8, 2, 2) [dir][k][dy, dx]
    pri, sec = [], []
    for k in range(2):
        offs_p = [(int(dirs[d, k, 0]), int(dirs[d, k, 1]))
                  for d in range(8)]
        offs_n = [(-a, -b) for a, b in offs_p]
        pri.append([_select_tap(padded, dmap8, offs_p, nh, nw),
                    _select_tap(padded, dmap8, offs_n, nh, nw)])
        s2 = [(int(dirs[(d + 2) & 7, k, 0]), int(dirs[(d + 2) & 7, k, 1]))
              for d in range(8)]
        s6 = [(int(dirs[(d + 6) & 7, k, 0]), int(dirs[(d + 6) & 7, k, 1]))
              for d in range(8)]
        sec.append([_select_tap(padded, dmap8, s2, nh, nw),
                    _select_tap(padded, dmap8, [(-a, -b) for a, b in s2],
                                nh, nw),
                    _select_tap(padded, dmap8, s6, nh, nw),
                    _select_tap(padded, dmap8, [(-a, -b) for a, b in s6],
                                nh, nw)])
    return x, pri, sec


def _constrain_map(diff, valid, s_map, damping):
    """constrain() with per-pixel strength map (int32)."""
    ad = jnp.abs(jnp.where(valid, diff, 0))
    fl = _floor_log2_map(s_map, 6)
    shift = jnp.maximum(0, damping - fl)
    v = jnp.minimum(ad, jnp.maximum(0, s_map - (ad >> shift)))
    v = jnp.where(s_map > 0, v, 0)
    return jnp.where(diff < 0, -v, v)


def _filter_from_taps(x, pri_t, sec_t, pri_map, sec_str, damping,
                      cs: int = 0):
    """pri_t/sec_t: per-k primary/secondary tap planes.  pri_map:
    per-pixel adjusted primary strength; sec_str: scalar (traced).
    Returns the filtered plane (pre-skip-mask)."""
    sum_ = jnp.zeros_like(x)
    mx = x
    mn = x
    sec_map = jnp.broadcast_to(jnp.asarray(sec_str, jnp.int32), x.shape)
    parity = pri_map >> cs  # tap pair: 8-bit-domain strength parity
    for k in range(2):
        ptap = jnp.where((parity & 1) != 0,
                         int(NC.PRI_TAPS[1, k]), int(NC.PRI_TAPS[0, k]))
        for p in pri_t[k]:
            valid = p != LARGE
            sum_ = sum_ + ptap * _constrain_map(p - x, valid, pri_map,
                                                damping)
            mx = jnp.where(valid, jnp.maximum(p, mx), mx)
            mn = jnp.minimum(p, mn)
        for p in sec_t[k]:
            valid = p != LARGE
            sum_ = sum_ + int(NC.SEC_TAPS[k]) * _constrain_map(
                p - x, valid, sec_map, damping)
            mx = jnp.where(valid, jnp.maximum(p, mx), mx)
            mn = jnp.minimum(p, mn)
    y = x + ((8 + sum_ - (sum_ < 0).astype(jnp.int32)) >> 4)
    return jnp.clip(y, mn, mx)


def _adjusted_pri(pri_str, var_map, coeff_shift: int, is_luma: bool):
    """Per-pixel adjusted primary strength map; pri_str traced scalar
    already << coeff_shift."""
    if not is_luma:
        return jnp.broadcast_to(jnp.asarray(pri_str, jnp.int32),
                                var_map.shape)
    vv = var_map >> 6
    adj = jnp.minimum(_floor_log2_map(vv, 21), 12)
    out = jnp.where(var_map != 0, (pri_str * (4 + adj) + 8) >> 4, 0)
    return out


def _sub4(plane, blk: int, stride: int = 4):
    """Slice every stride-th unit in both dims (1-in-stride^2 units)
    with whole blk x blk units kept contiguous (true frame neighbors
    were already baked into the tap planes).  1080p at stride 4 still
    samples ~2k units — plenty for one frame-level strength pick
    (libaom's pick_cdef samples comparably at high speed levels)."""
    h, w = plane.shape
    uh, uw = h // blk, w // blk
    s = stride
    v = plane.reshape(uh, blk, uw, blk)[0::s, :, 0::s, :]
    return v.reshape(-(-uh // s) * blk, -(-uw // s) * blk)


def _plane_tap_parity(pmap, cs):
    return pmap >> cs


@functools.partial(jax.jit, static_argnames=("bit_depth", "th", "tw"))
def cdef_search_apply(rec_y, rec_u, rec_v, src_y, src_u, src_v,
                      skip8, damping, bit_depth: int = 8,
                      th: int = 0, tw: int = 0):
    """Search frame strengths by SSE against the source and apply.

    rec_*: post-deblock recon planes; src_*: source planes (any int
    dtype); skip8: (uh, uw) bool/int per-8x8-unit skip; damping:
    traced int32 (8-bit domain).  Returns (y, u, v, strengths (4,)
    int32 [y_pri, y_sec, uv_pri, uv_sec]).

    The SSE search runs on a 1-in-4 unit subsample; the apply is
    full-frame with the winning strengths (libaom's pick_cdef samples
    similarly).
    """
    H, W = rec_y.shape
    th = th or H
    tw = tw or W
    fh8 = ((th + 7) >> 3) << 3
    fw8 = ((tw + 7) >> 3) << 3
    cs = bit_depth - 8
    uh, uw = fh8 // 8, fw8 // 8

    blocks = rec_y[:fh8, :fw8].astype(jnp.int32).reshape(
        uh, 8, uw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    dirs, variances = find_dir(blocks, cs)
    dmap_u = dirs.reshape(uh, uw)
    var_u = variances.reshape(uh, uw)
    skip_u = jnp.asarray(skip8, bool)[:uh, :uw]
    damping = jnp.asarray(damping, jnp.int32)

    def unit_to_px(m, blk):
        return jnp.repeat(jnp.repeat(m, blk, 0), blk, 1)

    def plane_class(planes, srcs, candidates, blk, dam, is_luma):
        # candidate list never pairs pri == 0 with sec > 0, so the
        # dir-0 tap geometry is never needed
        assert all(pri > 0 or sec == 0 for pri, sec in candidates)
        nh = fh8 // (8 // blk)
        nw = fw8 // (8 // blk)
        dmap = unit_to_px(dmap_u, blk)
        vmap_ = unit_to_px(var_u, blk)
        smap = unit_to_px(skip_u, blk)
        preps = []
        for pl, s in zip(planes, srcs):
            x, pri_t, sec_t = _prep_taps(pl, dmap, nh, nw)
            preps.append((x, pri_t, sec_t,
                          s[:nh, :nw].astype(jnp.int32)))
        cand_arr = jnp.asarray(candidates, jnp.int32)

        # --- search on the unit subsample --------------------------------
        def sub(p):
            return _sub4(p, blk)

        sub_preps = []
        for (x, pri_t, sec_t, s32) in preps:
            sub_preps.append((sub(x),
                              [[sub(p) for p in pri_t[k]] for k in range(2)],
                              [[sub(p) for p in sec_t[k]] for k in range(2)],
                              sub(s32)))
        svmap = sub(vmap_)
        ssmap = sub(smap)

        def one_candidate(pri, sec):
            """SSE delta vs unfiltered recon for one (pri, sec) pair —
            vmapped over the candidate list (one filter body in the
            compiled graph).  int32 row sums -> f32 total (absolute SSE
            at 1080p would drown f32 precision)."""
            ps = pri << cs
            ss = sec << cs
            on = (pri > 0) | (sec > 0)
            sse = jnp.float32(0)
            for (x, pri_t, sec_t, s32) in sub_preps:
                pmap = jnp.where(on,
                                 _adjusted_pri(ps, svmap, cs, is_luma), 0)
                f = _filter_from_taps(x, pri_t, sec_t, pmap, ss, dam,
                                      cs)
                f = jnp.where(ssmap | ~on, x, f)
                delta = (f - s32) ** 2 - (x - s32) ** 2
                sse = sse + delta.sum(axis=1).astype(jnp.float32).sum()
            return sse

        sses = jax.vmap(one_candidate)(cand_arr[:, 0], cand_arr[:, 1])
        best = jnp.argmin(sses)
        pri_b = cand_arr[best, 0]
        sec_b = cand_arr[best, 1]

        # --- single full-frame apply with the winning strengths ----------
        outs = []
        ps = pri_b << cs
        ss = sec_b << cs
        on = (pri_b > 0) | (sec_b > 0)
        for (x, pri_t, sec_t, _s32) in preps:
            pmap = jnp.where(on, _adjusted_pri(ps, vmap_, cs, is_luma), 0)
            f = _filter_from_taps(x, pri_t, sec_t, pmap, ss, dam, cs)
            f = jnp.where(smap | ~on, x, f)
            outs.append(f)
        return outs, jnp.stack([pri_b, sec_b])

    (fy,), ystr = plane_class((rec_y,), (src_y,), Y_CANDIDATES, 8,
                              damping + cs, True)
    (fu, fv), uvstr = plane_class((rec_u, rec_v), (src_u, src_v),
                                  UV_CANDIDATES, 4,
                                  damping - 1 + cs, False)

    def merge(orig, filt):
        o = orig.astype(jnp.int32)
        return jax.lax.dynamic_update_slice(
            o, filt.astype(jnp.int32), (0, 0))

    out_y = merge(rec_y, fy)
    out_u = merge(rec_u, fu)
    out_v = merge(rec_v, fv)
    strengths = jnp.concatenate([ystr, uvstr]).astype(jnp.int32)
    return out_y, out_u, out_v, strengths


@functools.partial(jax.jit, static_argnames=("bit_depth", "th", "tw"))
def cdef_apply(rec_y, rec_u, rec_v, skip8, y_pri, y_sec, uv_pri,
               uv_sec, damping, bit_depth: int = 8, th: int = 0,
               tw: int = 0):
    """Apply CDEF with given (traced) strengths — the decode-side dual
    of the search (used for parity tests and replay)."""
    H, W = rec_y.shape
    th = th or H
    tw = tw or W
    fh8 = ((th + 7) >> 3) << 3
    fw8 = ((tw + 7) >> 3) << 3
    cs = bit_depth - 8
    uh, uw = fh8 // 8, fw8 // 8

    blocks = rec_y[:fh8, :fw8].astype(jnp.int32).reshape(
        uh, 8, uw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    dirs, variances = find_dir(blocks, cs)
    dmap_u = dirs.reshape(uh, uw)
    var_u = variances.reshape(uh, uw)
    skip_u = jnp.asarray(skip8, bool)[:uh, :uw]
    damping = jnp.asarray(damping, jnp.int32)

    def unit_to_px(m, blk):
        return jnp.repeat(jnp.repeat(m, blk, 0), blk, 1)

    def one_plane(pl, pri, sec, blk, dam, is_luma):
        nh = fh8 // (8 // blk)
        nw = fw8 // (8 // blk)
        pri = jnp.asarray(pri, jnp.int32) << cs
        sec = jnp.asarray(sec, jnp.int32) << cs
        dmap = unit_to_px(jnp.where(pri > 0, dmap_u, 0), blk)
        vmap = unit_to_px(var_u, blk)
        smap = unit_to_px(skip_u, blk)
        x, pri_t, sec_t = _prep_taps(pl, dmap, nh, nw)
        pmap = jnp.where(pri > 0,
                         _adjusted_pri(pri, vmap, cs, is_luma)
                         if is_luma else pri, 0)
        if not is_luma:
            pmap = jnp.broadcast_to(pmap, x.shape)
        f = _filter_from_taps(x, pri_t, sec_t, pmap, sec, dam, cs)
        f = jnp.where(smap, x, f)
        on = (pri > 0) | (sec > 0)
        f = jnp.where(on, f, x)
        o = pl.astype(jnp.int32)
        return jax.lax.dynamic_update_slice(o, f, (0, 0))

    out_y = one_plane(rec_y, y_pri, y_sec, 8, damping + cs, True)
    out_u = one_plane(rec_u, uv_pri, uv_sec, 4, damping - 1 + cs, False)
    out_v = one_plane(rec_v, uv_pri, uv_sec, 4, damping - 1 + cs, False)
    return out_y, out_u, out_v
