"""Spec AV1 in-loop deblocking filter (spec 7.14), vectorized in JAX.

One implementation serves both sides: the device encoders filter their
reconstruction inside the frame jit (the filtered frame is the display
output and the inter reference; in-frame intra prediction uses the
unfiltered recon, matching the spec's placement), and the Python spec
decoder calls the same functions on CPU for conformance decode.

Scope: the streams our encoder emits — one filter level per
plane-direction, no segments, no delta_lf, one tx per coded block
(TX_MODE_LARGEST), so every tx edge is a block edge and edges filter
unconditionally.  The base grid is tx 32x32 luma / 16x16 chroma
(filter length 14 luma / 6 chroma at every interior edge); RD-decided
PARTITION_SPLIT blocks and 16px-strip rows (th % 32 == 16) add
masked 16px-offset luma / 8px-offset chroma edges, which carry the
SAME filter lengths (luma >=16px tx keeps the 14-tap filter, chroma
8px tx keeps the 6-tap) — the split/strip structure changes WHERE
edges fall, not how they filter.  Every formula mirrors the spec's
integer arithmetic exactly; the conformance oracle is libaom decoding
our lf-enabled streams bit-exact (tests/test_spec_loopfilter.py,
test_spec_split.py).

Reference behavior this replaces: the exec'd ffmpeg's av1_vaapi
in-loop filters (internal/ffmpeg/transcode.go:119-123).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def thresholds(level: int, sharpness: int = 0):
    """(limit, blimit, thresh) per spec 7.14.4 (8-bit domain)."""
    shift = (1 if sharpness > 0 else 0) + (1 if sharpness > 4 else 0)
    limit = level >> shift
    if sharpness > 0:
        limit = min(limit, 9 - sharpness)
    limit = max(limit, 1)
    blimit = 2 * (level + 2) + limit
    thresh = level >> 4
    return limit, blimit, thresh


def _rpot(x, n):
    return (x + (1 << (n - 1))) >> n


def _filter_taps(P, Q, limit, blimit, thresh, size: int, bd: int,
                 xp=jnp):
    """Filter one batch of edge pixel-lines.

    P: (..., 7) samples p6..p0 (P[..., 6] = p0 nearest the edge);
    Q: (..., 7) samples q0..q6.  Returns (newP, newQ) with the same
    layout.  size: 4, 6, 8, or 14.  xp: array namespace — jnp on the
    device encode path, numpy for the conformance decoder's general
    tx-grid filter (identical integer formulas either way).
    """
    s = 1 << (bd - 8)
    limit = limit * s
    blimit = blimit * s
    thresh = thresh * s
    p = [P[..., 6 - i] for i in range(7)]   # p[0]=p0 .. p[6]=p6
    q = [Q[..., i] for i in range(7)]

    def ab(a, b):
        return xp.abs(a - b)

    # filter_mask (spec: joint sample-activity test)
    mask = (ab(p[1], p[0]) <= limit) & (ab(q[1], q[0]) <= limit) & \
        (ab(p[0], q[0]) * 2 + ab(p[1], q[1]) // 2 <= blimit)
    if size >= 8:
        mask &= (ab(p[3], p[2]) <= limit) & (ab(p[2], p[1]) <= limit) & \
            (ab(q[2], q[1]) <= limit) & (ab(q[3], q[2]) <= limit)
    elif size == 6:
        mask &= (ab(p[2], p[1]) <= limit) & (ab(q[2], q[1]) <= limit)

    one = s  # flatness threshold 1 << (bd - 8)
    if size >= 6:
        flat = (ab(p[1], p[0]) <= one) & (ab(q[1], q[0]) <= one) & \
            (ab(p[2], p[0]) <= one) & (ab(q[2], q[0]) <= one)
        if size >= 8:
            flat &= (ab(p[3], p[0]) <= one) & (ab(q[3], q[0]) <= one)
    if size == 14:
        flat2 = (ab(p[6], p[0]) <= one) & (ab(q[6], q[0]) <= one) & \
            (ab(p[5], p[0]) <= one) & (ab(q[5], q[0]) <= one) & \
            (ab(p[4], p[0]) <= one) & (ab(q[4], q[0]) <= one)

    # narrow filter (filter4): signed arithmetic around mid
    hev = (ab(p[1], p[0]) > thresh) | (ab(q[1], q[0]) > thresh)
    lo = -(128 * s)
    hi = 128 * s - 1

    def c(x):
        return xp.clip(x, lo, hi)

    ps1, ps0 = p[1] - 128 * s, p[0] - 128 * s
    qs0, qs1 = q[0] - 128 * s, q[1] - 128 * s
    f = xp.where(hev, c(ps1 - qs1), 0)
    f = xp.where(mask, c(f + 3 * (qs0 - ps0)), 0)
    f1 = c(f + 4) >> 3
    f2 = c(f + 3) >> 3
    n_q0 = c(qs0 - f1) + 128 * s
    n_p0 = c(ps0 + f2) + 128 * s
    f3 = (f1 + 1) >> 1
    n_q1 = xp.where(hev, qs1, c(qs1 - f3)) + 128 * s
    n_p1 = xp.where(hev, ps1, c(ps1 + f3)) + 128 * s

    outp = [n_p0, n_p1] + [p[i] for i in range(2, 7)]
    outq = [n_q0, n_q1] + [q[i] for i in range(2, 7)]

    if size == 6:
        w = flat & mask
        op1 = _rpot(p[2] * 3 + p[1] * 2 + p[0] * 2 + q[0], 3)
        op0 = _rpot(p[2] + p[1] * 2 + p[0] * 2 + q[0] * 2 + q[1], 3)
        oq0 = _rpot(p[1] + p[0] * 2 + q[0] * 2 + q[1] * 2 + q[2], 3)
        oq1 = _rpot(p[0] + q[0] * 2 + q[1] * 2 + q[2] * 3, 3)
        outp[0] = xp.where(w, op0, outp[0])
        outp[1] = xp.where(w, op1, outp[1])
        outq[0] = xp.where(w, oq0, outq[0])
        outq[1] = xp.where(w, oq1, outq[1])
    elif size >= 8:
        w = flat & mask
        op2 = _rpot(p[3] * 3 + p[2] * 2 + p[1] + p[0] + q[0], 3)
        op1 = _rpot(p[3] * 2 + p[2] + p[1] * 2 + p[0] + q[0] + q[1], 3)
        op0 = _rpot(p[3] + p[2] + p[1] + p[0] * 2 + q[0] + q[1] + q[2], 3)
        oq0 = _rpot(p[2] + p[1] + p[0] + q[0] * 2 + q[1] + q[2] + q[3], 3)
        oq1 = _rpot(p[1] + p[0] + q[0] + q[1] * 2 + q[2] + q[3] * 2, 3)
        oq2 = _rpot(p[0] + q[0] + q[1] + q[2] * 2 + q[3] * 3, 3)
        outp[0] = xp.where(w, op0, outp[0])
        outp[1] = xp.where(w, op1, outp[1])
        outp[2] = xp.where(w, op2, outp[2])
        outq[0] = xp.where(w, oq0, outq[0])
        outq[1] = xp.where(w, oq1, outq[1])
        outq[2] = xp.where(w, oq2, outq[2])
    if size == 14:
        w2 = flat2 & flat & mask
        t = [p[6], p[5], p[4], p[3], p[2], p[1], p[0],
             q[0], q[1], q[2], q[3], q[4], q[5], q[6]]
        # 13-tap smoothing: output d steps from the edge mixes a
        # 14-wide window with edge replication of p6/q6 (spec filter14)
        o = {}
        o["p5"] = _rpot(p[6] * 7 + p[5] * 2 + p[4] * 2 + p[3] + p[2] +
                        p[1] + p[0] + q[0], 4)
        o["p4"] = _rpot(p[6] * 5 + p[5] * 2 + p[4] * 2 + p[3] * 2 +
                        p[2] + p[1] + p[0] + q[0] + q[1], 4)
        o["p3"] = _rpot(p[6] * 4 + p[5] + p[4] * 2 + p[3] * 2 +
                        p[2] * 2 + p[1] + p[0] + q[0] + q[1] + q[2], 4)
        o["p2"] = _rpot(p[6] * 3 + p[5] + p[4] + p[3] * 2 + p[2] * 2 +
                        p[1] * 2 + p[0] + q[0] + q[1] + q[2] + q[3], 4)
        o["p1"] = _rpot(p[6] * 2 + p[5] + p[4] + p[3] + p[2] * 2 +
                        p[1] * 2 + p[0] * 2 + q[0] + q[1] + q[2] +
                        q[3] + q[4], 4)
        o["p0"] = _rpot(p[6] + p[5] + p[4] + p[3] + p[2] + p[1] * 2 +
                        p[0] * 2 + q[0] * 2 + q[1] + q[2] + q[3] +
                        q[4] + q[5], 4)
        o["q0"] = _rpot(p[5] + p[4] + p[3] + p[2] + p[1] + p[0] * 2 +
                        q[0] * 2 + q[1] * 2 + q[2] + q[3] + q[4] +
                        q[5] + q[6], 4)
        o["q1"] = _rpot(p[4] + p[3] + p[2] + p[1] + p[0] + q[0] * 2 +
                        q[1] * 2 + q[2] * 2 + q[3] + q[4] + q[5] +
                        q[6] * 2, 4)
        o["q2"] = _rpot(p[3] + p[2] + p[1] + p[0] + q[0] + q[1] * 2 +
                        q[2] * 2 + q[3] * 2 + q[4] + q[5] + q[6] * 3, 4)
        o["q3"] = _rpot(p[2] + p[1] + p[0] + q[0] + q[1] + q[2] * 2 +
                        q[3] * 2 + q[4] * 2 + q[5] + q[6] * 4, 4)
        o["q4"] = _rpot(p[1] + p[0] + q[0] + q[1] + q[2] + q[3] * 2 +
                        q[4] * 2 + q[5] * 2 + q[6] * 5, 4)
        o["q5"] = _rpot(p[0] + q[0] + q[1] + q[2] + q[3] + q[4] * 2 +
                        q[5] * 2 + q[6] * 7, 4)
        for i, key in enumerate(["p0", "p1", "p2", "p3", "p4", "p5"]):
            outp[i] = xp.where(w2, o[key], outp[i])
        for i, key in enumerate(["q0", "q1", "q2", "q3", "q4", "q5"]):
            outq[i] = xp.where(w2, o[key], outq[i])

    newP = xp.stack([outp[6 - i] for i in range(7)], axis=-1)
    newQ = xp.stack(outq[:7], axis=-1)
    return newP, newQ


@functools.partial(jax.jit,
                   static_argnames=("step", "size", "bd", "nw", "nh"))
def _filter_plane(plane, level, step: int, size: int, bd: int,
                  nw: int, nh: int):
    """Deblock every interior vertical then horizontal edge of a plane
    whose tx grid is uniform step x step.  nw/nh: coded plane dims
    (edges beyond are not filtered).  level may be traced; level 0
    disables via the `on` gate (the caller skips the whole pass when
    deblocking is statically off).

    Edges land on static block-column boundaries, so the 7-tap windows
    are pure slices of an (H, nblocks, step) view — no scatter/gather,
    which XLA lowers terribly on TPU."""
    limit = jnp.maximum(level, 1)
    blimit = 2 * (level + 2) + limit
    thresh = level >> 4
    on = level > 0

    def vpass(x, ne):
        h, w = x.shape
        nb = w // step
        b = x[:, :nb * step].reshape(h, nb, step)
        P = b[:, :ne, step - 7:]              # (H, ne, 7) p6..p0
        Q = b[:, 1:ne + 1, :7]                # (H, ne, 7) q0..q6
        nP, nQ = _filter_taps(P, Q, limit, blimit, thresh, size, bd)
        nP = jnp.where(on, nP, P)
        nQ = jnp.where(on, nQ, Q)
        b = b.at[:, :ne, step - 7:].set(nP)
        b = b.at[:, 1:ne + 1, :7].set(nQ)
        out = b.reshape(h, nb * step)
        if nb * step != w:
            out = jnp.concatenate([out, x[:, nb * step:]], axis=1)
        return out

    n_edges_v = len(range(step, nw, step))
    n_edges_h = len(range(step, nh, step))
    x = plane
    if n_edges_v:
        x = vpass(x, n_edges_v)
    if n_edges_h:
        x = vpass(x.T, n_edges_h).T
    return x


def _vpass_masked(x, level, step: int, off: int, size: int, bd: int,
                  mask):
    """Filter vertical edges at x ≡ off (mod step) where
    mask[row, block_col] is set.  Same tap math as _filter_plane; the
    mask carries the split/strip structure (and the coded-dim bound).
    14-tap edges >= 16 px apart (6-tap >= 8 px) have disjoint
    modified/read ranges, so within one direction the masked pass
    composes with the uniform pass in any order — but ALL vertical
    passes must precede ALL horizontal ones (spec 7.14 pass order:
    horizontal filtering reads vertically-filtered samples)."""
    limit = jnp.maximum(level, 1)
    blimit = 2 * (level + 2) + limit
    thresh = level >> 4
    on = level > 0
    h, w = x.shape
    nb = w // step
    b = x[:, :nb * step].reshape(h, nb, step)
    P = b[:, :, off - 7:off]
    Q = b[:, :, off:off + 7]
    nP, nQ = _filter_taps(P, Q, limit, blimit, thresh, size, bd)
    m = (mask[:, :nb] & on)[:, :, None]
    b = b.at[:, :, off - 7:off].set(jnp.where(m, nP, P))
    b = b.at[:, :, off:off + 7].set(jnp.where(m, nQ, Q))
    out = b.reshape(h, nb * step)
    if nb * step != w:
        out = jnp.concatenate([out, x[:, nb * step:]], axis=1)
    return out


@functools.partial(jax.jit,
                   static_argnames=("step", "bd", "size", "nw", "nh",
                                    "strip"))
def _filter_plane_structured(plane, level, split, step: int, size: int,
                             bd: int, nw: int, nh: int, strip: bool):
    """Deblock one plane whose tx grid is the uniform step x step base
    PLUS the masked mid-block edges PARTITION_SPLIT blocks and 16px
    strip rows introduce (vertical at x ≡ step/2 (mod step), horizontal
    at y ≡ step/2 (mod step)).  split: (gh, gw) int grid on the
    step-block grid (luma 32 / chroma 16); strip adds the
    [nh-step/2, nh) rows' vertical edges (the strip's 16x16 blocks tile
    at half the base step).

    Pass order is the spec's: ALL vertical edges (uniform then masked —
    order within a direction is free, disjoint ranges), then ALL
    horizontal ones on the vertically-filtered samples."""
    limit = jnp.maximum(level, 1)
    blimit = 2 * (level + 2) + limit
    thresh = level >> 4
    on = level > 0
    off = step // 2
    h, w = plane.shape
    nbv = w // step
    gh, gw = split.shape
    sb = split.astype(bool)

    def vpass_uniform(x, ne):
        hh, ww = x.shape
        nb = ww // step
        b = x[:, :nb * step].reshape(hh, nb, step)
        P = b[:, :ne, step - 7:]              # (H, ne, 7) p6..p0
        Q = b[:, 1:ne + 1, :7]                # (H, ne, 7) q0..q6
        nP, nQ = _filter_taps(P, Q, limit, blimit, thresh, size, bd)
        b = b.at[:, :ne, step - 7:].set(jnp.where(on, nP, P))
        b = b.at[:, 1:ne + 1, :7].set(jnp.where(on, nQ, Q))
        out = b.reshape(hh, nb * step)
        if nb * step != ww:
            out = jnp.concatenate([out, x[:, nb * step:]], axis=1)
        return out

    # vertical: mask rows by the split block-row, cols by block-col;
    # bound the edge inside the coded width
    mv = jnp.repeat(sb, step, axis=0)[:h, :]
    mv = jnp.pad(mv, ((0, 0), (0, max(0, nbv - gw))))[:, :nbv]
    colj = jnp.arange(nbv) * step + off
    mv = mv & (colj[None, :] + off <= nw)
    if strip:
        y0 = nh - off
        in_strip = (jnp.arange(h) >= y0) & (jnp.arange(h) < nh)
        mv = mv | (in_strip[:, None] & (colj[None, :] + off <= nw))
    # rows at/below the coded height carry no edges
    mv = mv & (jnp.arange(h) < nh)[:, None]
    # horizontal (transposed): mask rows (= plane cols) by block-col,
    # block index runs over block-rows
    nbh = h // step
    mh = jnp.repeat(sb.T, step, axis=0)[:w, :]
    mh = jnp.pad(mh, ((0, 0), (0, max(0, nbh - gh))))[:, :nbh]
    rowi = jnp.arange(nbh) * step + off
    mh = mh & (rowi[None, :] + off <= nh)
    mh = mh & (jnp.arange(w) < nw)[:, None]

    x = plane
    n_edges_v = len(range(step, nw, step))
    n_edges_h = len(range(step, nh, step))
    if n_edges_v:
        x = vpass_uniform(x, n_edges_v)
    x = _vpass_masked(x, level, step, off, size, bd, mv)
    if n_edges_h:
        x = vpass_uniform(x.T, n_edges_h).T
    return _vpass_masked(x.T, level, step, off, size, bd, mh).T


def _general_vpass(w, lvl: int, sharpness: int, txw, n4w, skip, inter,
                   chroma: bool, bd: int):
    """Filter every vertical edge of one plane from per-4x4-unit grids
    (numpy, sequential in place — spec edge spacing >= filter reach, so
    in-place equals simultaneous).  ``w``: int32 plane horizontally
    padded by 8 (index safety for the 7-wide windows; the pad lanes are
    masked off).  txw/n4w: tx and block widths in 4px units on this
    plane's grid; skip/inter: per-unit flags.  chroma selects the
    6/4-tap ladder, luma the 14/8/4."""
    import numpy as np
    mr, mc = txw.shape
    if lvl <= 0:
        return
    limit, blimit, thresh = thresholds(lvl, sharpness)
    for c in range(1, mc):
        txq = txw[:, c]
        txp = txw[:, c - 1]
        tx_edge = np.mod(c, np.maximum(txq, 1)) == 0
        blk_edge = np.mod(c, np.maximum(n4w[:, c], 1)) == 0
        sk_q = skip[:, c] & inter[:, c]
        sk_p = skip[:, c - 1] & inter[:, c - 1]
        on = tx_edge & (blk_edge | ~sk_q | ~sk_p)
        if not on.any():
            continue
        msz = np.minimum(np.maximum(txp, 1), np.maximum(txq, 1))
        if chroma:
            size_of = np.where(msz >= 2, 6, 4)
            ladder = (6, 4)
        else:
            size_of = np.where(msz >= 4, 14, np.where(msz == 2, 8, 4))
            ladder = (14, 8, 4)
        e = 4 * c + 8  # +8: horizontal pad offset
        P = w[:, e - 7:e]
        Q = w[:, e:e + 7]
        for sz in ladder:
            rows = on & (size_of == sz)
            if not rows.any():
                continue
            m = np.repeat(rows, 4)[:, None]
            nP, nQ = _filter_taps(P, Q, limit, blimit, thresh, sz, bd,
                                  xp=np)
            w[:, e - 7:e] = np.where(m, nP, P)
            w[:, e:e + 7] = np.where(m, nQ, Q)
            P = w[:, e - 7:e]
            Q = w[:, e:e + 7]


def deblock_frame_general(planes, levels, sharpness: int,
                          tx_w4, tx_h4, n4_w, n4_h, skips, inter,
                          uv_txw, uv_txh, bd: int):
    """CPU spec deblock (7.14) driven by the decoded per-4x4 grids —
    the conformance decoder's general path for any one-tx-per-block
    stream (uniform 32/16, PARTITION_SPLIT 16s, strip rows) and for
    foreign var-tx streams whose blocks are all >= 8x8 px.

    planes: (y, u, v) numpy int planes (coded padded dims).
    levels: hdr.lf.level — (y_vert, y_horz, u, v).
    tx_*/n4_*: luma-grid tx and block dims in 4px units; skips/inter:
    per-unit flags; uv_tx*: chroma-grid tx dims in chroma 4px units
    (owner-sampled).  Returns new (y, u, v).
    """
    import numpy as np
    mr, mc = tx_w4.shape
    skips = np.asarray(skips).astype(bool)
    inter = np.asarray(inter).astype(bool)
    # chroma grids: bottom-right owner sampling (spec sub-8 chroma
    # ownership); callers must reject sub-8x8 blocks beforehand
    ri = np.minimum(np.arange((mr + 1) // 2) * 2 + 1, mr - 1)
    ci = np.minimum(np.arange((mc + 1) // 2) * 2 + 1, mc - 1)
    uv_n4w = np.maximum(n4_w[np.ix_(ri, ci)] >> 1, 1)
    uv_n4h = np.maximum(n4_h[np.ix_(ri, ci)] >> 1, 1)
    uv_skip = skips[np.ix_(ri, ci)]
    uv_inter = inter[np.ix_(ri, ci)]

    def run(plane, lvl_v, lvl_h, txw, txh, n4w, n4h, sk, it, chroma):
        gr, gc = txw.shape
        h = gr * 4
        w = np.pad(plane[:h].astype(np.int32), ((0, 0), (8, 8)),
                   mode="edge")
        _general_vpass(w, lvl_v, sharpness, txw, n4w, sk, it, chroma, bd)
        out = plane.copy().astype(np.int32)
        out[:h] = w[:, 8:-8]
        # horizontal pass: transpose, swap to the height grids
        wt = np.pad(out.T[:gc * 4, :h].astype(np.int32),
                    ((0, 0), (8, 8)), mode="edge")
        _general_vpass(wt, lvl_h, sharpness, txh.T, n4h.T, sk.T, it.T,
                       chroma, bd)
        out.T[:gc * 4, :h] = wt[:, 8:-8]
        return out

    y = run(planes[0], levels[0], levels[1], tx_w4, tx_h4, n4_w, n4_h,
            skips, inter, False)
    u = run(planes[1], levels[2], levels[2], uv_txw, uv_txh, uv_n4w,
            uv_n4h, uv_skip, uv_inter, True)
    v = run(planes[2], levels[3], levels[3], uv_txw, uv_txh, uv_n4w,
            uv_n4h, uv_skip, uv_inter, True)
    return y, u, v


def deblock_frame(rec_y, rec_u, rec_v, lf_y, lf_u, lf_v, bd: int,
                  th: int, tw: int, split=None, strip: bool = False):
    """Filter a recon frame: the uniform 32/16 grid, plus the masked
    mid-block edges of PARTITION_SPLIT blocks (``split``: (gh, gw)
    grid on the luma-32 grid) and of a 16px bottom strip row
    (``strip``, th % 32 == 16).  th/tw: coded luma dims (mi-grid
    size); chroma at half.  Returns new planes."""
    fh8 = ((th + 7) >> 3) << 3
    fw8 = ((tw + 7) >> 3) << 3
    if split is None and not strip:
        y = _filter_plane(rec_y, lf_y, 32, 14, bd, fw8, fh8)
        u = _filter_plane(rec_u, lf_u, 16, 6, bd, fw8 // 2, fh8 // 2)
        v = _filter_plane(rec_v, lf_v, 16, 6, bd, fw8 // 2, fh8 // 2)
        return y, u, v
    if split is None:
        gh = rec_y.shape[0] // 32
        gw = rec_y.shape[1] // 32
        split = jnp.zeros((gh, gw), jnp.int32)
    y = _filter_plane_structured(rec_y, lf_y, split, 32, 14, bd, fw8,
                                 fh8, strip)
    u = _filter_plane_structured(rec_u, lf_u, split, 16, 6, bd,
                                 fw8 // 2, fh8 // 2, strip)
    v = _filter_plane_structured(rec_v, lf_v, split, 16, 6, bd,
                                 fw8 // 2, fh8 // 2, strip)
    return y, u, v
