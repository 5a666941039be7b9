"""Spec AV1 in-loop deblocking filter (spec 7.14), vectorized in JAX.

One implementation serves both sides: the device encoders filter their
reconstruction inside the frame jit (the filtered frame is the display
output and the inter reference; in-frame intra prediction uses the
unfiltered recon, matching the spec's placement), and the Python spec
decoder calls the same functions on CPU for conformance decode.

Scope: the uniform-grid streams our encoder emits — one filter level
per plane-direction, no segments, no delta_lf, tx 32x32 luma / 16x16
chroma everywhere (filter length 14 luma / 6 chroma at every interior
edge), plus the general thresholds so the decoder can grow coverage.
Every formula mirrors the spec's integer arithmetic exactly; the
conformance oracle is libaom decoding our lf-enabled streams bit-exact
(tests/test_spec_loopfilter.py).

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


def _filter_taps(P, Q, limit, blimit, thresh, size: int, bd: int):
    """Filter one batch of edge pixel-lines.

    P: (..., 7) samples p6..p0 (P[..., 6] = p0 nearest the edge);
    Q: (..., 7) samples q0..q6.  Returns (newP, newQ) with the same
    layout.  size: 4, 6, 8, or 14.
    """
    s = 1 << (bd - 8)
    limit = limit * s
    blimit = blimit * s
    thresh = thresh * s
    p = [P[..., 6 - i] for i in range(7)]   # p[0]=p0 .. p[6]=p6
    q = [Q[..., i] for i in range(7)]

    def ab(a, b):
        return jnp.abs(a - b)

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
        return jnp.clip(x, lo, hi)

    ps1, ps0 = p[1] - 128 * s, p[0] - 128 * s
    qs0, qs1 = q[0] - 128 * s, q[1] - 128 * s
    f = jnp.where(hev, c(ps1 - qs1), 0)
    f = jnp.where(mask, c(f + 3 * (qs0 - ps0)), 0)
    f1 = c(f + 4) >> 3
    f2 = c(f + 3) >> 3
    n_q0 = c(qs0 - f1) + 128 * s
    n_p0 = c(ps0 + f2) + 128 * s
    f3 = (f1 + 1) >> 1
    n_q1 = jnp.where(hev, qs1, c(qs1 - f3)) + 128 * s
    n_p1 = jnp.where(hev, ps1, c(ps1 + f3)) + 128 * s

    outp = [n_p0, n_p1] + [p[i] for i in range(2, 7)]
    outq = [n_q0, n_q1] + [q[i] for i in range(2, 7)]

    if size == 6:
        w = flat & mask
        op1 = _rpot(p[2] * 3 + p[1] * 2 + p[0] * 2 + q[0], 3)
        op0 = _rpot(p[2] + p[1] * 2 + p[0] * 2 + q[0] * 2 + q[1], 3)
        oq0 = _rpot(p[1] + p[0] * 2 + q[0] * 2 + q[1] * 2 + q[2], 3)
        oq1 = _rpot(p[0] + q[0] * 2 + q[1] * 2 + q[2] * 3, 3)
        outp[0] = jnp.where(w, op0, outp[0])
        outp[1] = jnp.where(w, op1, outp[1])
        outq[0] = jnp.where(w, oq0, outq[0])
        outq[1] = jnp.where(w, oq1, outq[1])
    elif size >= 8:
        w = flat & mask
        op2 = _rpot(p[3] * 3 + p[2] * 2 + p[1] + p[0] + q[0], 3)
        op1 = _rpot(p[3] * 2 + p[2] + p[1] * 2 + p[0] + q[0] + q[1], 3)
        op0 = _rpot(p[3] + p[2] + p[1] + p[0] * 2 + q[0] + q[1] + q[2], 3)
        oq0 = _rpot(p[2] + p[1] + p[0] + q[0] * 2 + q[1] + q[2] + q[3], 3)
        oq1 = _rpot(p[1] + p[0] + q[0] + q[1] * 2 + q[2] + q[3] * 2, 3)
        oq2 = _rpot(p[0] + q[0] + q[1] + q[2] * 2 + q[3] * 3, 3)
        outp[0] = jnp.where(w, op0, outp[0])
        outp[1] = jnp.where(w, op1, outp[1])
        outp[2] = jnp.where(w, op2, outp[2])
        outq[0] = jnp.where(w, oq0, outq[0])
        outq[1] = jnp.where(w, oq1, outq[1])
        outq[2] = jnp.where(w, oq2, outq[2])
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
            outp[i] = jnp.where(w2, o[key], outp[i])
        for i, key in enumerate(["q0", "q1", "q2", "q3", "q4", "q5"]):
            outq[i] = jnp.where(w2, o[key], outq[i])

    newP = jnp.stack([outp[6 - i] for i in range(7)], axis=-1)
    newQ = jnp.stack(outq[:7], axis=-1)
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


def deblock_frame(rec_y, rec_u, rec_v, lf_y, lf_u, lf_v, bd: int,
                  th: int, tw: int):
    """Filter a recon frame on the uniform 32/16 grid.  th/tw: coded
    luma dims (mi-grid size); chroma at half.  Returns new planes."""
    fh8 = ((th + 7) >> 3) << 3
    fw8 = ((tw + 7) >> 3) << 3
    y = _filter_plane(rec_y, lf_y, 32, 14, bd, fw8, fh8)
    u = _filter_plane(rec_u, lf_u, 16, 6, bd, fw8 // 2, fh8 // 2)
    v = _filter_plane(rec_v, lf_v, 16, 6, bd, fw8 // 2, fh8 // 2)
    return y, u, v
