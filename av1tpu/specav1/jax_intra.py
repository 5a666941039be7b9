"""Device-side spec-AV1 intra keyframe encoder (JAX, wavefront).

The TPU half of the spec-conformant keyframe path: mode decision,
forward DCT + quantization, and a **spec-exact integer reconstruction**
(dequant + inverse DCT + intra predictors mirroring specav1.recon
bit-for-bit) run jitted on device over a superblock wavefront; the
per-block mode/level arrays are then emitted by the native C++ tile
writer (spec_tile.cc) on the host.

Spec exactness notes:
  * only the *reconstruction* must match the spec integers (any level
    values are legal); fdct/quant run in f32 on the MXU,
  * the inverse DCT ports recon.idct1d's recursion; with the spec
    clamp (±2^(bd+7)) applied after every butterfly all intermediates
    fit int32 (|w|<=4096, |x|<=2^17 for 10-bit -> |btf| < 2^30),
  * intra availability (haveAbove/Left, top-right/bottom-left
    extensions) is a static function of block position for the fixed
    32x32 grid: precomputed host-side by simulating the decoder's
    raster-SB/z-order walk, then folded into the wavefront tables.

The wavefront is the longest-path levelling of the true dependency
DAG: above, left, above-right, plus bottom-left for superblock-corner
blocks (z-order makes (r+1, c-1) decode *before* (r, c) there).

Reference parity: this (with the daemon around it) replaces the
AV1 encoder inside the reference's exec'd ffmpeg (transcode.go:119-123)
— emitting the same universally-decodable spec bitstream.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from av1tpu.specav1 import native
from av1tpu.specav1 import recon
from av1tpu.specav1 import writer as W

# mode order must match encode.py _MODES (first-strict-min tie-breaks)
_MODE_IDS = np.array([recon.DC_PRED, recon.V_PRED, recon.H_PRED,
                      recon.SMOOTH_PRED, recon.PAETH_PRED, recon.D45_PRED,
                      recon.D135_PRED, recon.D203_PRED, recon.D67_PRED],
                     np.int32)
_DIRECTIONAL = np.array([0, 1, 1, 0, 0, 1, 1, 1, 1], bool)  # V/H count too

# full luma candidate set: every directional mode at every legal
# angle_delta (-3..3, 3 degrees per step; seq header disables the
# intra edge filter so prediction is a pure two-tap table gather),
# plus the non-directional modes at delta 0
_CAND_MODE = []
_CAND_DELTA = []
for _m, _d in zip(_MODE_IDS, _DIRECTIONAL):
    if _d:
        for _dl in range(-3, 4):
            _CAND_MODE.append(int(_m))
            _CAND_DELTA.append(_dl)
    else:
        _CAND_MODE.append(int(_m))
        _CAND_DELTA.append(0)
_CAND_MODE = np.array(_CAND_MODE, np.int32)       # (45,)
_CAND_DELTA = np.array(_CAND_DELTA, np.int32)
_CAND_DIR = np.array([recon.MODE_ANGLE.get(int(m), 0) != 0
                      for m in _CAND_MODE], bool)
# candidates whose prediction angle exceeds 180 read the BELOW-LEFT
# edge (zone 3) — banned on the strip-sharing SB row (see strip_same_sb)
_CAND_READS_BL = np.array(
    [recon.MODE_ANGLE.get(int(m), 0) + 3 * int(d) > 180 if dirn else False
     for m, d, dirn in zip(_CAND_MODE, _CAND_DELTA, _CAND_DIR)], bool)

# chroma candidate modes (uv_mode is one symbol for both planes; the
# derived tx type follows the mode: DC->DCT_DCT, V->ADST_DCT,
# H->DCT_ADST — spec compute_tx_type, reduced chroma sets)
_UV_MODE_IDS = np.array([recon.DC_PRED, recon.V_PRED, recon.H_PRED],
                        np.int32)
_UV_TX_KINDS = (("dct", "dct"), ("dct", "adst"), ("adst", "dct"))

# luma 16x16 intra (split sub-blocks): the coded tx type follows the
# prediction mode (spec Mode_To_Txfm — every derived type lands in
# TX_SET_DTT4_IDTX, the signaled 16x16 intra set); the native walker
# derives the identical DTT4 symbol index from y_mode, so no extra
# device output is needed.  recon.TX_1D maps type -> (row, col) kinds.
_Y16_COMBOS = (("dct", "dct"), ("dct", "adst"),
               ("adst", "dct"), ("adst", "adst"))


def _mode_combo(mode: int) -> int:
    from av1tpu.specav1.tile import MODE_TO_TXFM
    return _Y16_COMBOS.index(recon.TX_1D[MODE_TO_TXFM[mode]])


_CAND_COMBO = np.array([_mode_combo(int(m)) for m in _CAND_MODE],
                       np.int32)


# ---------------------------------------------------------------------------
# static plans
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def plan_waves(nbr: int, nbc: int, tile_row_starts: tuple = ()):
    """Wavefront levels + availability for an nbr x nbc grid of 32x32
    blocks, by simulating the decoder's raster-SB/z-order walk.

    tile_row_starts: block rows (beyond 0) where a new tile row begins —
    tiles are fully independent, so prediction availability resets
    there (spec tile boundary = frame boundary for intra).

    Returns dict of (nwaves, maxb) int32 arrays: r, c, have_a, have_l,
    ntr, nbl, valid.
    """
    starts = sorted(set([0] + list(tile_row_starts)))
    tile_of = np.zeros(nbr, np.int32)
    for t, s0 in enumerate(starts):
        tile_of[s0:] = t
    level = np.zeros((nbr, nbc), np.int64)
    ntr = np.zeros((nbr, nbc), np.int32)
    nbl = np.zeros((nbr, nbc), np.int32)
    have_a = np.zeros((nbr, nbc), np.int32)
    decoded = np.zeros((nbr, nbc), bool)
    # decode order: raster over 2x2-block superblocks, z-order within
    order = []
    for sr in range(0, nbr, 2):
        for sc in range(0, nbc, 2):
            for dr, dc in ((0, 0), (0, 1), (1, 0), (1, 1)):
                r, c = sr + dr, sc + dc
                if r < nbr and c < nbc:
                    order.append((r, c))
    for r, c in order:
        deps = []
        up = r > 0 and tile_of[r - 1] == tile_of[r]
        have_a[r, c] = int(up)
        if up:
            deps.append((r - 1, c))
        if c > 0:
            deps.append((r, c - 1))
        if up and c + 1 < nbc and decoded[r - 1, c + 1]:
            ntr[r, c] = 32
            deps.append((r - 1, c + 1))
        if c > 0 and r + 1 < nbr and tile_of[r + 1] == tile_of[r] \
                and decoded[r + 1, c - 1]:
            nbl[r, c] = 32
            deps.append((r + 1, c - 1))
        level[r, c] = 1 + max((level[d] for d in deps), default=-1)
        decoded[r, c] = True
    nwaves = int(level.max()) + 1
    waves = [[] for _ in range(nwaves)]
    for r, c in order:
        waves[int(level[r, c])].append((r, c))
    maxb = max(len(wv) for wv in waves)
    out = {k: np.zeros((nwaves, maxb), np.int32)
           for k in ("r", "c", "have_a", "have_l", "ntr", "nbl", "valid")}
    for i, wv in enumerate(waves):
        for j, (r, c) in enumerate(wv):
            out["r"][i, j] = r
            out["c"][i, j] = c
            out["have_a"][i, j] = have_a[r, c]
            out["have_l"][i, j] = int(c > 0)
            out["ntr"][i, j] = ntr[r, c]
            out["nbl"][i, j] = nbl[r, c]
            out["valid"][i, j] = 1
    return out


@functools.lru_cache(maxsize=None)
def _dir_tables(mode: int, size: int, delta: int = 0):
    """Static gather tables for a directional predictor at angle_delta
    ``delta`` (prediction angle = base + 3*delta; the sequence header
    disables the intra edge filter, so every angle is a pure two-tap
    gather).

    Returns (sel, i0, i1, w1) int32 (size, size) arrays: prediction =
    round2(src[i0]*(32-w1) + src[i1]*w1, 5) where src is ar_full when
    sel==0 else lc_full (length 2*size+1, index 0 = corner).
    """
    p_angle = recon.MODE_ANGLE[mode] + 3 * delta
    w = h = size
    mx = w + h - 1
    sel = np.zeros((h, w), np.int32)
    i0 = np.zeros((h, w), np.int32)
    i1 = np.zeros((h, w), np.int32)
    w1 = np.zeros((h, w), np.int32)
    for i in range(h):
        for j in range(w):
            if p_angle < 90:
                dx = int(recon.DR_DERIVATIVE[p_angle])
                idx = (i + 1) * dx
                base_i = (idx >> 6) + j
                shift = (idx >> 1) & 0x1F
                if base_i > mx:
                    i0[i, j] = i1[i, j] = 1 + mx
                    w1[i, j] = 0
                else:
                    i0[i, j] = 1 + min(base_i, mx)
                    i1[i, j] = 1 + min(base_i + 1, mx)
                    w1[i, j] = shift
            elif p_angle > 180:
                dy = int(recon.DR_DERIVATIVE[270 - p_angle])
                idx = (j + 1) * dy
                base_i = (idx >> 6) + i
                shift = (idx >> 1) & 0x1F
                sel[i, j] = 1
                i0[i, j] = 1 + min(base_i, mx)
                i1[i, j] = 1 + min(base_i + 1, mx)
                w1[i, j] = shift
            else:  # zone 2
                dx = int(recon.DR_DERIVATIVE[180 - p_angle])
                idx = (j << 6) - (i + 1) * dx
                base_i = idx >> 6
                if base_i >= -1:
                    shift = (idx >> 1) & 0x1F
                    i0[i, j] = 1 + base_i
                    i1[i, j] = 2 + base_i
                    w1[i, j] = shift
                else:
                    dy = int(recon.DR_DERIVATIVE[p_angle - 90])
                    idx2 = (i << 6) - (j + 1) * dy
                    base2 = idx2 >> 6
                    shift = (idx2 >> 1) & 0x1F
                    sel[i, j] = 1
                    i0[i, j] = 1 + base2
                    i1[i, j] = 2 + base2
                    w1[i, j] = shift
    return sel, i0, i1, w1


def _fwd_mat(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    m = np.cos((2 * j + 1) * k * math.pi / (2 * n)) * math.sqrt(2.0 / n)
    m[0] *= 1.0 / math.sqrt(2)
    gw = math.sqrt(n) / math.sqrt(2)
    rs = recon._ROW_SHIFT[(n.bit_length() - 1, n.bit_length() - 1)]
    scale = (1 << (rs + 4)) / (gw * gw)
    return (m * math.sqrt(scale)).astype(np.float32)


# ---------------------------------------------------------------------------
# spec-exact integer inverse DCT (port of recon.idct1d, jnp int32)
# ---------------------------------------------------------------------------

def _round2(x, n):
    if n == 0:
        return x
    return (x + (1 << (n - 1))) >> n


def _jbtf(w0, x0, w1, x1):
    return _round2(w0 * x0 + w1 * x1, recon.COS_BIT)


def _bitrev(i, n):
    return int(format(i, f"0{n}b")[::-1], 2) if n else 0


def _jidct(T, clamp):
    n = len(T)
    if n == 2:
        c32 = recon.cos128(32)
        return [clamp(_jbtf(c32, T[0], c32, T[1])),
                clamp(_jbtf(c32, T[0], -c32, T[1]))]
    half = n // 2
    even = _jidct([T[2 * i] for i in range(half)], clamp)
    odd = _jidct_odd([T[2 * i + 1] for i in range(half)], n, clamp)
    out = [None] * n
    for i in range(half):
        out[i] = clamp(even[i] + odd[half - 1 - i])
        out[n - 1 - i] = clamp(even[i] - odd[half - 1 - i])
    return out


def _jidct_odd(O, full, clamp):
    m = len(O)
    bits = m.bit_length() - 1
    unit = 64 // full
    s = [None] * m
    for k in range(m // 2):
        coeff = 2 * _bitrev(k, bits) + 1
        a = unit * coeff
        lo = O[(coeff - 1) // 2]
        hi = O[(full - coeff - 1) // 2]
        s[k] = clamp(_jbtf(recon.cos128(64 - a), lo, -recon.cos128(a), hi))
        s[m - 1 - k] = clamp(_jbtf(recon.cos128(a), lo,
                                   recon.cos128(64 - a), hi))
    if m == 2:
        return s
    for lvl in range(1, bits):
        g = 1 << lvl
        t = [None] * m
        for lo0 in range(0, m, g):
            gi = lo0 // g
            for i in range(g // 2):
                a_i, b_i = lo0 + i, lo0 + g - 1 - i
                if gi % 2 == 0:
                    t[a_i] = clamp(s[a_i] + s[b_i])
                    t[b_i] = clamp(s[a_i] - s[b_i])
                else:
                    t[a_i] = clamp(-s[a_i] + s[b_i])
                    t[b_i] = clamp(s[a_i] + s[b_i])
        s = t
        band_lo = g // 2
        base_angle = (64 * g) // m
        t = list(s)
        for j in range(m // 2):
            if not (band_lo <= (j % (2 * g)) < band_lo + g):
                continue
            k = m - 1 - j
            quad = j // (2 * g)
            nq = m // (2 * g)
            mult = 2 * _bitrev(quad, max(nq.bit_length() - 1, 0)) + 1
            a = base_angle * mult
            ca, cb = recon.cos128(a), recon.cos128(64 - a)
            if (j // g) % 2 == 0:
                t[j] = clamp(_jbtf(-ca, s[j], cb, s[k]))
                t[k] = clamp(_jbtf(cb, s[j], ca, s[k]))
            else:
                t[j] = clamp(_jbtf(-cb, s[j], -ca, s[k]))
                t[k] = clamp(_jbtf(-ca, s[j], cb, s[k]))
        s = t
    return s


def _jiadst(T, clamp):
    """Spec-exact inverse ADST (port of recon.iadst1d, jnp int32).
    T: list of n (batched) lanes; n in {4, 8, 16}."""
    n = len(T)
    if n == 4:
        s1, s2, s3, s4 = (int(x) for x in recon.SINPI[1:5])
        x0, x1, x2, x3 = T
        a0 = s1 * x0 + s4 * x2 + s2 * x3
        a1 = s2 * x0 - s1 * x2 - s4 * x3
        a2 = s3 * (x0 - x2 + x3)
        a3 = s3 * x1
        return [_round2(o, 12) for o in (a0 + a3, a1 + a3, a2,
                                         a0 + a1 - a3)]
    angles = recon._IADST8_ANGLES if n == 8 else recon._IADST16_ANGLES
    s = []
    for k in range(n // 2):
        s.append(T[n - 1 - 2 * k])
        s.append(T[2 * k])
    t = [None] * n
    for k in range(n // 2):
        a = angles[k]
        ca, cb = recon.cos128(a), recon.cos128(64 - a)
        t[2 * k] = clamp(_jbtf(ca, s[2 * k], cb, s[2 * k + 1]))
        t[2 * k + 1] = clamp(_jbtf(cb, s[2 * k], -ca, s[2 * k + 1]))
    s = t
    t = [None] * n
    for i in range(n // 2):
        t[i] = clamp(s[i] + s[i + n // 2])
        t[i + n // 2] = clamp(s[i] - s[i + n // 2])
    s = t
    t = list(s)
    if n == 8:
        t[4] = clamp(_jbtf(recon.cos128(16), s[4], recon.cos128(48), s[5]))
        t[5] = clamp(_jbtf(recon.cos128(48), s[4], -recon.cos128(16),
                           s[5]))
        t[6] = clamp(_jbtf(-recon.cos128(48), s[6], recon.cos128(16),
                           s[7]))
        t[7] = clamp(_jbtf(recon.cos128(16), s[6], recon.cos128(48),
                           s[7]))
        s = t
        t = [None] * n
        for base in (0, 4):
            for i in range(2):
                t[base + i] = clamp(s[base + i] + s[base + 2 + i])
                t[base + 2 + i] = clamp(s[base + i] - s[base + 2 + i])
        s = t
        t = list(s)
        for base in (2, 6):
            t[base] = clamp(_jbtf(recon.cos128(32), s[base],
                                  recon.cos128(32), s[base + 1]))
            t[base + 1] = clamp(_jbtf(recon.cos128(32), s[base],
                                      -recon.cos128(32), s[base + 1]))
        s = t
        return [s[0], -s[4], s[6], -s[2], s[3], -s[7], s[5], -s[1]]
    # n == 16
    t[8] = clamp(_jbtf(recon.cos128(8), s[8], recon.cos128(56), s[9]))
    t[9] = clamp(_jbtf(recon.cos128(56), s[8], -recon.cos128(8), s[9]))
    t[10] = clamp(_jbtf(recon.cos128(40), s[10], recon.cos128(24), s[11]))
    t[11] = clamp(_jbtf(recon.cos128(24), s[10], -recon.cos128(40),
                        s[11]))
    t[12] = clamp(_jbtf(-recon.cos128(56), s[12], recon.cos128(8), s[13]))
    t[13] = clamp(_jbtf(recon.cos128(8), s[12], recon.cos128(56), s[13]))
    t[14] = clamp(_jbtf(-recon.cos128(24), s[14], recon.cos128(40),
                        s[15]))
    t[15] = clamp(_jbtf(recon.cos128(40), s[14], recon.cos128(24),
                        s[15]))
    s = t
    t = [None] * n
    for base in (0, 8):
        for i in range(4):
            t[base + i] = clamp(s[base + i] + s[base + 4 + i])
            t[base + 4 + i] = clamp(s[base + i] - s[base + 4 + i])
    s = t
    t = list(s)
    for base in (4, 12):
        t[base] = clamp(_jbtf(recon.cos128(16), s[base],
                              recon.cos128(48), s[base + 1]))
        t[base + 1] = clamp(_jbtf(recon.cos128(48), s[base],
                                  -recon.cos128(16), s[base + 1]))
        t[base + 2] = clamp(_jbtf(-recon.cos128(48), s[base + 2],
                                  recon.cos128(16), s[base + 3]))
        t[base + 3] = clamp(_jbtf(recon.cos128(16), s[base + 2],
                                  recon.cos128(48), s[base + 3]))
    s = t
    t = [None] * n
    for base in (0, 4, 8, 12):
        for i in range(2):
            t[base + i] = clamp(s[base + i] + s[base + 2 + i])
            t[base + 2 + i] = clamp(s[base + i] - s[base + 2 + i])
    s = t
    t = list(s)
    for base in (2, 6, 10, 14):
        t[base] = clamp(_jbtf(recon.cos128(32), s[base],
                              recon.cos128(32), s[base + 1]))
        t[base + 1] = clamp(_jbtf(recon.cos128(32), s[base],
                                  -recon.cos128(32), s[base + 1]))
    s = t
    return [s[0], -s[8], s[12], -s[4], s[6], -s[14], s[10], -s[2],
            s[3], -s[11], s[15], -s[7], s[5], -s[13], s[9], -s[1]]


def _japply_1d(kind: str, T, clamp):
    if kind == "dct":
        return _jidct(T, clamp)
    assert kind == "adst"
    return _jiadst(T, clamp)


def inv_tx2d_add(dq, pred, bit_depth: int, row_kind: str = "dct",
                 col_kind: str = "dct"):
    """dq: (B, n, n) int32 levels*dqv; pred: (B, n, n) int32.  Returns
    spec-exact reconstructed pixels (B, n, n) int32.  row_kind/col_kind
    select the 1-D transforms (spec TX_1D map; flip variants unused —
    the encoder never picks FLIPADST types)."""
    n = dq.shape[-1]
    cb = bit_depth + 8
    lo, hi = -(1 << (cb - 1)), (1 << (cb - 1)) - 1

    def clamp(x):
        return jnp.clip(x, lo, hi)

    buf = clamp(dq)
    cols = [buf[:, :, i] for i in range(n)]
    row_out = _japply_1d(row_kind, cols, clamp)
    buf = jnp.stack(row_out, axis=2)
    rs = recon._ROW_SHIFT[(n.bit_length() - 1, n.bit_length() - 1)]
    buf = clamp(_round2(buf, rs))
    rows = [buf[:, i, :] for i in range(n)]
    col_out = _japply_1d(col_kind, rows, clamp)
    buf = jnp.stack(col_out, axis=1)
    res = _round2(buf, 4)
    return jnp.clip(pred + res, 0, (1 << bit_depth) - 1)


def inv_dct2d_add(dq, pred, bit_depth: int):
    """DCT_DCT specialization (the inter path's hot transform)."""
    return inv_tx2d_add(dq, pred, bit_depth)


@functools.lru_cache(maxsize=None)
def _fwd_mat_kind(kind: str, n: int) -> np.ndarray:
    """Forward 1-D transform matrix for quantization, derived as the
    scaled numeric inverse of the spec integer inverse transform (the
    reconstruction uses the exact integer inverse, so the forward only
    needs to be its approximate inverse; sqrt of the 2-D descale is
    folded into each side like _fwd_mat)."""
    if kind == "dct":
        return _fwd_mat(n)
    # extract the integer inverse's linear map (no clamp; scaled input
    # to wash out rounding)
    scale_in = 1 << 12
    A = np.zeros((n, n), np.float64)
    for j in range(n):
        e = [np.int64(0)] * n
        e[j] = np.int64(scale_in)
        out = recon.iadst1d(e, lambda x: x)
        A[:, j] = np.asarray(out, np.float64) / scale_in
    rs = recon._ROW_SHIFT[(n.bit_length() - 1, n.bit_length() - 1)]
    s = math.sqrt(float(1 << (rs + 4)))
    return (s * np.linalg.inv(A)).astype(np.float32)


# ---------------------------------------------------------------------------
# predictors (batched; edges per spec availability rules)
# ---------------------------------------------------------------------------

def _gather_edges(rec, y0, x0, have_a, have_l, ntr, nbl, size, base,
                  fdims=None):
    """Returns (ar_full, lc_full, corner): length 2*size+1 vectors with
    index 0 = corner, mirroring recon.predict_intra's edge assembly.
    fdims: the true (coded) plane dims when smaller than rec's padded
    shape — edge reads clamp there exactly like the decoder's max_x/y."""
    n = 2 * size
    fh, fw = fdims if fdims is not None else rec.shape
    y0c = jnp.maximum(y0 - 1, 0)
    x0c = jnp.maximum(x0 - 1, 0)
    na = jnp.maximum(1, jnp.minimum(jnp.minimum(size + ntr, fw - x0), n))
    above = rec[y0c, x0 + jnp.minimum(jnp.arange(n), na - 1)]
    above = jnp.where(have_a, above,
                      jnp.where(have_l, rec[y0, x0c], base - 1))
    nl = jnp.maximum(1, jnp.minimum(jnp.minimum(size + nbl, fh - y0), n))
    left = rec[y0 + jnp.minimum(jnp.arange(n), nl - 1), x0c]
    left = jnp.where(have_l, left,
                     jnp.where(have_a, rec[y0c, x0], base + 1))
    corner = jnp.where(have_a & have_l, rec[y0c, x0c],
                       jnp.where(have_a, rec[ y0c, x0],
                                 jnp.where(have_l, rec[y0, x0c], base)))
    ar = jnp.concatenate([corner[None], above])
    lc = jnp.concatenate([corner[None], left])
    return ar, lc, corner


def _predict_all(ar, lc, corner, have_a, have_l, size, base, modes,
                 deltas=None):
    """All candidate predictions, stacked (n_modes, size, size) int32.
    ar/lc: (2*size+1,) with [0]=corner.  deltas: per-candidate
    angle_delta for directional modes (None = all zero)."""
    above = ar[1:1 + size]
    left = lc[1:1 + size]
    n2 = size.bit_length() - 1
    if deltas is None:
        deltas = [0] * len(modes)
    preds = []
    for m, dl in zip(modes, deltas):
        if dl != 0:
            # directional at nonzero delta (incl. V/H whose delta-0
            # forms use the exact-copy branches below)
            sel, i0, i1, w1 = _dir_tables(m, size, dl)
            v0 = jnp.where(sel == 0, ar[i0], lc[i0])
            v1 = jnp.where(sel == 0, ar[i1], lc[i1])
            w1j = jnp.asarray(w1, jnp.int32)
            preds.append(_round2(v0 * (32 - w1j) + v1 * w1j, 5))
            continue
        if m == recon.DC_PRED:
            s_a = above.sum()
            s_l = left.sum()
            v = jnp.where(
                have_a & have_l,
                (s_a + s_l + size) // (2 * size),
                jnp.where(have_a, (s_a + (size >> 1)) >> n2,
                          jnp.where(have_l, (s_l + (size >> 1)) >> n2,
                                    base)))
            preds.append(jnp.full((size, size), 0, jnp.int32) + v)
        elif m == recon.V_PRED:
            preds.append(jnp.tile(above[None, :], (size, 1)))
        elif m == recon.H_PRED:
            preds.append(jnp.tile(left[:, None], (1, size)))
        elif m == recon.PAETH_PRED:
            a = jnp.tile(above[None, :], (size, 1))
            l_ = jnp.tile(left[:, None], (1, size))
            pb = a + l_ - corner
            pa = jnp.abs(pb - a)
            pl = jnp.abs(pb - l_)
            pc = jnp.abs(pb - corner)
            preds.append(jnp.where((pa <= pl) & (pa <= pc), a,
                                   jnp.where(pl <= pc, l_, corner)))
        elif m == recon.SMOOTH_PRED:
            wv = jnp.asarray(recon.SM_WEIGHTS[size], jnp.int32)
            br = left[size - 1]
            rt = above[size - 1]
            i = wv[:, None]
            j = wv[None, :]
            s = (i * above[None, :] + (256 - i) * br +
                 j * left[:, None] + (256 - j) * rt)
            preds.append(_round2(s, 9))
        else:  # directional at angle_delta dl
            sel, i0, i1, w1 = _dir_tables(m, size, dl)
            v0 = jnp.where(sel == 0, ar[i0], lc[i0])
            v1 = jnp.where(sel == 0, ar[i1], lc[i1])
            w1j = jnp.asarray(w1, jnp.int32)
            preds.append(_round2(v0 * (32 - w1j) + v1 * w1j, 5))
    return jnp.stack([p.astype(jnp.int32) for p in preds])


# ---------------------------------------------------------------------------
# the jitted frame encoder
# ---------------------------------------------------------------------------

# header-bit model for the keyframe 32->16 split RD: ~10 bits per
# coded intra unit (kf_y_mode + angle + uv_mode + skip), +2 for the
# extra partition symbol — the same shape as jax_inter's inter model
_HB16 = 10.0


@functools.partial(jax.jit,
                   static_argnames=("nbr", "nbc", "bit_depth", "th", "tw",
                                    "tile_row_starts", "deblock", "qround",
                                    "cdef", "lr", "split16"))
def _encode_frame(y, u, v, qindex, nbr: int, nbc: int, bit_depth: int,
                  th: int = 0, tw: int = 0, tile_row_starts: tuple = (),
                  lf_y=0, lf_uv=0, deblock: bool = False,
                  qround: float = 0.70, cdef: bool = False,
                  cdef_damping=4, lr: bool = False, fh_clamp=None,
                  split16: bool = True):
    """y: (H, W) uint8/16 SB-padded source; returns grids + levels +
    recon planes.

    split16: RD-choose PARTITION_SPLIT (four 16x16 intra sub-blocks,
    each with its own mode/angle/uv from the full candidate set) per
    32x32 block.  Sub-block edge availability collapses to the
    block-level wavefront flags: within the SB's z-order walk the TR
    quadrant's top-right extension exists iff the parent block's does
    (spec 7.12.2 BlockDecoded corner reads, verified for all four SB
    positions), likewise BL's bottom-left; TL extends into the
    parent's own edges and BR is fully interior.  This closes the
    measured ~-12 dB intra-texture gap of 32x32-only keyframes
    (BASELINE.md round-4 head-to-head; av1_vaapi partitions keyframes
    to 4x4, transcode.go:119-123).

    fh_clamp: optional TRACED override of the bottom edge-read clamp
    (the spec's MiRows*4 bound on left-column reads).  The sharded
    keyframe path passes min(global_fh8 - row0, stripe_h) per stripe
    so the LAST stripe clamps at the true frame bottom exactly like
    the single-chip encode (jax_sharded.encode_key_sharded)."""
    H, Wd = nbr * 32, nbc * 32
    th = th or H
    tw = tw or Wd
    # 16px bottom strip (height % 32 == 16): the last 4 mi rows code as
    # edge-SPLIT 16x16 V_PRED blocks after the main wavefront
    strip = (th % 32) == 16
    nbr_main = th // 32
    # wavefront over the CODED grid only (ceil of the true dims): the
    # decoder neither codes nor makes available any block beyond it
    waves = plan_waves(nbr_main if strip else -(-th // 32),
                       -(-tw // 32), tile_row_starts)
    wave_xs = {k: jnp.asarray(a) for k, a in waves.items()}
    base = 1 << (bit_depth - 1)
    maxlvl = (1 << bit_depth) - 1
    # spec edge clamp is MI-grid-based: MiRows/MiCols round the frame
    # to 8px granularity (MiRows = 2*((h+7)>>3)), so a 540-tall frame
    # clamps edge reads at row 543, not 539
    fh8 = ((th + 7) >> 3) << 3
    fw8 = ((tw + 7) >> 3) << 3
    fh_c = fh8 if fh_clamp is None else fh_clamp

    fm32 = jnp.asarray(_fwd_mat(32))
    fm16 = jnp.asarray(_fwd_mat(16))
    dcq = jnp.asarray(recon.DC_Q[bit_depth], jnp.int32)[qindex]
    acq = jnp.asarray(recon.AC_Q[bit_depth], jnp.int32)[qindex]
    # quantizer rounding offset: floor(|c|/q + 1 - qround).  The 0.70
    # default sits on the RD knee for this deadzone quantizer (sweep in
    # BASELINE.md round-2 notes); configured via `tpu.qround` and
    # recorded in the job JSON (it changes every emitted bit).
    deadzone = jnp.float32(1.0 - qround)

    def quant(coef, n, shift):
        dq = jnp.full((n, n), acq, jnp.float32)
        dq = dq.at[0, 0].set(dcq.astype(jnp.float32))
        dq = dq / (1 << shift)
        mag = jnp.abs(coef) / dq + deadzone
        lv = jnp.clip(jnp.floor(mag), 0, 32767).astype(jnp.int32)
        return jnp.where(coef < 0, -lv, lv)

    def dequant(lv, n, shift):
        dq = jnp.full((n, n), acq, jnp.int32)
        dq = dq.at[0, 0].set(dcq)
        mag = (jnp.abs(lv) * dq) & 0xFFFFFF
        return jnp.sign(lv) * (mag >> shift)

    src_y = y.astype(jnp.int32)
    src_u = u.astype(jnp.int32)
    src_v = v.astype(jnp.int32)

    # when the 16px strip shares its SB with the last main block row
    # (th % 64 == 48), the DECODER sees bottom-left pixels for that
    # row's SB-aligned blocks (the previous SB's strip decodes first in
    # z-order) that this planner does not model — ban every candidate
    # that reads them (prediction angle > 180) on that row so encoder
    # and decoder predictions agree
    strip_same_sb = strip and (nbr_main * 32) % 64 == 32
    reads_bl_lane = jnp.asarray(_CAND_READS_BL)
    fm16a = jnp.asarray(_fwd_mat_kind("adst", 16))
    fm8 = jnp.asarray(_fwd_mat(8))
    fm8a = jnp.asarray(_fwd_mat_kind("adst", 8))
    # nonzero angle deltas cost ~2 extra bits: charge the same
    # lambda*bits the skip RDO uses so flat ties stay at delta 0
    lam = (acq.astype(jnp.int32) * acq.astype(jnp.int32)) >> 7
    delta_cost = (lam * 2 * (jnp.asarray(_CAND_DELTA) != 0)).astype(
        jnp.int32)

    def block_fn(rec_y, rec_u, rec_v, r, c, have_a, have_l, ntr, nbl):
        y0, x0 = r * 32, c * 32
        ha = have_a.astype(bool)
        hl = have_l.astype(bool)
        ar, lcv, corner = _gather_edges(rec_y, y0, x0, ha, hl, ntr, nbl,
                                        32, base, fdims=(fh_c, fw8))
        preds = _predict_all(ar, lcv, corner, ha, hl, 32, base,
                             list(_CAND_MODE), list(_CAND_DELTA))
        rows = y0 + jnp.arange(32)[:, None]
        cols = x0 + jnp.arange(32)[None, :]
        sy = src_y[rows, cols]
        # full-RD mode decision in the transform domain: forward DCT +
        # quant for every candidate (batched 32x32 matmuls — MXU-cheap),
        # cost = quantization error (~= pixel distortion x 2^(rs+4)=64,
        # Parseval) + lambda*rate.  Prediction-SSE ranking mis-orders
        # candidates whose residual quantizes better despite a worse
        # fit (measured -0.04 dB Y on diagonal content).
        resids = (sy[None] - preds).astype(jnp.float32)
        coefs = jnp.einsum("ij,bjk,lk->bil", fm32, resids, fm32)
        lvs = quant(coefs, 32, 1)
        deqs = dequant(lvs, 32, 1).astype(jnp.float32)
        qerr = ((coefs - deqs) ** 2).sum(axis=(1, 2)) / 64.0
        nnzs = (lvs != 0).sum(axis=(1, 2))
        rd = qerr + lam.astype(jnp.float32) * (3.0 * nnzs) \
            + delta_cost.astype(jnp.float32)
        rd = rd + jnp.where(jnp.asarray(_CAND_DIR) & ~(ha | hl),
                            jnp.float32(1e18), jnp.float32(0))
        if strip_same_sb:
            rd = rd + jnp.where(
                reads_bl_lane & (r == nbr_main - 1), jnp.float32(1e18),
                jnp.float32(0))
        mi = jnp.argmin(rd)
        mode = jnp.asarray(_CAND_MODE)[mi]
        angle = jnp.asarray(_CAND_DELTA)[mi]
        pred = preds[mi]
        lvy = lvs[mi]
        rec_blk_y = inv_dct2d_add(dequant(lvy, 32, 1)[None], pred[None],
                                  bit_depth)[0]
        # chroma: one shared uv_mode from {DC, V, H} by joint prediction
        # SSE; the derived tx follows the mode (DCT / ADST_DCT /
        # DCT_ADST — spec compute_tx_type), so recon runs all three
        # transforms and selects
        cy0, cx0 = y0 // 2, x0 // 2
        crows = cy0 + jnp.arange(16)[:, None]
        ccols = cx0 + jnp.arange(16)[None, :]
        cpreds = []
        csrcs = []
        cedges = []
        for rec_p, src_p in ((rec_u, src_u), (rec_v, src_v)):
            arc, lcc, cornc = _gather_edges(
                rec_p, cy0, cx0, ha, hl, ntr // 2, nbl // 2, 16, base,
                fdims=(fh_c // 2, fw8 // 2))
            cedges.append((arc, lcc, cornc))
            cpreds.append(_predict_all(arc, lcc, cornc, ha, hl, 16,
                                       base, list(_UV_MODE_IDS)))
            csrcs.append(src_p[crows, ccols])
        # full RD per candidate: all three coded paths are computed
        # (they're needed for the select anyway), so the decision uses
        # post-quantization distortion + lambda*rate, not prediction
        # SSE — a smooth-gradient prediction can still transform worse
        lv_all = []   # [plane][cand]
        rec_all = []
        for p in range(2):
            lv_k = []
            rec_k = []
            for k, (rk, ck) in enumerate(_UV_TX_KINDS):
                predc = cpreds[p][k]
                resid = (csrcs[p] - predc).astype(jnp.float32)
                fr = fm16 if rk == "dct" else fm16a
                fc = fm16 if ck == "dct" else fm16a
                coefc = fc @ resid @ fr.T
                lvc = quant(coefc, 16, 0)
                recc = inv_tx2d_add(dequant(lvc, 16, 0)[None],
                                    predc[None], bit_depth,
                                    row_kind=rk, col_kind=ck)[0]
                lv_k.append(lvc)
                rec_k.append(recc)
            lv_all.append(jnp.stack(lv_k))
            rec_all.append(jnp.stack(rec_k))
        cdist = sum(((s[None] - r) ** 2).sum(axis=(1, 2))
                    for r, s in zip(rec_all, csrcs))
        cnnz = sum((l != 0).sum(axis=(1, 2)) for l in lv_all)
        cpen = jnp.where(
            jnp.asarray([recon.MODE_ANGLE.get(int(m), 0) != 0
                         for m in _UV_MODE_IDS]) & ~(ha | hl),
            jnp.int32(1 << 30), jnp.int32(0))
        uvmi = jnp.argmin(cdist + lam * (3 * cnnz) + cpen)
        uv_mode = jnp.asarray(_UV_MODE_IDS)[uvmi]
        lvu, rec_blk_u = lv_all[0][uvmi], rec_all[0][uvmi]
        lvv, rec_blk_v = lv_all[1][uvmi], rec_all[1][uvmi]
        skip = ((lvy == 0).all() & (lvu == 0).all() &
                (lvv == 0).all()).astype(jnp.int32)
        if not split16:
            z4 = jnp.zeros((4,), jnp.int32)
            return (rec_blk_y, rec_blk_u, rec_blk_v, lvy, lvu, lvv,
                    mode, uv_mode, angle, skip, jnp.int32(0), z4, z4,
                    z4, z4)

        # ---- 32 -> 16 keyframe partition split RD ------------------
        true_ = jnp.asarray(True)
        ext_tr = ntr > 0
        ext_bl = nbl > 0
        lam_f = lam.astype(jnp.float32)
        cand_dir = jnp.asarray(_CAND_DIR)
        dcosts = delta_cost.astype(jnp.float32)
        uv_dir_pen = jnp.asarray(
            [recon.MODE_ANGLE.get(int(m), 0) != 0 for m in _UV_MODE_IDS])

        def _ext_cap(vec, own, ext_flag):
            # replicate past own+ext, ext in {0, own} (ext_flag); the
            # frame-dim clamp is already baked into the parent edges
            cap = jnp.where(ext_flag, vec[2 * own - 1], vec[own - 1])
            n_ok = jnp.where(ext_flag, 2 * own, own)
            return jnp.where(jnp.arange(2 * own) < n_ok, vec, cap)

        # per-candidate mode-derived 1-D transforms (spec Mode_To_Txfm)
        kinds16 = [_Y16_COMBOS[int(k)] for k in _CAND_COMBO]
        fc16 = jnp.stack([fm16 if ck == "dct" else fm16a
                          for _, ck in kinds16])
        fr16 = jnp.stack([fm16 if rk == "dct" else fm16a
                          for rk, _ in kinds16])
        cand_combo = jnp.asarray(_CAND_COMBO)

        def quad_y(sy16, ar33, lc33, cnr, ha_q, hl_q):
            preds = _predict_all(ar33, lc33, cnr, ha_q, hl_q, 16, base,
                                 list(_CAND_MODE), list(_CAND_DELTA))
            resids = (sy16[None] - preds).astype(jnp.float32)
            coefs = jnp.einsum("bij,bjk,blk->bil", fc16, resids, fr16)
            lvs = quant(coefs, 16, 0)
            deqs = dequant(lvs, 16, 0).astype(jnp.float32)
            qerr = ((coefs - deqs) ** 2).sum(axis=(1, 2)) / 64.0
            nnzs = (lvs != 0).sum(axis=(1, 2))
            rdq = qerr + lam_f * (3.0 * nnzs) + dcosts
            rdq = rdq + jnp.where(cand_dir & ~(ha_q | hl_q),
                                  jnp.float32(1e18), jnp.float32(0))
            mq = jnp.argmin(rdq)
            lv = lvs[mq]
            dq = dequant(lv, 16, 0)[None]
            pq = preds[mq][None]
            # inverse with the chosen mode's derived kinds: 4 static
            # combos + select (the kinds cannot be traced dynamically)
            recs = jnp.stack([inv_tx2d_add(dq, pq, bit_depth,
                                           row_kind=rk, col_kind=ck)[0]
                              for rk, ck in _Y16_COMBOS])
            rec = recs[cand_combo[mq]]
            return (jnp.asarray(_CAND_MODE)[mq],
                    jnp.asarray(_CAND_DELTA)[mq], lv, rec, rdq[mq])

        def quad_uv(s8s, edges8, ha_q, hl_q):
            lv_pl, rec_pl = [], []
            for (ar17, lc17, cnr), s8 in zip(edges8, s8s):
                preds = _predict_all(ar17, lc17, cnr, ha_q, hl_q, 8,
                                     base, list(_UV_MODE_IDS))
                lv_k, rec_k = [], []
                for k, (rk, ck) in enumerate(_UV_TX_KINDS):
                    fr = fm8 if rk == "dct" else fm8a
                    fc = fm8 if ck == "dct" else fm8a
                    coef = fc @ (s8 - preds[k]).astype(jnp.float32) \
                        @ fr.T
                    lvc = quant(coef, 8, 0)
                    recc = inv_tx2d_add(dequant(lvc, 8, 0)[None],
                                        preds[k][None], bit_depth,
                                        row_kind=rk, col_kind=ck)[0]
                    lv_k.append(lvc)
                    rec_k.append(recc)
                lv_pl.append(jnp.stack(lv_k))
                rec_pl.append(jnp.stack(rec_k))
            dist = sum(((s[None] - rp) ** 2).sum(axis=(1, 2))
                       for rp, s in zip(rec_pl, s8s))
            nz = sum((l != 0).sum(axis=(1, 2)) for l in lv_pl)
            pen = jnp.where(uv_dir_pen & ~(ha_q | hl_q),
                            jnp.int32(1 << 30), jnp.int32(0))
            kq = jnp.argmin(dist + lam * (3 * nz) + pen)
            return (jnp.asarray(_UV_MODE_IDS)[kq], lv_pl[0][kq],
                    lv_pl[1][kq], rec_pl[0][kq], rec_pl[1][kq],
                    (dist[kq] + lam * 3 * nz[kq]).astype(jnp.float32))

        (arc_u, lcc_u, corn_u), (arc_v, lcc_v, corn_v) = cedges
        loc_y = jnp.zeros((32, 32), jnp.int32)
        loc_u = jnp.zeros((16, 16), jnp.int32)
        loc_v = jnp.zeros((16, 16), jnp.int32)
        lvy16 = jnp.zeros((32, 32), jnp.int32)
        lvu16 = jnp.zeros((16, 16), jnp.int32)
        lvv16 = jnp.zeros((16, 16), jnp.int32)
        m16l, a16l, u16l, s16l = [], [], [], []
        rd_split = lam_f * (4.0 * _HB16 + 2.0)
        for qr, qc in ((0, 0), (0, 1), (1, 0), (1, 1)):
            if (qr, qc) == (0, 0):
                ar33, lc33, cnr_q = ar[:33], lcv[:33], corner
                ha_q, hl_q = ha, hl
                e_u = (arc_u[:17], lcc_u[:17], corn_u)
                e_v = (arc_v[:17], lcc_v[:17], corn_v)
            elif (qr, qc) == (0, 1):
                tlc = loc_y[0:16, 15]
                abv = _ext_cap(ar[17:49], 16, ext_tr)
                abv = jnp.where(ha, abv, tlc[0])
                lft = jnp.concatenate(
                    [tlc, jnp.broadcast_to(tlc[15][None], (16,))])
                cnr_q = jnp.where(ha, ar[16], tlc[0])
                ar33 = jnp.concatenate([cnr_q[None], abv])
                lc33 = jnp.concatenate([cnr_q[None], lft])
                ha_q, hl_q = ha, true_

                def _tr_c(arc, locp):
                    tl = locp[0:8, 7]
                    ab = _ext_cap(arc[9:25], 8, ext_tr)
                    ab = jnp.where(ha, ab, tl[0])
                    lf = jnp.concatenate(
                        [tl, jnp.broadcast_to(tl[7][None], (8,))])
                    cq = jnp.where(ha, arc[8], tl[0])
                    return (jnp.concatenate([cq[None], ab]),
                            jnp.concatenate([cq[None], lf]), cq)

                e_u = _tr_c(arc_u, loc_u)
                e_v = _tr_c(arc_v, loc_v)
            elif (qr, qc) == (1, 0):
                abv = loc_y[15, 0:32]
                lft = _ext_cap(lcv[17:49], 16, ext_bl)
                lft = jnp.where(hl, lft, loc_y[15, 0])
                cnr_q = jnp.where(hl, lcv[16], loc_y[15, 0])
                ar33 = jnp.concatenate([cnr_q[None], abv])
                lc33 = jnp.concatenate([cnr_q[None], lft])
                ha_q, hl_q = true_, hl

                def _bl_c(lcc, locp):
                    ab = locp[7, 0:16]
                    lf = _ext_cap(lcc[9:25], 8, ext_bl)
                    lf = jnp.where(hl, lf, locp[7, 0])
                    cq = jnp.where(hl, lcc[8], locp[7, 0])
                    return (jnp.concatenate([cq[None], ab]),
                            jnp.concatenate([cq[None], lf]), cq)

                e_u = _bl_c(lcc_u, loc_u)
                e_v = _bl_c(lcc_v, loc_v)
            else:
                abv = jnp.concatenate(
                    [loc_y[15, 16:32],
                     jnp.broadcast_to(loc_y[15, 31][None], (16,))])
                lft = jnp.concatenate(
                    [loc_y[16:32, 15],
                     jnp.broadcast_to(loc_y[31, 15][None], (16,))])
                cnr_q = loc_y[15, 15]
                ar33 = jnp.concatenate([cnr_q[None], abv])
                lc33 = jnp.concatenate([cnr_q[None], lft])
                ha_q = hl_q = true_

                def _br_c(locp):
                    ab = jnp.concatenate(
                        [locp[7, 8:16],
                         jnp.broadcast_to(locp[7, 15][None], (8,))])
                    lf = jnp.concatenate(
                        [locp[8:16, 7],
                         jnp.broadcast_to(locp[15, 7][None], (8,))])
                    cq = locp[7, 7]
                    return (jnp.concatenate([cq[None], ab]),
                            jnp.concatenate([cq[None], lf]), cq)

                e_u = _br_c(loc_u)
                e_v = _br_c(loc_v)
            sy16 = sy[qr * 16:(qr + 1) * 16, qc * 16:(qc + 1) * 16]
            mq, aq, lvq, recq, rdq = quad_y(sy16, ar33, lc33, cnr_q,
                                            ha_q, hl_q)
            loc_y = loc_y.at[qr * 16:(qr + 1) * 16,
                             qc * 16:(qc + 1) * 16].set(recq)
            lvy16 = lvy16.at[qr * 16:(qr + 1) * 16,
                             qc * 16:(qc + 1) * 16].set(lvq)
            su8 = csrcs[0][qr * 8:(qr + 1) * 8, qc * 8:(qc + 1) * 8]
            sv8 = csrcs[1][qr * 8:(qr + 1) * 8, qc * 8:(qc + 1) * 8]
            uvq, lvu8, lvv8, recu8, recv8, cuv = quad_uv(
                (su8, sv8), (e_u, e_v), ha_q, hl_q)
            loc_u = loc_u.at[qr * 8:(qr + 1) * 8,
                             qc * 8:(qc + 1) * 8].set(recu8)
            loc_v = loc_v.at[qr * 8:(qr + 1) * 8,
                             qc * 8:(qc + 1) * 8].set(recv8)
            lvu16 = lvu16.at[qr * 8:(qr + 1) * 8,
                             qc * 8:(qc + 1) * 8].set(lvu8)
            lvv16 = lvv16.at[qr * 8:(qr + 1) * 8,
                             qc * 8:(qc + 1) * 8].set(lvv8)
            rd_split = rd_split + rdq + cuv
            m16l.append(mq)
            a16l.append(aq)
            u16l.append(uvq)
            s16l.append(((lvq == 0).all() & (lvu8 == 0).all() &
                         (lvv8 == 0).all()).astype(jnp.int32))

        # pixel-scale RD for the split-vs-none comparison: the 32x32
        # forward matrix packs only 16x pixel energy (vs 64x at 16/8 —
        # _fwd_mat's scale = 2^(rs+4)/gw^2 differs per size), so the
        # mode-decision qerr (X/64) understates 32-block distortion 4x.
        # Mode selection keeps its own consistent scale; this
        # comparison must not.
        rd_none = (4.0 * qerr[mi] + lam_f * (3.0 * nnzs[mi]) +
                   dcosts[mi] +
                   (cdist[uvmi] + lam * 3 * cnnz[uvmi]).astype(
                       jnp.float32) + lam_f * _HB16)
        # only blocks fully inside the coded mi grid split (the writer
        # codes edge-overhang blocks with implicit edge partitions)
        ok = ((r + 1) * 32 <= fh_c) & ((c + 1) * 32 <= fw8)
        if strip_same_sb:
            # the strip-sharing row's zone-3 ban already diverges the
            # 32 path there; splits would add decoder BL reads of strip
            # pixels the wavefront has not produced yet
            ok = ok & (r != nbr_main - 1)
        do_sp = ok & (rd_split < rd_none)
        rec_blk_y = jnp.where(do_sp, loc_y, rec_blk_y)
        rec_blk_u = jnp.where(do_sp, loc_u, rec_blk_u)
        rec_blk_v = jnp.where(do_sp, loc_v, rec_blk_v)
        lvy = jnp.where(do_sp, lvy16, lvy)
        lvu = jnp.where(do_sp, lvu16, lvu)
        lvv = jnp.where(do_sp, lvv16, lvv)
        return (rec_blk_y, rec_blk_u, rec_blk_v, lvy, lvu, lvv, mode,
                uv_mode, angle, skip, do_sp.astype(jnp.int32),
                jnp.stack(m16l), jnp.stack(u16l), jnp.stack(a16l),
                jnp.stack(s16l))

    def wave_step(carry, xs):
        (rec_y, rec_u, rec_v, lv_y, lv_u, lv_v, g_mode, g_uv, g_skip,
         g_angle, g_split, g_m16, g_uv16, g_a16, g_s16) = carry
        outs = jax.vmap(
            lambda r, c, a, l, t, b: block_fn(rec_y, rec_u, rec_v, r, c,
                                              a, l, t, b)
        )(xs["r"], xs["c"], xs["have_a"], xs["have_l"], xs["ntr"],
          xs["nbl"])
        (rby, rbu, rbv, lvy, lvu, lvv, mode, uv_mode, angle, skip,
         splt, m16, uv16, a16, s16) = outs
        # scatter: invalid lanes get out-of-range coords -> dropped
        r_eff = jnp.where(xs["valid"] == 1, xs["r"], nbr + 1)
        c_eff = xs["c"]
        ys = r_eff[:, None, None] * 32 + jnp.arange(32)[None, :, None]
        xsx = c_eff[:, None, None] * 32 + jnp.arange(32)[None, None, :]
        rec_y = rec_y.at[ys, xsx].set(rby.astype(rec_y.dtype), mode="drop")
        lv_y = lv_y.at[ys, xsx].set(lvy, mode="drop")
        cyx = r_eff[:, None, None] * 16 + jnp.arange(16)[None, :, None]
        cxx = c_eff[:, None, None] * 16 + jnp.arange(16)[None, None, :]
        rec_u = rec_u.at[cyx, cxx].set(rbu.astype(rec_u.dtype), mode="drop")
        rec_v = rec_v.at[cyx, cxx].set(rbv.astype(rec_v.dtype), mode="drop")
        lv_u = lv_u.at[cyx, cxx].set(lvu, mode="drop")
        lv_v = lv_v.at[cyx, cxx].set(lvv, mode="drop")
        g_mode = g_mode.at[r_eff, c_eff].set(mode, mode="drop")
        g_uv = g_uv.at[r_eff, c_eff].set(uv_mode, mode="drop")
        g_skip = g_skip.at[r_eff, c_eff].set(skip, mode="drop")
        g_angle = g_angle.at[r_eff, c_eff].set(angle, mode="drop")
        g_split = g_split.at[r_eff, c_eff].set(splt, mode="drop")
        g_m16 = g_m16.at[r_eff, c_eff].set(m16, mode="drop")
        g_uv16 = g_uv16.at[r_eff, c_eff].set(uv16, mode="drop")
        g_a16 = g_a16.at[r_eff, c_eff].set(a16, mode="drop")
        g_s16 = g_s16.at[r_eff, c_eff].set(s16, mode="drop")
        return (rec_y, rec_u, rec_v, lv_y, lv_u, lv_v, g_mode, g_uv,
                g_skip, g_angle, g_split, g_m16, g_uv16, g_a16,
                g_s16), None

    init = (jnp.zeros((H, Wd), jnp.int32),
            jnp.zeros((H // 2, Wd // 2), jnp.int32),
            jnp.zeros((H // 2, Wd // 2), jnp.int32),
            jnp.zeros((H, Wd), jnp.int32),
            jnp.zeros((H // 2, Wd // 2), jnp.int32),
            jnp.zeros((H // 2, Wd // 2), jnp.int32),
            jnp.zeros((nbr, nbc), jnp.int32),
            jnp.zeros((nbr, nbc), jnp.int32),
            jnp.zeros((nbr, nbc), jnp.int32),
            jnp.zeros((nbr, nbc), jnp.int32),
            jnp.zeros((nbr, nbc), jnp.int32),
            jnp.zeros((nbr, nbc, 4), jnp.int32),
            jnp.zeros((nbr, nbc, 4), jnp.int32),
            jnp.zeros((nbr, nbc, 4), jnp.int32),
            jnp.zeros((nbr, nbc, 4), jnp.int32))
    carry, _ = jax.lax.scan(wave_step, init, wave_xs)
    nsc = 2 * nbc  # strip columns (16px each)
    if strip:
        rec_y, rec_u, rec_v, lv_y, lv_u, lv_v = carry[0:6]
        y0 = nbr_main * 32
        # luma: V_PRED from the row above, coded 16x16 residual with
        # the mode-derived ADST_DCT transform (vertical ADST — the
        # walker signals the same derived DTT4 index for y_mode V)
        pred = jnp.broadcast_to(rec_y[y0 - 1][None, :], (16, Wd))
        srows = src_y[y0:y0 + 16, :]
        resid = (srows - pred).astype(jnp.float32)
        rblk = resid.reshape(16, Wd // 16, 16).transpose(1, 0, 2)
        coef = jnp.einsum("ij,bjk,lk->bil", fm16a, rblk, fm16)
        lvs = quant(coef, 16, 0)
        dq = dequant(lvs, 16, 0)
        pblk = pred.reshape(16, Wd // 16, 16).transpose(1, 0, 2)
        rec_blk = inv_tx2d_add(dq, pblk.astype(jnp.int32), bit_depth,
                               row_kind="dct", col_kind="adst")
        rec_rows = rec_blk.transpose(1, 0, 2).reshape(16, Wd)
        lv_rows = lvs.transpose(1, 0, 2).reshape(16, Wd)
        rec_y = jax.lax.dynamic_update_slice(rec_y, rec_rows, (y0, 0))
        lv_y = jax.lax.dynamic_update_slice(lv_y, lv_rows, (y0, 0))
        strip_skip = (lvs == 0).all(axis=(1, 2))[:nsc].astype(jnp.int32)
        # chroma: V_PRED prediction only (all-zero txbs keep every
        # transform square); levels stay zero
        cy0 = y0 // 2
        cpred = jnp.broadcast_to(rec_u[cy0 - 1][None, :], (8, Wd // 2))
        rec_u = jax.lax.dynamic_update_slice(
            rec_u, cpred.astype(rec_u.dtype), (cy0, 0))
        cpredv = jnp.broadcast_to(rec_v[cy0 - 1][None, :], (8, Wd // 2))
        rec_v = jax.lax.dynamic_update_slice(
            rec_v, cpredv.astype(rec_v.dtype), (cy0, 0))
        carry = (rec_y, rec_u, rec_v, lv_y, lv_u, lv_v) + tuple(carry[6:])
    else:
        strip_skip = jnp.zeros((nsc,), jnp.int32)
    # in-loop deblocking on the completed recon (spec placement: the
    # wavefront's in-frame intra prediction used the unfiltered planes;
    # the filtered frame is the display output and inter reference)
    if deblock:
        from av1tpu.specav1 import loopfilter as _LF
        fy, fu, fv = _LF.deblock_frame(carry[0], carry[1], carry[2],
                                       lf_y, lf_uv, lf_uv, bit_depth,
                                       th, tw,
                                       split=carry[10] if split16
                                       else None,
                                       strip=strip)
    else:
        fy, fu, fv = carry[0:3]
    pre_cdef_y = fy  # post-deblock: LR stripe-boundary source
    if cdef:
        # in-loop CDEF after deblock (spec 7.15); frame strengths are
        # searched on-device, returned for the host's cdef_params
        from av1tpu.specav1 import jax_cdef
        from av1tpu.specav1.jax_inter import build_skip8
        skip8 = build_skip8(carry[8], strip_skip, th, tw, Wd,
                            split=carry[10] if split16 else None,
                            skip16=carry[14] if split16 else None)
        fy, fu, fv, cdefs = jax_cdef.cdef_search_apply(
            fy, fu, fv, y, u, v, skip8, cdef_damping,
            bit_depth=bit_depth, th=th, tw=tw)
    else:
        cdefs = jnp.zeros((4,), jnp.int32)
    if lr:
        # in-loop Wiener loop restoration after CDEF (spec 7.17)
        from av1tpu.specav1 import jax_lr
        fy, lr_choice, lr_taps = jax_lr.lr_search_apply(
            fy, pre_cdef_y, y, bit_depth=bit_depth,
            th=th or fy.shape[0], tw=tw or fy.shape[1])
    else:
        from av1tpu.specav1 import lr as _NL
        nru = (_NL.count_units_in_frame(256, th or fy.shape[0]) *
               _NL.count_units_in_frame(256, tw or fy.shape[1]))
        lr_choice = jnp.full((nru,), -1, jnp.int32)
        lr_taps = jnp.zeros((nru, 6), jnp.int32)
    return (fy, fu, fv) + tuple(carry[3:]) + (strip_skip, cdefs,
                                              lr_choice, lr_taps)


def encode_keyframe_device(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                           qindex: int, bit_depth: int = 8):
    """Full spec keyframe: device compute + native entropy.

    Returns (tu_bytes, (rec_y, rec_u, rec_v)) cropped to source dims.
    """
    h, w = y.shape
    ph, pw = (h + 63) & ~63, (w + 63) & ~63
    if (ph, pw) != (h, w):
        y = np.pad(y, ((0, ph - h), (0, pw - w)), mode="edge")
        u = np.pad(u, ((0, (ph - h) // 2), (0, (pw - w) // 2)), mode="edge")
        v = np.pad(v, ((0, (ph - h) // 2), (0, (pw - w) // 2)), mode="edge")
    nbr, nbc = ph // 32, pw // 32
    out = _encode_frame(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                        jnp.int32(qindex), nbr=nbr, nbc=nbc,
                        bit_depth=bit_depth)
    (rec_y, rec_u, rec_v, lv_y, lv_u, lv_v, g_mode, g_uv, g_skip,
     g_angle, g_split, g_m16, g_uv16, g_a16,
     g_s16) = jax.device_get(out[0:15])
    tile = native.encode_intra32_tile(qindex, pw // 4, ph // 4, g_mode,
                                      g_uv, g_skip, lv_y, lv_u, lv_v,
                                      angles=g_angle,
                                      split5=(g_split, g_m16, g_uv16,
                                              g_a16, g_s16))
    tu = W.assemble_keyframe(pw, ph, qindex, tile,
                             render_size=(w, h) if (ph, pw) != (h, w)
                             else None)
    return tu, (rec_y[:h, :w], rec_u[:h // 2, :w // 2],
                rec_v[:h // 2, :w // 2])
