"""Spec-AV1 intra keyframe encoder (host reference implementation).

Produces temporal units the independent libaom decoder accepts, using
the proven writer/recon layers.  Structure:

  * fixed 32x32 block grid (TX_32X32 luma / TX_16X16 chroma — the
    DCT-only sizes, so no tx_type symbols are needed);
  * raster block order; prediction from the spec recon frame;
  * mode decision over DC/V/H/SMOOTH/PAETH + the diagonal modes by SSE
    of the spec predictors;
  * float forward DCT scaled to the integer inverse's gain, rounded to
    levels with a deadzone; recon via the spec-exact inverse so the
    encoder and any conformant decoder agree bit-for-bit.

The TPU engine lifts the hot parts (prediction/FDCT/quant as batched
matmuls) into jitted kernels; this module is the normative reference
the kernels are tested against, and the host fallback.
"""

from __future__ import annotations

import math

import numpy as np

from av1tpu.specav1 import recon
from av1tpu.specav1 import tile as T
from av1tpu.specav1 import writer as W
from av1tpu.specav1.cdfs import FrameContext

_MODES = (T.DC_PRED, T.V_PRED, T.H_PRED, T.SMOOTH_PRED, T.PAETH_PRED,
          T.D45_PRED, T.D135_PRED, T.D203_PRED, T.D67_PRED)


def _ortho_dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    m = np.cos((2 * j + 1) * k * math.pi / (2 * n)) * math.sqrt(2.0 / n)
    m[0] *= 1.0 / math.sqrt(2)
    return m


_DCT = {n: _ortho_dct_matrix(n) for n in (4, 8, 16, 32, 64)}

# inverse integer-transform gain: g(N) = sqrt(N/2) * sqrt(2) = sqrt(N)/sqrt(2)
_ROW_SHIFT = recon._ROW_SHIFT


def _fwd_scale(w: int, h: int) -> float:
    gw = math.sqrt(w) / math.sqrt(2)
    gh = math.sqrt(h) / math.sqrt(2)
    rs = _ROW_SHIFT[(w.bit_length() - 1, h.bit_length() - 1)]
    scale = (1 << (rs + 4)) / (gw * gh)
    if ((w.bit_length() + h.bit_length()) & 1) == 1:
        scale *= math.sqrt(2)
    return scale


def fdct2d(res: np.ndarray) -> np.ndarray:
    """Forward 2D DCT matched to the spec integer inverse's scaling."""
    h, w = res.shape
    out = _DCT[h] @ res.astype(np.float64) @ _DCT[w].T
    return out * _fwd_scale(w, h)


def quantize(coeffs: np.ndarray, qindex: int, bit_depth: int,
             deadzone: float = 0.62) -> np.ndarray:
    h, w = coeffs.shape
    dcq = int(recon.DC_Q[bit_depth][qindex])
    acq = int(recon.AC_Q[bit_depth][qindex])
    shift = 0
    if max(w, h) == 32:
        shift = 1
    elif max(w, h) == 64:
        shift = 2
    # spec dequant is (level * q) >> shift, so the effective step is
    # q / 2^shift for the 32/64-point transforms
    dqv = np.full((h, w), acq / (1 << shift), np.float64)
    dqv[0, 0] = dcq / (1 << shift)
    mag = np.abs(coeffs) / dqv + (1.0 - deadzone)
    lv = np.floor(mag).astype(np.int64)
    lv = np.minimum(lv, 32767)
    return np.where(coeffs < 0, -lv, lv)


class KeyFrameEncoder:
    """Encodes one spec-AV1 key frame from 8-bit I420 planes."""

    BLOCK = 32          # luma block/tx size
    BSIZE = T.BLOCK_32X32

    def __init__(self, qindex: int):
        self.qindex = qindex

    def encode(self, y: np.ndarray, u: np.ndarray, v: np.ndarray,
               render_size: tuple | None = None):
        """Returns (tu_bytes, recon_planes)."""
        qidx = self.qindex
        h, w = y.shape
        assert h % 64 == 0 and w % 64 == 0, "pad to SB size first"
        self.render_size = render_size
        mi_cols, mi_rows = w // 4, h // 4
        fc = FrameContext(qidx)
        tw = W.TileWriter(fc, mi_cols, mi_rows, qidx)
        self.decoded = np.zeros((mi_rows, mi_cols), bool)
        self.mi_rows, self.mi_cols = mi_rows, mi_cols
        # per-block records (the native tile writer's input format;
        # also what the TPU encoder produces directly)
        gh, gw = mi_rows // 8, mi_cols // 8
        self.grid_y_mode = np.zeros((gh, gw), np.int32)
        self.grid_uv_mode = np.zeros((gh, gw), np.int32)
        self.grid_skip = np.zeros((gh, gw), np.int32)
        self.levels_y = np.zeros((h, w), np.int32)
        self.levels_u = np.zeros((h // 2, w // 2), np.int32)
        self.levels_v = np.zeros((h // 2, w // 2), np.int32)
        rec = [np.zeros((h, w), np.int32),
               np.zeros((h // 2, w // 2), np.int32),
               np.zeros((h // 2, w // 2), np.int32)]
        src = [y.astype(np.int32), u.astype(np.int32), v.astype(np.int32)]
        B = self.BLOCK
        for sb_r in range(0, mi_rows, 16):
            tw.start_sb_row(sb_r)
            for sb_c in range(0, mi_cols, 16):
                tw.partition(sb_r, sb_c, T.BLOCK_64X64, T.PARTITION_SPLIT)
                # z-order children (spec SPLIT recursion order)
                for br, bc in ((sb_r, sb_c), (sb_r, sb_c + 8),
                               (sb_r + 8, sb_c), (sb_r + 8, sb_c + 8)):
                    if br < mi_rows and bc < mi_cols:
                        self._block(tw, src, rec, br, bc)
        tile = tw.finish()
        self.tile_bytes = tile
        tu = W.assemble_keyframe(w, h, qidx, tile,
                                 render_size=self.render_size)
        return tu, rec

    def _avail(self, r4, c4s, c4e=None, rows=False):
        """Spec haveAboveRight/BelowLeft: the cells decoded?"""
        if rows:
            return bool(self.decoded[c4s:c4e, r4].all())
        return bool(self.decoded[r4, c4s:c4e].all())

    def _edges(self, br, bc, w4, h4):
        """(n_top_right, n_bottom_left) in luma pixels for a block."""
        ntr = nbl = 0
        if br > 0:
            c4, c4e = bc + w4, min(bc + 2 * w4, self.mi_cols)
            if c4 < self.mi_cols and self._avail(br - 1, c4, c4e):
                ntr = w4 * 4
        if bc > 0:
            r4, r4e = br + h4, min(br + 2 * h4, self.mi_rows)
            if r4 < self.mi_rows and self._avail(bc - 1, r4, r4e,
                                                 rows=True):
                nbl = h4 * 4
        return ntr, nbl

    # -----------------------------------------------------------------
    def _block(self, tw, src, rec, br, bc):
        qidx = self.qindex
        B = self.BLOCK
        x0, y0 = bc * 4, br * 4
        sy = src[0][y0:y0 + B, x0:x0 + B]
        have_l = x0 > 0
        have_a = y0 > 0
        ntr, nbl = self._edges(br, bc, B // 4, B // 4)
        # luma mode decision on spec predictors
        best = None
        for mode in _MODES:
            if mode in (T.V_PRED, T.H_PRED, T.D45_PRED, T.D135_PRED,
                        T.D203_PRED, T.D67_PRED):
                if not (have_a or have_l):
                    continue
            pred = recon.predict_intra(rec[0], x0, y0, B, B, mode, 0,
                                       8, have_l, have_a, ntr, nbl)
            sse = int(((sy - pred) ** 2).sum())
            if best is None or sse < best[0]:
                best = (sse, mode, pred)
        _, mode, pred = best
        # chroma: DC always (v1)
        uv_mode = T.DC_PRED
        cx, cy = x0 // 2, y0 // 2
        CB = B // 2
        upreds = []
        for p in (1, 2):
            upreds.append(recon.predict_intra(
                rec[p], cx, cy, CB, CB, T.DC_PRED, 0, 8,
                cx > 0, cy > 0, ntr // 2 if ntr else 0,
                nbl // 2 if nbl else 0))
        # transform + quant
        levels_y = quantize(fdct2d(sy - pred), qidx, 8)
        lv_uv = []
        for i, p in enumerate((1, 2)):
            su = src[p][cy:cy + CB, cx:cx + CB]
            lv_uv.append(quantize(fdct2d(su - upreds[i]), qidx, 8))
        skip = int(not levels_y.any() and not lv_uv[0].any()
                   and not lv_uv[1].any())
        gr, gc = br // 8, bc // 8
        self.grid_y_mode[gr, gc] = mode
        self.grid_uv_mode[gr, gc] = uv_mode
        self.grid_skip[gr, gc] = skip
        self.levels_y[y0:y0 + B, x0:x0 + B] = levels_y
        self.levels_u[cy:cy + CB, cx:cx + CB] = lv_uv[0]
        self.levels_v[cy:cy + CB, cx:cx + CB] = lv_uv[1]
        # emit
        tw.partition(br, bc, self.BSIZE, T.PARTITION_NONE)
        tw.block_intra(br, bc, self.BSIZE, skip, mode, uv_mode)
        tx_y = T.TX_32X32
        tx_uv = T.TX_16X16
        if not skip:
            tw.coeffs(0, x0, y0, tx_y, levels_y, intra_dir=mode)
            tw.coeffs(1, cx, cy, tx_uv, lv_uv[0])
            tw.coeffs(2, cx, cy, tx_uv, lv_uv[1])
        tw.update_partition_ctx(br, bc, self.BSIZE)
        # spec recon
        dqy = recon.dequant_coeffs(levels_y, qidx, 0, 0, 8, B, B)
        rec[0][y0:y0 + B, x0:x0 + B] = recon.inv_txfm_add(
            dqy, recon.DCT_DCT, pred, 8)
        for i, p in enumerate((1, 2)):
            dq = recon.dequant_coeffs(lv_uv[i], qidx, 0, 0, 8, CB, CB)
            rec[p][cy:cy + CB, cx:cx + CB] = recon.inv_txfm_add(
                dq, recon.DCT_DCT, upreds[i], 8)
        self.decoded[br:br + B // 4, bc:bc + B // 4] = True


def encode_keyframe(y, u, v, qindex: int):
    """Pad to 64, encode (render_size signals the true display dims),
    return (tu, recon (y,u,v) cropped)."""
    h, w = y.shape
    ph = (h + 63) & ~63
    pw = (w + 63) & ~63
    if (ph, pw) != (h, w):
        y = np.pad(y, ((0, ph - h), (0, pw - w)), mode="edge")
        u = np.pad(u, ((0, (ph - h) // 2), (0, (pw - w) // 2)),
                   mode="edge")
        v = np.pad(v, ((0, (ph - h) // 2), (0, (pw - w) // 2)),
                   mode="edge")
    enc = KeyFrameEncoder(qindex)
    tu, rec = enc.encode(y, u, v, render_size=(w, h))
    return tu, (rec[0][:h, :w], rec[1][:h // 2, :w // 2],
                rec[2][:h // 2, :w // 2])
