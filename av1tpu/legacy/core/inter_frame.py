"""Inter (P) frame encoding: motion search + dense residual coding.

Unlike intra, inter prediction references the *previous reconstructed
frame*, so every block is independent — the whole frame encodes as one
batched pass with no wavefront: search → MC gather → transform →
quantize → reconstruct, in a single jit (SURVEY.md §3.2: this is the hot
inner loop the exec'd ffmpeg used to own).

The decoder-side function reuses the identical normative ops (MC gather,
dequant, exact inverse transform, clip), so encoder recon == decoder
recon bit-exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from av1tpu.encoder import quant
from av1tpu.encoder.kernels import cdef, deblock, mc, motion, restoration
from av1tpu.encoder.kernels import transforms as tx


def _to_blocks(plane: jnp.ndarray, n: int) -> jnp.ndarray:
    hp, wp = plane.shape
    rows, cols = hp // n, wp // n
    return (plane.reshape(rows, n, cols, n).transpose(0, 2, 1, 3)
            .reshape(rows * cols, n, n))


def _from_blocks(blocks: jnp.ndarray, hp: int, wp: int, n: int) -> jnp.ndarray:
    rows, cols = hp // n, wp // n
    return (blocks.reshape(rows, cols, n, n).transpose(0, 2, 1, 3)
            .reshape(hp, wp))


def per_tile(fn, plane, tiles: int):
    """Apply a (H,W)->(H,W) filter independently per horizontal stripe
    (loop filters do not cross tile-row boundaries; matches the sharded
    encoder's per-device filtering)."""
    if tiles <= 1:
        return fn(plane)
    h, w = plane.shape
    st = plane.reshape(tiles, h // tiles, w)
    return jax.vmap(fn)(st).reshape(h, w)


def _code_plane(src_blocks, pred, dc_step, ac_step, maxval: int = 255):
    """residual → levels + recon blocks (encoder side)."""
    res = src_blocks.astype(jnp.int32) - pred
    coeffs = tx.fwd_txfm(res)
    lv = quant.quantize_block(coeffs, dc_step, ac_step)
    dq = quant.dequantize_block(lv, dc_step, ac_step)
    resr = tx.inv_txfm(dq)
    rec = jnp.clip(pred + resr, 0, maxval)
    return lv, rec


def _recon_plane(levels, pred, dc_step, ac_step, maxval: int = 255):
    """levels → recon blocks (normative, shared with decoder)."""
    dq = quant.dequantize_block(levels, dc_step, ac_step)
    resr = tx.inv_txfm(dq)
    return jnp.clip(pred + resr, 0, maxval)


# signaled transform alphabet for inter luma (syntax symbol order)
TX_ALPHABET = (tx.DCT_DCT, tx.ADST_ADST, tx.IDTX)


def _code_plane_txsel(src_blocks, pred, dc_step, ac_step, maxval,
                      lam):
    """Luma residual coding with per-block transform selection.

    Each block is coded with every transform in TX_ALPHABET; the
    winner minimizes SSD + lam·(Σ|level| + 2·nnz) — the level sum is
    the rate proxy (≈ bits the range coder spends).  Returns
    (levels, recon_blocks, tx_syms uint8) — tx_syms indexes
    TX_ALPHABET and is coded per non-skip block.
    """
    res = src_blocks.astype(jnp.int32) - pred
    lvs, recs, costs = [], [], []
    for t in TX_ALPHABET:
        coeffs = tx.fwd_txfm(res, t)
        lv = quant.quantize_block(coeffs, dc_step, ac_step)
        dq = quant.dequantize_block(lv, dc_step, ac_step)
        rec = jnp.clip(pred + tx.inv_txfm(dq, t), 0, maxval)
        ssd = jnp.sum((rec - src_blocks.astype(jnp.int32)).astype(
            jnp.float32) ** 2, axis=(1, 2))
        alv = jnp.abs(lv)
        rate = (alv.sum(axis=(1, 2))
                + 2 * (alv != 0).sum(axis=(1, 2))).astype(jnp.float32)
        lvs.append(lv)
        recs.append(rec)
        costs.append(ssd + lam * rate)
    cost = jnp.stack(costs)                       # (T, B)
    sel = jnp.argmin(cost, axis=0)                # (B,)
    lv = jnp.take_along_axis(jnp.stack(lvs), sel[None, :, None, None],
                             axis=0)[0]
    rec = jnp.take_along_axis(jnp.stack(recs), sel[None, :, None, None],
                              axis=0)[0]
    return lv, rec, sel.astype(jnp.uint8)


def _recon_plane_txsel(levels, pred, dc_step, ac_step, maxval, tx_syms):
    """Decoder-side luma recon with signaled per-block transforms
    (normative; evaluates every inverse and selects — branch-free)."""
    dq = quant.dequantize_block(levels, dc_step, ac_step)
    recs = [jnp.clip(pred + tx.inv_txfm(dq, t), 0, maxval)
            for t in TX_ALPHABET]
    return jnp.take_along_axis(
        jnp.stack(recs), tx_syms.astype(jnp.int32)[None, :, None, None],
        axis=0)[0]


def tx_lambda(ac_step):
    """Rate-distortion multiplier for transform selection (SSD per
    level-sum unit): proportional to the squared quantizer step."""
    return (ac_step * ac_step).astype(jnp.float32) / 24.0 \
        if hasattr(ac_step, "astype") else float(ac_step) ** 2 / 24.0


@functools.partial(jax.jit, static_argnames=("block",))
def encode_inter_frame(y, u, v, ref_y_pad, ref_u_pad, ref_v_pad,
                       dc_step, ac_step, block: int):
    """Encode one P frame.  All planes padded to block multiples.

    Returns (mvs (B,2), levels_y, levels_u, levels_v, recon_y, recon_u,
    recon_v) — levels flattened (B, n*n) raster order.
    """
    n = block
    cn = n // 2
    hp, wp = y.shape

    mvs = motion.tss_search(y, ref_y_pad, n)
    pos_y = jnp.asarray(motion.block_positions(hp, wp, n))
    pred_y = motion.gather_blocks(ref_y_pad, pos_y, mvs, n)
    lv_y, rec_y = _code_plane(_to_blocks(y, n), pred_y, dc_step, ac_step)

    cmv = motion.chroma_mv(mvs)
    hc, wc = u.shape
    pos_c = jnp.asarray(motion.block_positions(hc, wc, cn))
    pred_u = motion.gather_blocks(ref_u_pad, pos_c, cmv, cn,
                                  pad=motion.CHROMA_PAD)
    pred_v = motion.gather_blocks(ref_v_pad, pos_c, cmv, cn,
                                  pad=motion.CHROMA_PAD)
    lv_u, rec_u = _code_plane(_to_blocks(u, cn), pred_u, dc_step, ac_step)
    lv_v, rec_v = _code_plane(_to_blocks(v, cn), pred_v, dc_step, ac_step)

    return (mvs,
            lv_y.reshape(lv_y.shape[0], -1),
            lv_u.reshape(lv_u.shape[0], -1),
            lv_v.reshape(lv_v.shape[0], -1),
            _from_blocks(rec_y, hp, wp, n),
            _from_blocks(rec_u, hc, wc, cn),
            _from_blocks(rec_v, hc, wc, cn))


@functools.partial(jax.jit, static_argnames=("block", "hp", "wp"))
def decode_inter_frame(mvs, lv_y, lv_u, lv_v, ref_y_pad, ref_u_pad,
                       ref_v_pad, dc_step, ac_step, hp: int, wp: int,
                       block: int):
    """Decoder-side P-frame reconstruction (bit-identical to encoder)."""
    n = block
    cn = n // 2
    hc, wc = hp // 2, wp // 2
    pos_y = jnp.asarray(motion.block_positions(hp, wp, n))
    pred_y = motion.gather_blocks(ref_y_pad, pos_y, mvs, n)
    rec_y = _recon_plane(lv_y.reshape(-1, n, n), pred_y, dc_step, ac_step)

    cmv = motion.chroma_mv(mvs)
    pos_c = jnp.asarray(motion.block_positions(hc, wc, cn))
    pred_u = motion.gather_blocks(ref_u_pad, pos_c, cmv, cn,
                                  pad=motion.CHROMA_PAD)
    pred_v = motion.gather_blocks(ref_v_pad, pos_c, cmv, cn,
                                  pad=motion.CHROMA_PAD)
    rec_u = _recon_plane(lv_u.reshape(-1, cn, cn), pred_u, dc_step, ac_step)
    rec_v = _recon_plane(lv_v.reshape(-1, cn, cn), pred_v, dc_step, ac_step)

    return (_from_blocks(rec_y, hp, wp, n),
            _from_blocks(rec_u, hc, wc, cn),
            _from_blocks(rec_v, hc, wc, cn))


def _inter_core_v2(y_u8, u_u8, v_u8, ref_y_u8, ref_u_u8, ref_v_u8,
                   dc_step, ac_step, qindex, block: int,
                   bit_depth: int = 8, tile_rows: int = 1,
                   use_subpel: bool = True,
                   use_aux_filters: bool = True,
                   ref2_y_u8=None, ref2_u_u8=None, ref2_v_u8=None,
                   use_two_refs: bool = False,
                   use_tx_select: bool = True):
    """Unjitted P-frame encode body — called by both the single-frame
    jit wrapper and the lax.scan chunk encoder.

    With ``use_two_refs`` the block alternates between the previous
    recon (ref 0, "last") and the GOP keyframe recon (ref 1, "golden"):
    both references are searched densely and each block takes golden
    only when its prediction SAD beats last by >1/16 (recency bias) —
    the occlusion/reveal case where the background exists in the
    keyframe but not the previous frame."""
    n = block
    cn = n // 2
    maxval = (1 << bit_depth) - 1
    y = y_u8.astype(jnp.int32)
    u = u_u8.astype(jnp.int32)
    v = v_u8.astype(jnp.int32)
    hp, wp = y.shape
    hc, wc = u.shape

    def pad_y(p):
        return jnp.pad(p.astype(jnp.int32),
                       ((motion.PAD, motion.PAD),) * 2, mode="edge")

    def pad_c(p):
        return jnp.pad(p.astype(jnp.int32),
                       ((motion.CHROMA_PAD, motion.CHROMA_PAD),) * 2,
                       mode="edge")

    ref_y_pad = pad_y(ref_y_u8)
    ref_u_pad = pad_c(ref_u_u8)
    ref_v_pad = pad_c(ref_v_u8)

    pos_y = jnp.asarray(motion.block_positions(hp, wp, n))
    y_blocks = _to_blocks(y, n)

    def search_one(ref_pad):
        mv_full = motion.search_v3(y, ref_pad, n)
        if use_subpel:
            mv = motion.subpel_refine(y_blocks, ref_pad, pos_y, mv_full,
                                      n, maxval=maxval)
        else:
            mv = mv_full * 4
        pred = mc.predict_subpel_luma(ref_pad, pos_y, mv, n, motion.PAD,
                                      maxval)
        return mv, pred

    mvs, pred_y = search_one(ref_y_pad)
    if use_two_refs:
        ref2_y_pad = pad_y(ref2_y_u8)
        ref2_u_pad = pad_c(ref2_u_u8)
        ref2_v_pad = pad_c(ref2_v_u8)
        mv2, pred2_y = search_one(ref2_y_pad)
        sad1 = jnp.abs(y_blocks - pred_y).sum(axis=(1, 2))
        sad2 = jnp.abs(y_blocks - pred2_y).sum(axis=(1, 2))
        refs = sad2 + sad2 // 16 < sad1              # (B,) bool
        mvs = jnp.where(refs[:, None], mv2, mvs)
        pred_y = jnp.where(refs[:, None, None], pred2_y, pred_y)
    else:
        refs = jnp.zeros((y_blocks.shape[0],), bool)
    if use_tx_select:
        lv_y, rec_y, tx_syms = _code_plane_txsel(y_blocks, pred_y,
                                                 dc_step, ac_step,
                                                 maxval,
                                                 tx_lambda(ac_step))
    else:  # DCT only: the per-block tx symbol is still coded (as 0)
        lv_y, rec_y = _code_plane(y_blocks, pred_y, dc_step, ac_step,
                                  maxval)
        tx_syms = jnp.zeros((y_blocks.shape[0],), jnp.uint8)

    pos_c = jnp.asarray(motion.block_positions(hc, wc, cn))
    pred_u = mc.predict_subpel_chroma(ref_u_pad, pos_c, mvs, cn,
                                      motion.CHROMA_PAD, maxval)
    pred_v = mc.predict_subpel_chroma(ref_v_pad, pos_c, mvs, cn,
                                      motion.CHROMA_PAD, maxval)
    if use_two_refs:
        pred2_u = mc.predict_subpel_chroma(ref2_u_pad, pos_c, mvs, cn,
                                           motion.CHROMA_PAD, maxval)
        pred2_v = mc.predict_subpel_chroma(ref2_v_pad, pos_c, mvs, cn,
                                           motion.CHROMA_PAD, maxval)
        pred_u = jnp.where(refs[:, None, None], pred2_u, pred_u)
        pred_v = jnp.where(refs[:, None, None], pred2_v, pred_v)
    lv_u, rec_u = _code_plane(_to_blocks(u, cn), pred_u, dc_step, ac_step,
                              maxval)
    lv_v, rec_v = _code_plane(_to_blocks(v, cn), pred_v, dc_step, ac_step,
                              maxval)

    lv_y = lv_y.reshape(lv_y.shape[0], -1)
    lv_u = lv_u.reshape(lv_u.shape[0], -1)
    lv_v = lv_v.reshape(lv_v.shape[0], -1)
    skips = ((lv_y == 0).all(1) & (lv_u == 0).all(1) & (lv_v == 0).all(1))
    T = tile_rows
    out_y = per_tile(lambda p: deblock.deblock_plane(p, n, qindex,
                                                     bit_depth),
                     _from_blocks(rec_y, hp, wp, n), T)
    out_u = per_tile(lambda p: deblock.deblock_plane(p, cn, qindex,
                                                     bit_depth),
                     _from_blocks(rec_u, hc, wc, cn), T)
    out_v = per_tile(lambda p: deblock.deblock_plane(p, cn, qindex,
                                                     bit_depth),
                     _from_blocks(rec_v, hc, wc, cn), T)
    if use_aux_filters:
        cdef_y = per_tile(lambda p: cdef.cdef_plane(p, qindex, bit_depth),
                          out_y, T)
        cdef_u = per_tile(lambda p: cdef.cdef_plane(p, qindex, bit_depth,
                                                    is_chroma=True),
                          out_u, T)
        cdef_v = per_tile(lambda p: cdef.cdef_plane(p, qindex, bit_depth,
                                                    is_chroma=True),
                          out_v, T)
        cdef_on = cdef.cdef_gate(y, out_y, cdef_y)
        out_y = cdef.select(cdef_on, cdef_y, out_y)
        out_u = cdef.select(cdef_on, cdef_u, out_u)
        out_v = cdef.select(cdef_on, cdef_v, out_v)
        lr_mode = restoration.choose_mode(y, out_y, maxval, T)
        out_y = per_tile(lambda p: restoration.apply_restoration_dynamic(
            p, lr_mode, maxval), out_y, T)
        out_u = per_tile(lambda p: restoration.apply_restoration_dynamic(
            p, lr_mode, maxval), out_u, T)
        out_v = per_tile(lambda p: restoration.apply_restoration_dynamic(
            p, lr_mode, maxval), out_v, T)
    else:
        cdef_on = jnp.asarray(False)
        lr_mode = jnp.asarray(0, jnp.int32)
    out_dtype = jnp.uint8 if bit_depth == 8 else jnp.uint16
    lv_y16 = lv_y.astype(jnp.int16)
    lv_u16 = lv_u.astype(jnp.int16)
    lv_v16 = lv_v.astype(jnp.int16)
    sp_mask, sp_vals, sp_count = sparse_pack_levels(lv_y16, lv_u16, lv_v16)
    return (mvs.astype(jnp.int16),
            lv_y16, lv_u16, lv_v16, skips,
            out_y.astype(out_dtype), out_u.astype(out_dtype),
            out_v.astype(out_dtype), lr_mode, cdef_on,
            sp_mask, sp_vals, sp_count, refs.astype(jnp.uint8),
            tx_syms)


@functools.partial(jax.jit, static_argnames=("block", "bit_depth",
                                              "tile_rows", "use_subpel",
                                              "use_aux_filters",
                                              "use_two_refs",
                                              "use_tx_select"))
def encode_inter_frame_v2(y_u8, u_u8, v_u8, ref_y_u8, ref_u_u8, ref_v_u8,
                          dc_step, ac_step, qindex, block: int,
                          bit_depth: int = 8, tile_rows: int = 1,
                          use_subpel: bool = True,
                          use_aux_filters: bool = True,
                          ref2_y_u8=None, ref2_u_u8=None, ref2_v_u8=None,
                          use_two_refs: bool = False,
                          use_tx_select: bool = True):
    """Transfer-optimized P-frame encode: one jit, narrow I/O.

    Inputs are uint8 planes (source + previous recon, both unpadded);
    reference padding happens on device.  Returns (mvs int16 (B,2),
    levels int16 ×3, skips bool (B,), recon uint8 ×3, …, refs uint8) —
    recons are meant to stay device-resident as the next call's
    reference.
    """
    return _inter_core_v2(y_u8, u_u8, v_u8, ref_y_u8, ref_u_u8, ref_v_u8,
                          dc_step, ac_step, qindex, block, bit_depth,
                          tile_rows, use_subpel, use_aux_filters,
                          ref2_y_u8, ref2_u_u8, ref2_v_u8, use_two_refs,
                          use_tx_select)


@functools.partial(jax.jit, static_argnames=("block", "bit_depth",
                                              "tile_rows", "use_subpel",
                                              "use_aux_filters",
                                              "use_two_refs",
                                              "use_tx_select"))
def encode_inter_chunk_v2(ys_u8, us_u8, vs_u8, ref_y_u8, ref_u_u8,
                          ref_v_u8, dc_steps, ac_steps, qindexes,
                          block: int, bit_depth: int = 8,
                          tile_rows: int = 1, use_subpel: bool = True,
                          use_aux_filters: bool = True,
                          ref2_y_u8=None, ref2_u_u8=None, ref2_v_u8=None,
                          use_two_refs: bool = False,
                          use_tx_select: bool = True):
    """Encode K consecutive P frames in ONE dispatch via ``lax.scan``.

    The recon of frame k is the reference of frame k+1 — the dependency
    chain lives entirely on device, so a K-frame chunk costs one host
    round-trip instead of K (the tunnel RTT, not TPU compute, dominates
    per-dispatch overhead; see engine_tpu).  ys/us/vs are (K, H, W)
    stacks; qindexes/dc_steps/ac_steps are (K,) (the rate controller may
    retune between frames).  Returns the same tuple as
    encode_inter_frame_v2 with every leaf stacked along a leading K axis.
    """
    def step(carry, xs):
        ry, ru, rv = carry
        y, u, v, qi, dc, ac = xs
        # the golden ref (GOP keyframe) is scan-invariant: chunks never
        # span a keyframe, so it is closed over, not carried
        out = _inter_core_v2(y, u, v, ry, ru, rv, dc, ac, qi,
                             block, bit_depth, tile_rows, use_subpel,
                             use_aux_filters, ref2_y_u8, ref2_u_u8,
                             ref2_v_u8, use_two_refs, use_tx_select)
        return (out[5], out[6], out[7]), out

    _final, outs = jax.lax.scan(
        step, (ref_y_u8, ref_u_u8, ref_v_u8),
        (ys_u8, us_u8, vs_u8, qindexes, dc_steps, ac_steps))
    return outs


@functools.partial(jax.jit, static_argnames=("block", "hp", "wp",
                                              "bit_depth", "tile_rows",
                                              "use_two_refs"))
def decode_inter_frame_v2(mvs, lv_y, lv_u, lv_v, ref_y_pad, ref_u_pad,
                          ref_v_pad, dc_step, ac_step, qindex, lr_mode,
                          cdef_on, hp: int, wp: int, block: int,
                          bit_depth: int = 8, tile_rows: int = 1,
                          refs=None, ref2_y_pad=None, ref2_u_pad=None,
                          ref2_v_pad=None, use_two_refs: bool = False,
                          tx_syms=None):
    """Decoder-side subpel P-frame reconstruction (matches
    encode_inter_frame_v2 bit-exactly).  mvs in q4 luma units; refs
    (B,) selects last (0) vs golden (1) when the frame header signals
    two_ref; tx_syms (B,) indexes TX_ALPHABET for the luma transform
    (None → all DCT)."""
    n = block
    cn = n // 2
    maxval = (1 << bit_depth) - 1
    hc, wc = hp // 2, wp // 2
    if tx_syms is None:
        tx_syms = jnp.zeros((lv_y.shape[0],), jnp.uint8)
    mvs = mvs.astype(jnp.int32)
    pos_y = jnp.asarray(motion.block_positions(hp, wp, n))
    pred_y = mc.predict_subpel_luma(ref_y_pad, pos_y, mvs, n, motion.PAD,
                                    maxval)
    if use_two_refs:
        sel = refs.astype(bool)
        pred_y = jnp.where(sel[:, None, None], mc.predict_subpel_luma(
            ref2_y_pad, pos_y, mvs, n, motion.PAD, maxval), pred_y)
    rec_y = _recon_plane_txsel(lv_y.reshape(-1, n, n), pred_y, dc_step,
                               ac_step, maxval, tx_syms)

    pos_c = jnp.asarray(motion.block_positions(hc, wc, cn))
    pred_u = mc.predict_subpel_chroma(ref_u_pad, pos_c, mvs, cn,
                                      motion.CHROMA_PAD, maxval)
    pred_v = mc.predict_subpel_chroma(ref_v_pad, pos_c, mvs, cn,
                                      motion.CHROMA_PAD, maxval)
    if use_two_refs:
        pred_u = jnp.where(sel[:, None, None], mc.predict_subpel_chroma(
            ref2_u_pad, pos_c, mvs, cn, motion.CHROMA_PAD, maxval), pred_u)
        pred_v = jnp.where(sel[:, None, None], mc.predict_subpel_chroma(
            ref2_v_pad, pos_c, mvs, cn, motion.CHROMA_PAD, maxval), pred_v)
    rec_u = _recon_plane(lv_u.reshape(-1, cn, cn), pred_u, dc_step, ac_step,
                         maxval)
    rec_v = _recon_plane(lv_v.reshape(-1, cn, cn), pred_v, dc_step, ac_step,
                         maxval)

    T = tile_rows
    out_y = per_tile(lambda p: deblock.deblock_plane(p, n, qindex,
                                                     bit_depth),
                     _from_blocks(rec_y, hp, wp, n), T)
    out_u = per_tile(lambda p: deblock.deblock_plane(p, cn, qindex,
                                                     bit_depth),
                     _from_blocks(rec_u, hc, wc, cn), T)
    out_v = per_tile(lambda p: deblock.deblock_plane(p, cn, qindex,
                                                     bit_depth),
                     _from_blocks(rec_v, hc, wc, cn), T)
    out_y = cdef.select(cdef_on, per_tile(
        lambda p: cdef.cdef_plane(p, qindex, bit_depth), out_y, T), out_y)
    out_u = cdef.select(cdef_on, per_tile(
        lambda p: cdef.cdef_plane(p, qindex, bit_depth, is_chroma=True),
        out_u, T), out_u)
    out_v = cdef.select(cdef_on, per_tile(
        lambda p: cdef.cdef_plane(p, qindex, bit_depth, is_chroma=True),
        out_v, T), out_v)
    out_y = per_tile(lambda p: restoration.apply_restoration_dynamic(
        p, lr_mode, maxval), out_y, T)
    out_u = per_tile(lambda p: restoration.apply_restoration_dynamic(
        p, lr_mode, maxval), out_u, T)
    out_v = per_tile(lambda p: restoration.apply_restoration_dynamic(
        p, lr_mode, maxval), out_v, T)
    return out_y, out_u, out_v


SPARSE_CAP_FRACTION = 16  # capacity = total_coeffs / 16


def sparse_pack_levels(lv_y, lv_u, lv_v):
    """Compact the (mostly zero) level arrays for cheap host transfer.

    Returns (mask_packed uint8, vals int16[cap], count int32) over the
    concatenated y|u|v coefficient vector.  The caller must fall back to
    materializing the full arrays when count > cap (rare: cap is ~6% of
    coefficients; typical frames code 1-3%).
    """
    flat = jnp.concatenate([lv_y.reshape(-1), lv_u.reshape(-1),
                            lv_v.reshape(-1)])
    n = flat.shape[0]
    cap = n // SPARSE_CAP_FRACTION
    mask = flat != 0
    idx = jnp.cumsum(mask.astype(jnp.int32)) - 1
    vals = jnp.zeros((cap,), jnp.int16)
    vals = vals.at[jnp.where(mask, idx, cap)].set(flat, mode="drop")
    count = mask.sum().astype(jnp.int32)
    return jnp.packbits(mask), vals, count


def sparse_unpack_levels(mask_packed, vals, count, shapes):
    """Host-side inverse of sparse_pack_levels (numpy).

    shapes: [(B, ny), (B, nc), (B, nc)] for y/u/v.  Returns the three
    int16 arrays, or None if count exceeded the capacity (caller falls
    back to the full arrays)."""
    total = sum(b * n for b, n in shapes)
    cap = total // SPARSE_CAP_FRACTION
    count = int(count)
    if count > cap:
        return None
    mask = np.unpackbits(np.asarray(mask_packed))[:total].astype(bool)
    flat = np.zeros(total, np.int16)
    flat[mask] = np.asarray(vals)[:count]
    out = []
    off = 0
    for b, n in shapes:
        out.append(flat[off:off + b * n].reshape(b, n))
        off += b * n
    return out
