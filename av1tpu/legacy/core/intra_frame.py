"""Intra (key) frame encoding: dense mode decision + wavefront commit.

TPU-first structure (SURVEY.md §7 hard parts #2/#3):

* **Mode decision** — fully parallel over all blocks, using *source*
  neighbors as a stand-in for reconstructed ones (exact at commit time for
  the winning mode's neighbors up to quantization error).  All modes are
  evaluated densely and argmin'd — no branches.

* **Commit pass** — the reconstruction dependency (intra predicts from
  reconstructed neighbors) is a wavefront over block anti-diagonals:
  blocks on diagonal d depend only on diagonals < d, so each step runs a
  whole diagonal as one batched gather→predict→transform→quantize→
  reconstruct→scatter, inside a single ``lax.fori_loop``.  Used by both
  the encoder and the decoder (bit-identical recon by construction).

Both functions are shape-static and jit-cached per (frame size, block
size).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from av1tpu.encoder import quant
from av1tpu.encoder.kernels import cdef, deblock, intra, restoration
from av1tpu.encoder.kernels import transforms as tx

BORDER = 128  # normative out-of-frame neighbor value at 8-bit


def _border(bit_depth: int) -> int:
    return 1 << (bit_depth - 1)


def _maxval(bit_depth: int) -> int:
    return (1 << bit_depth) - 1


@functools.lru_cache(maxsize=None)
def wavefront_plan(rows: int, cols: int) -> tuple[np.ndarray, np.ndarray,
                                                  np.ndarray]:
    """Knight's-move wavefront schedule: (diag_r, diag_c, mask), each (D, L).

    Diagonal index d = 2r + c, so every dependency of the directional
    predictors precedes its consumer: left (r, c-1) → d-1, above
    (r-1, c) → d-2, above-left (r-1, c-1) → d-3 and, crucially for
    D45/D67, above-right (r-1, c+1) → d-1.  A plain anti-diagonal
    (d = r + c) would put above-right on the SAME step.
    """
    n_diag = 2 * (rows - 1) + (cols - 1) + 1
    per_d = [[] for _ in range(n_diag)]
    for r in range(rows):
        for c in range(cols):
            per_d[2 * r + c].append((r, c))
    maxlen = max(len(p) for p in per_d)
    diag_r = np.zeros((n_diag, maxlen), np.int32)
    diag_c = np.zeros((n_diag, maxlen), np.int32)
    mask = np.zeros((n_diag, maxlen), bool)
    for d, blocks in enumerate(per_d):
        for k, (r, c) in enumerate(blocks):
            diag_r[d, k] = r
            diag_c[d, k] = c
            mask[d, k] = True
    return diag_r, diag_c, mask


def pad_plane(plane: np.ndarray, block: int) -> np.ndarray:
    """Edge-replicate pad to a multiple of ``block`` (normative crop later)."""
    h, w = plane.shape
    hp = -(-h // block) * block
    wp = -(-w // block) * block
    return np.pad(plane, ((0, hp - h), (0, wp - w)), mode="edge")


def decide_modes(src: jnp.ndarray, block: int,
                 bit_depth: int = 8) -> jnp.ndarray:
    """Dense all-mode SSE argmin using source neighbors.  src: (Hp, Wp)."""
    return jnp.argmin(_mode_sse(src, block, bit_depth),
                      axis=1).astype(jnp.int32)


def decide_uv_modes(u: jnp.ndarray, v: jnp.ndarray, block: int,
                    bit_depth: int = 8) -> jnp.ndarray:
    """Chroma mode decision: U and V share one mode per block (AV1
    uv_mode), chosen by the summed SSE over both planes."""
    sse = _mode_sse(u, block, bit_depth) + _mode_sse(v, block, bit_depth)
    return jnp.argmin(sse, axis=1).astype(jnp.int32)


def _mode_sse(src: jnp.ndarray, block: int,
              bit_depth: int = 8) -> jnp.ndarray:
    """Per-block per-mode prediction SSE using source neighbors:
    (B, n_modes) float-free int32."""
    hp, wp = src.shape
    rows, cols = hp // block, wp // block
    n = block
    ps = jnp.full((hp + 1, wp + 1 + n), _border(bit_depth), jnp.int32)
    ps = ps.at[1:, 1:wp + 1].set(src.astype(jnp.int32))
    # extended above row (2n wide) feeds D45/D67; out-of-frame tail
    # replicates the last in-frame sample (AV1-style edge extension)
    a_rows = ps[0:hp:n, 1:]                           # (rows, wp + n)
    above_ext = jnp.stack(
        [a_rows[:, c * n:c * n + 2 * n] for c in range(cols)],
        axis=1).reshape(-1, 2 * n)                    # (B, 2n)
    off = jnp.arange(2 * n)
    col0 = (jnp.tile(jnp.arange(cols), rows) * n)[:, None]
    above_ext = jnp.where(col0 + off[None] < wp, above_ext,
                          above_ext[:, n - 1:n])
    left = (ps[1:, 0:wp:n].reshape(rows, n, cols)
            .transpose(0, 2, 1).reshape(-1, n))
    corner = ps[0:hp:n, 0:wp:n].reshape(-1)
    blocks = (src.astype(jnp.int32).reshape(rows, n, cols, n)
              .transpose(0, 2, 1, 3).reshape(-1, n, n))
    preds = intra.predict_all_modes_v2(above_ext, left, corner, n)
    return jnp.sum((preds - blocks[:, None]) ** 2, axis=(2, 3))  # (B, M)


def _commit(src, levels_in, modes, dc_step, ac_step, block, *, decode,
            bit_depth: int = 8):
    """Shared wavefront commit.

    Encode (decode=False): src is the padded source plane; levels are
    computed (fwd transform + quantize) and returned.
    Decode (decode=True): levels_in (B, n*n) are given; src is ignored
    (pass zeros of the padded shape for shape inference).
    Returns (levels (B, n*n), recon (Hp, Wp)).
    """
    hp, wp = src.shape
    n = block
    rows, cols = hp // n, wp // n
    diag_r, diag_c, mask = wavefront_plan(rows, cols)
    n_diag, maxlen = diag_r.shape
    diag_r = jnp.asarray(diag_r)
    diag_c = jnp.asarray(diag_c)
    mask = jnp.asarray(mask)
    src_i = src.astype(jnp.int32)
    modes = modes.astype(jnp.int32)
    rn = jnp.arange(n)

    # +n columns on the right so the above-right gather for the last
    # block column stays in bounds (filled with the tail replication)
    recon = jnp.full((hp + 1, wp + 1 + n), _border(bit_depth), jnp.int32)
    levels_buf = (levels_in.astype(jnp.int32) if decode
                  else jnp.zeros((rows * cols, n * n), jnp.int32))
    ext_off = jnp.arange(2 * n)

    def gather_one(recon, ri, ci):
        above = jax.lax.dynamic_slice(recon, (ri * n, 1 + ci * n),
                                      (1, 2 * n))[0]
        # out-of-frame above-right samples replicate the last valid one
        above = jnp.where(ci * n + ext_off < wp, above, above[n - 1])
        leftv = jax.lax.dynamic_slice(recon, (1 + ri * n, ci * n), (n, 1))[:, 0]
        corner = jax.lax.dynamic_slice(recon, (ri * n, ci * n), (1, 1))[0, 0]
        return above, leftv, corner

    def body(d, carry):
        recon, levels_buf = carry
        r = diag_r[d]
        c = diag_c[d]
        m = mask[d]
        bi = r * cols + c                                   # (L,)
        above, leftv, corner = jax.vmap(
            lambda ri, ci: gather_one(recon, ri, ci))(r, c)
        mode = modes[bi]
        pred = intra.predict_mode_v2(above, leftv, corner, mode, n)

        if decode:
            lv = levels_buf[bi].reshape(-1, n, n)
        else:
            srcb = jax.vmap(lambda ri, ci: jax.lax.dynamic_slice(
                src_i, (ri * n, ci * n), (n, n)))(r, c)
            res = srcb - pred
            coeffs = tx.fwd_txfm(res)
            lv = quant.quantize_block(coeffs, dc_step, ac_step)
        dq = quant.dequantize_block(lv, dc_step, ac_step)
        resr = tx.inv_txfm(dq)
        rec = jnp.clip(pred + resr, 0, _maxval(bit_depth))

        # masked scatter: dead lanes pushed out of bounds and dropped
        rr = jnp.where(m, r, rows + 1)
        idx_r = (1 + rr * n)[:, None, None] + rn[None, :, None]
        idx_c = (1 + c * n)[:, None, None] + rn[None, None, :]
        recon = recon.at[idx_r, idx_c].set(rec, mode="drop")
        if not decode:
            bi_w = jnp.where(m, bi, rows * cols + 1)
            levels_buf = levels_buf.at[bi_w].set(
                lv.reshape(-1, n * n), mode="drop")
        return recon, levels_buf

    recon, levels_buf = jax.lax.fori_loop(0, n_diag, body,
                                          (recon, levels_buf))
    return levels_buf, recon[1:, 1:wp + 1]


@functools.partial(jax.jit, static_argnames=("block", "bit_depth"))
def encode_plane(src, modes, dc_step, ac_step, block: int,
                 bit_depth: int = 8):
    """Encode one padded plane: returns (levels (B, n*n), recon (Hp, Wp))."""
    dummy_levels = jnp.zeros((1, 1), jnp.int32)
    return _commit(src, dummy_levels, modes, dc_step, ac_step, block,
                   decode=False, bit_depth=bit_depth)


@functools.partial(jax.jit, static_argnames=("block", "hp", "wp",
                                              "bit_depth", "tile_rows"))
def decode_plane(levels, modes, dc_step, ac_step, hp: int, wp: int,
                 block: int, bit_depth: int = 8, tile_rows: int = 1):
    """Decoder-side commit: levels in, recon out (bit-identical to encode)."""
    if tile_rows <= 1:
        zeros = jnp.zeros((hp, wp), jnp.int32)
        _lv, recon = _commit(zeros, levels, modes, dc_step, ac_step, block,
                             decode=True, bit_depth=bit_depth)
        return recon
    T = tile_rows
    n = block
    bpt = (hp // n // T) * (wp // n)   # blocks per tile
    lv_t = levels.reshape(T, bpt, n * n)
    m_t = modes.reshape(T, bpt)
    zeros = jnp.zeros((hp // T, wp), jnp.int32)

    def one(lv, md):
        _l, rec = _commit(zeros, lv, md, dc_step, ac_step, block,
                          decode=True, bit_depth=bit_depth)
        return rec

    rec = jax.vmap(one)(lv_t, m_t)
    return rec.reshape(hp, wp)


def _commit_tiled(plane, modes, dc_step, ac_step, n: int, tiles: int,
                  bit_depth: int):
    """Per-tile wavefront commits (intra prediction never crosses tile
    rows — required for tile independence, and each stripe's wavefront
    runs in parallel under vmap)."""
    if tiles <= 1:
        dummy = jnp.zeros((1, 1), jnp.int32)
        return _commit(plane, dummy, modes, dc_step, ac_step, n,
                       decode=False, bit_depth=bit_depth)
    hp, wp = plane.shape
    rows = hp // n
    st = plane.reshape(tiles, hp // tiles, wp)
    m = modes.reshape(tiles, (rows // tiles) * (wp // n))
    dummy = jnp.zeros((1, 1), jnp.int32)

    def one(pl, md):
        return _commit(pl, dummy, md, dc_step, ac_step, n, decode=False,
                       bit_depth=bit_depth)

    lv, rec = jax.vmap(one)(st, m)
    return lv.reshape(-1, n * n), rec.reshape(hp, wp)


def _decide_modes_tiled(plane, n: int, tiles: int, bit_depth: int):
    if tiles <= 1:
        return decide_modes(plane, n, bit_depth)
    hp, wp = plane.shape
    st = plane.reshape(tiles, hp // tiles, wp)
    m = jax.vmap(lambda p: decide_modes(p, n, bit_depth))(st)
    return m.reshape(-1)


def _decide_uv_modes_tiled(u, v, cn: int, tiles: int, bit_depth: int):
    if tiles <= 1:
        return decide_uv_modes(u, v, cn, bit_depth)
    hc, wc = u.shape
    su = u.reshape(tiles, hc // tiles, wc)
    sv = v.reshape(tiles, hc // tiles, wc)
    m = jax.vmap(lambda a, b: decide_uv_modes(a, b, cn, bit_depth))(su, sv)
    return m.reshape(-1)


@functools.partial(jax.jit, static_argnames=("block", "bit_depth",
                                             "tile_rows"))
def encode_key_frame_v2(y_u8, u_u8, v_u8, dc_step, ac_step, qindex,
                        block: int, bit_depth: int = 8,
                        tile_rows: int = 1):
    """Transfer-optimized keyframe encode: mode decision + all three plane
    commits fused into one jit.  uint8 planes in; (y_modes uint8, levels
    int16 ×3, skips bool, recon uint8 ×3) out — recons stay on device as
    the GOP reference.
    """
    n = block
    cn = n // 2
    y = y_u8.astype(jnp.int32)
    u = u_u8.astype(jnp.int32)
    v = v_u8.astype(jnp.int32)
    T = tile_rows
    modes = _decide_modes_tiled(y, n, T, bit_depth)
    # chroma gets its own mode decision (AV1's uv_mode): U and V share
    # one mode per block, chosen by the summed SSE over both planes —
    # chroma structure often diverges from luma (flat chroma under
    # textured luma picks DC instead of inheriting a directional mode)
    uv_modes = _decide_uv_modes_tiled(u, v, cn, T, bit_depth)
    lv_y, rec_y = _commit_tiled(y, modes, dc_step, ac_step, n, T,
                                bit_depth)
    lv_u, rec_u = _commit_tiled(u, uv_modes, dc_step, ac_step, cn, T,
                                bit_depth)
    lv_v, rec_v = _commit_tiled(v, uv_modes, dc_step, ac_step, cn, T,
                                bit_depth)
    skips = ((lv_y == 0).all(1) & (lv_u == 0).all(1) & (lv_v == 0).all(1))
    from av1tpu.legacy.core.inter_frame import per_tile
    rec_y = per_tile(lambda p: deblock.deblock_plane(p, n, qindex,
                                                     bit_depth), rec_y, T)
    rec_u = per_tile(lambda p: deblock.deblock_plane(p, cn, qindex,
                                                     bit_depth), rec_u, T)
    rec_v = per_tile(lambda p: deblock.deblock_plane(p, cn, qindex,
                                                     bit_depth), rec_v, T)
    cdef_y = per_tile(lambda p: cdef.cdef_plane(p, qindex, bit_depth),
                      rec_y, T)
    cdef_u = per_tile(lambda p: cdef.cdef_plane(p, qindex, bit_depth,
                                                is_chroma=True), rec_u, T)
    cdef_v = per_tile(lambda p: cdef.cdef_plane(p, qindex, bit_depth,
                                                is_chroma=True), rec_v, T)
    cdef_on = cdef.cdef_gate(y, rec_y, cdef_y)
    rec_y = cdef.select(cdef_on, cdef_y, rec_y)
    rec_u = cdef.select(cdef_on, cdef_u, rec_u)
    rec_v = cdef.select(cdef_on, cdef_v, rec_v)
    maxval = _maxval(bit_depth)
    lr_mode = restoration.choose_mode(y, rec_y, maxval, T)
    rec_y = per_tile(lambda p: restoration.apply_restoration_dynamic(
        p, lr_mode, maxval), rec_y, T)
    rec_u = per_tile(lambda p: restoration.apply_restoration_dynamic(
        p, lr_mode, maxval), rec_u, T)
    rec_v = per_tile(lambda p: restoration.apply_restoration_dynamic(
        p, lr_mode, maxval), rec_v, T)
    out_dtype = jnp.uint8 if bit_depth == 8 else jnp.uint16
    from av1tpu.legacy.core.inter_frame import sparse_pack_levels
    lv_y16 = lv_y.astype(jnp.int16)
    lv_u16 = lv_u.astype(jnp.int16)
    lv_v16 = lv_v.astype(jnp.int16)
    sp_mask, sp_vals, sp_count = sparse_pack_levels(lv_y16, lv_u16, lv_v16)
    return (modes.astype(jnp.uint8),
            lv_y16, lv_u16, lv_v16, skips,
            rec_y.astype(out_dtype), rec_u.astype(out_dtype),
            rec_v.astype(out_dtype), lr_mode, cdef_on,
            sp_mask, sp_vals, sp_count, uv_modes.astype(jnp.uint8))
