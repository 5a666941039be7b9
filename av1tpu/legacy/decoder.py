"""Bitstream decoder — the conformance inverse path (SURVEY.md §4a).

Decodes av1tpu-profile streams back to YUV frames: OBU parse → frame
header → C++ tile decode → dequant + exact inverse transform + wavefront
intra reconstruction (the same jitted commit pass the encoder runs, so
encoder recon and decoder output are bit-identical by construction —
verified by tests, not assumed).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from av1tpu.encoder import quant
from av1tpu.legacy.core import inter_frame, intra_frame
from av1tpu.encoder.kernels import deblock as deblock_mod
from av1tpu.legacy import entropy_tile as tile_codec
from av1tpu.encoder.kernels import motion
from av1tpu.media import obu as obu_mod
from av1tpu.utils.testsrc import Frame


class DecodeError(Exception):
    pass


import functools as _functools
import jax as _jax


@_functools.partial(_jax.jit, static_argnames=("n", "bit_depth",
                                                "is_chroma", "lr_mode",
                                                "cdef_on", "tile_rows"))
def _deblock_jit(rec, n: int, qindex, bit_depth: int = 8,
                 is_chroma: bool = False, lr_mode: int = 0,
                 cdef_on: bool = True, tile_rows: int = 1):
    from av1tpu.legacy.core.inter_frame import per_tile
    from av1tpu.encoder.kernels import cdef as cdef_mod
    from av1tpu.encoder.kernels import restoration as lr_mod
    maxval = (1 << bit_depth) - 1

    def chain(p):
        p = deblock_mod.deblock_plane(p, n, qindex, bit_depth)
        if cdef_on:
            p = cdef_mod.cdef_plane(p, qindex, bit_depth,
                                    is_chroma=is_chroma)
        return lr_mod.apply_restoration(p, lr_mode, maxval)

    return per_tile(chain, rec, tile_rows)


@dataclasses.dataclass
class DecoderState:
    seq: obu_mod.SequenceHeader | None = None
    ref: tuple | None = None     # (y, u, v) block-padded recon planes
    golden: tuple | None = None  # last keyframe recon (two_ref frames)


def _padded_dims(w: int, h: int, block: int) -> tuple[int, int]:
    return -(-h // block) * block, -(-w // block) * block


def decode_frame_payload(payload: bytes, state: DecoderState) -> Frame | None:
    """Decode one temporal unit (bytes of OBUs).  Returns a Frame or None
    (e.g. pure TD/seq-header units)."""
    frame = None
    for obu_type, data in obu_mod.parse_obus(payload):
        if obu_type == obu_mod.OBU_SEQUENCE_HEADER:
            state.seq = obu_mod.SequenceHeader.parse(data)
        elif obu_type == obu_mod.OBU_FRAME:
            if state.seq is None:
                raise DecodeError("frame before sequence header")
            frame = _decode_frame(data, state)
    return frame


def _decode_frame(data: bytes, state: DecoderState) -> Frame:
    import jax.numpy as jnp
    fh, hdr_len = obu_mod.FrameHeader.parse(data)
    tile_data = data[hdr_len:]
    block = 1 << fh.luma_block_log2
    cblock = block // 2
    hp, wp = _padded_dims(fh.width, fh.height, block)
    rows, cols = hp // block, wp // block
    n_blocks = rows * cols
    bd = state.seq.bit_depth if state.seq else 8
    dc = quant.dc_q(fh.base_q_idx, bd)
    ac = quant.ac_q(fh.base_q_idx, bd)

    tiles = 1 << fh.tile_rows_log2
    tile_payloads = obu_mod.split_tiles(tile_data, tiles)
    bpt = n_blocks // tiles
    if fh.frame_type == obu_mod.KEY_FRAME:
        parts = [tile_codec.decode_tile_intra(p, bpt, block, cblock)
                 for p in tile_payloads]
        skips, y_modes, uv_modes, y_lv, u_lv, v_lv = (
            np.concatenate([pt[i] for pt in parts]) for i in range(6))
        y = np.asarray(_deblock_jit(intra_frame.decode_plane(
            y_lv, y_modes.astype(np.int32), dc, ac, hp, wp, block, bd,
            tiles), block, fh.base_q_idx, bd, False, fh.lr_mode,
            fh.cdef_on, tiles))
        u = np.asarray(_deblock_jit(intra_frame.decode_plane(
            u_lv, uv_modes.astype(np.int32), dc, ac, hp // 2, wp // 2,
            cblock, bd, tiles), cblock, fh.base_q_idx, bd, True,
            fh.lr_mode, fh.cdef_on, tiles))
        v = np.asarray(_deblock_jit(intra_frame.decode_plane(
            v_lv, uv_modes.astype(np.int32), dc, ac, hp // 2, wp // 2,
            cblock, bd, tiles), cblock, fh.base_q_idx, bd, True,
            fh.lr_mode, fh.cdef_on, tiles))
    else:
        if state.ref is None:
            raise DecodeError("inter frame without reference")
        if fh.two_ref and state.golden is None:
            raise DecodeError("two_ref frame without a keyframe golden")
        parts = [tile_codec.decode_tile_inter(p, bpt, block, cblock,
                                              use_refs=fh.two_ref)
                 for p in tile_payloads]
        skips, mvs, y_lv, u_lv, v_lv, refs, txs = (
            np.concatenate([pt[i] for pt in parts])
            for i in (0, 1, 2, 3, 4, 5, 6))
        ry, ru, rv = state.ref
        if fh.two_ref:
            gy, gu, gv = state.golden
            extra = dict(
                refs=jnp.asarray(refs),
                ref2_y_pad=jnp.asarray(np.pad(gy, motion.PAD,
                                              mode="edge")),
                ref2_u_pad=jnp.asarray(np.pad(gu, motion.CHROMA_PAD,
                                              mode="edge")),
                ref2_v_pad=jnp.asarray(np.pad(gv, motion.CHROMA_PAD,
                                              mode="edge")),
                use_two_refs=True)
        else:
            extra = {}
        yj, uj, vj = inter_frame.decode_inter_frame_v2(
            jnp.asarray(mvs), jnp.asarray(y_lv), jnp.asarray(u_lv),
            jnp.asarray(v_lv),
            jnp.asarray(np.pad(ry, motion.PAD, mode="edge")),
            jnp.asarray(np.pad(ru, motion.CHROMA_PAD, mode="edge")),
            jnp.asarray(np.pad(rv, motion.CHROMA_PAD, mode="edge")),
            dc, ac, fh.base_q_idx, jnp.asarray(fh.lr_mode, jnp.int32),
            jnp.asarray(fh.cdef_on), hp, wp, block, bd, tiles,
            tx_syms=jnp.asarray(txs), **extra)
        y, u, v = np.asarray(yj), np.asarray(uj), np.asarray(vj)

    if fh.refresh:  # non-reference frames (flash) leave state untouched
        state.ref = (y, u, v)
    if fh.frame_type == obu_mod.KEY_FRAME:
        state.golden = (y, u, v)
    h, w = fh.height, fh.width
    ch, cw = -(-h // 2), -(-w // 2)
    dtype = np.uint8 if bd == 8 else np.uint16
    return Frame(y=y[:h, :w].astype(dtype),
                 u=u[:ch, :cw].astype(dtype),
                 v=v[:ch, :cw].astype(dtype), bit_depth=bd)


def decode_ivf(path: str) -> list[Frame]:
    """Decode all frames of an av1tpu IVF file."""
    from av1tpu.media import ivf
    state = DecoderState()
    frames = []
    with open(path, "rb") as f:
        ivf.read_header(f)
        for payload, _pts in ivf.iter_frames(f):
            fr = decode_frame_payload(payload, state)
            if fr is not None:
                frames.append(fr)
    return frames
