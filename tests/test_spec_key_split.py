"""Keyframe 32->16 intra partition split RD (spec PARTITION_SPLIT).

The wavefront RD-chooses four 16x16 intra sub-blocks (own mode/angle/
uv each) per 32x32 where prediction wins; sub-block availability
collapses to the block-level wavefront flags (jax_intra._encode_frame
docstring).  Oracle: system libaom decodes the stream bit-exact to the
encoder's recon, and our own conformance decoder replays it.

Reference parity: av1_vaapi partitions keyframes below 32x32
(internal/ffmpeg/transcode.go:119-123); round-4's head-to-head traced
an intra-quality gap on edge-structured content to 32x32-only keys.
"""

import numpy as np
import pytest

from av1tpu.conformance import aomcodec
from av1tpu.specav1 import jax_intra


def _edge_frame(h, w, seed=3):
    """Per-16px-cell random-orientation hard edges: the content class
    where per-sub-block modes beat one 32x32 mode (splits fire on all
    interior blocks; stationary texture correctly prefers 32x32)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.zeros((h, w), np.int32)
    for by in range(0, h, 16):
        for bx in range(0, w, 16):
            k = rng.integers(0, 4)
            cy = yy[by:by + 16, bx:bx + 16] - by
            cx = xx[by:by + 16, bx:bx + 16] - bx
            m = [cy > 8, cx > 8, cy > cx, cy + cx > 16][k]
            y[by:by + 16, bx:bx + 16] = np.where(m, 40 + 10 * k,
                                                 210 - 10 * k)
    u = np.full((h // 2, w // 2), 110, np.uint8)
    v = np.full((h // 2, w // 2), 140, np.uint8)
    return y.astype(np.uint8), u, v


@pytest.mark.skipif(not aomcodec.available(), reason="no system libaom")
def test_key_split_fires_and_decodes_bit_exact():
    import jax.numpy as jnp
    y, u, v = _edge_frame(128, 192)
    q = 64
    out = jax_intra._encode_frame(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), jnp.int32(q),
        nbr=128 // 32, nbc=192 // 32, bit_depth=8)
    splits = np.asarray(out[10])
    assert splits.sum() >= splits.size // 2, \
        "split RD must fire on edge-structured content"
    tu, rec = jax_intra.encode_keyframe_device(y, u, v, q)
    planes = aomcodec.decode_stream([tu])[0]
    for got, want in zip(planes, rec):
        g = np.asarray(got, np.int64)[:want.shape[0], :want.shape[1]]
        assert np.array_equal(g, np.asarray(want, np.int64))


def test_key_split_own_decoder_replay():
    from av1tpu.specav1 import decoder as owndec
    y, u, v = _edge_frame(128, 128, seed=5)
    tu, rec = jax_intra.encode_keyframe_device(y, u, v, 80)
    fr = owndec.decode_stream([tu])[0]
    for got, want in zip(fr, rec):
        g = np.asarray(got, np.int64)[:want.shape[0], :want.shape[1]]
        assert np.array_equal(g, np.asarray(want, np.int64))


@pytest.mark.skipif(not aomcodec.available(), reason="no system libaom")
def test_key_split_composes_with_deblock():
    import jax.numpy as jnp
    from av1tpu.spec_engine import SpecSequenceHeader, lf_levels
    from av1tpu.specav1 import decoder as owndec
    from av1tpu.specav1 import native, obu as obu_mod, writer as W
    h, w, q = 128, 192, 64
    y, u, v = _edge_frame(h, w)
    lfy, lfuv = lf_levels(q, 8)
    out = jax_intra._encode_frame(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), jnp.int32(q),
        nbr=h // 32, nbc=w // 32, bit_depth=8, deblock=True,
        lf_y=jnp.int32(lfy), lf_uv=jnp.int32(lfuv))
    grids = [np.asarray(out[i]) for i in range(6, 15)]
    assert grids[4].sum() > 0
    lv = [np.asarray(out[i]) for i in (3, 4, 5)]
    tile = native.encode_intra32_tile(
        q, w // 4, h // 4, grids[0], grids[1], grids[2],
        lv[0], lv[1], lv[2], angles=grids[3], split5=tuple(grids[4:9]))
    hdr = W.write_key_frame_header(w, h, q, lf_level=lfy,
                                   lf_level_uv=lfuv)
    hdr.byte_align()
    tu = SpecSequenceHeader(w, h, 8).seq_obu() + obu_mod.make_obu(
        obu_mod.OBU_FRAME, hdr.tobytes() + W.assemble_tile_group([tile]))
    recf = [np.asarray(out[i]) for i in range(3)]
    for decode in (aomcodec.decode_stream, owndec.decode_stream):
        planes = decode([tu])[0]
        for got, want in zip(planes, recf):
            g = np.asarray(got, np.int64)[:want.shape[0],
                                          :want.shape[1]]
            assert np.array_equal(g, want)
