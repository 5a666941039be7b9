"""Per-block GOLDEN reference (single_ref tree bits b3/b5) — grid-level
conformance of the native tile writer's mixed-reference streams.

GOP layout matched to the production engine: the shown keyframe fills
all 8 reference slots; every inter frame refreshes slot 0 only, so
slot 1 permanently holds the GOP keyframe and the inter header maps
GOLDEN (ref_frame_idx[3]) to it with no extra refresh logic.  Oracles:
our specav1 decoder and libaom must reconstruct every frame
pixel-identically (reference selection errors show up as MC from the
wrong plane, not just as syntax desync).

Reference parity: av1-go's av1_vaapi encoder uses multi-reference
prediction inside the opaque ffmpeg binary
(/root/reference/internal/ffmpeg/transcode.go:119-123); this is the
TPU build's first second-reference tool.
"""

import numpy as np
import pytest

from av1tpu.conformance import aomcodec
from av1tpu.spec_engine import SpecSequenceHeader
from av1tpu.specav1 import native
from av1tpu.specav1 import obu as obu_mod
from av1tpu.specav1 import writer as W

pytestmark = pytest.mark.skipif(not aomcodec.available(),
                                reason="system libaom unavailable")

SIZE = 256
GH = GW = SIZE // 32
MI = SIZE // 4
Q = 96


def _levels(seed, density=0.01):
    rng = np.random.default_rng(seed)
    ylv = np.zeros((SIZE, SIZE), np.int32)
    n = int(density * SIZE * SIZE)
    ylv[rng.integers(0, SIZE, n), rng.integers(0, SIZE, n)] = \
        rng.integers(1, 9, n) * rng.choice([-1, 1], n)
    c = SIZE // 2
    ulv = np.zeros((c, c), np.int32)
    vlv = np.zeros((c, c), np.int32)
    m = n // 6
    ulv[rng.integers(0, c, m), rng.integers(0, c, m)] = \
        rng.integers(1, 5, m)
    vlv[rng.integers(0, c, m), rng.integers(0, c, m)] = \
        rng.integers(1, 5, m)
    return ylv, ulv, vlv


def _key_tu(trl2=1):
    ylv, ulv, vlv = _levels(1)
    z = np.zeros((GH, GW), np.int32)
    tiles = native.encode_tile_rows(
        "key", Q, MI, MI, W.tile_row_spans(SIZE, trl2),
        (z, z, z), ylv, ulv, vlv)
    hdr = W.write_key_frame_header(SIZE, SIZE, Q, tile_rows_log2=trl2)
    hdr.byte_align()
    return SpecSequenceHeader(SIZE, SIZE, 8).seq_obu() + obu_mod.make_obu(
        obu_mod.OBU_FRAME, hdr.tobytes() + W.assemble_tile_group(tiles))


def _inter_tu(seed, modes, mv8, order_hint, trl2=1, splits=None,
              mvs16=None, skips16=None):
    ylv, ulv, vlv = _levels(seed, density=0.008)
    skip = np.zeros((GH, GW), np.int32)
    z = np.zeros((GH, GW), np.int32)
    tiles = native.encode_tile_rows(
        "inter", Q, MI, MI, W.tile_row_spans(SIZE, trl2),
        (modes, mv8, skip), ylv, ulv, vlv,
        split3=(splits if splits is not None else z,
                mvs16 if mvs16 is not None else
                np.zeros((GH, GW, 4, 2), np.int32),
                skips16 if skips16 is not None else
                np.zeros((GH, GW, 4), np.int32)))
    hdr = W.write_inter_frame_header(
        SIZE, SIZE, Q, order_hint=order_hint,
        refresh_frame_flags=0x01, tile_rows_log2=trl2,
        ref_slots=(0, 0, 0, 1, 0, 0, 0))
    hdr.byte_align()
    return obu_mod.make_obu(
        obu_mod.OBU_FRAME, hdr.tobytes() + W.assemble_tile_group(tiles))


def _assert_decoders_agree(tus, n_frames):
    from av1tpu.specav1 import decoder as specdec
    ours = specdec.decode_stream(tus)
    dec = aomcodec.Decoder()
    theirs = []
    for tu in tus:
        theirs += dec.decode(tu)
    assert len(ours) == len(theirs) == n_frames
    for fi in range(n_frames):
        for pl in range(3):
            a = np.asarray(ours[fi][pl], np.int64)
            b = np.asarray(theirs[fi][pl], np.int64)
            assert np.array_equal(a, b), f"frame {fi} plane {pl}"


def test_mixed_ref_stream_decoders_agree():
    """key -> inter(LAST) -> inter(mixed LAST/GOLDEN): after frame 1,
    slot 0 (LAST) and slot 1 (GOLDEN=keyframe) hold different pixels,
    so a block coded GOLDEN reconstructs differently from LAST — both
    decoders must pick the same plane for every block."""
    rng = np.random.default_rng(7)
    mv1 = (rng.integers(-8, 9, (GH, GW, 2)) * 8).astype(np.int32)
    f1 = _inter_tu(2, np.ones((GH, GW), np.int32), mv1, order_hint=1)

    modes = np.ones((GH, GW), np.int32)
    modes[(rng.random((GH, GW)) < 0.5)] = 4        # GOLDEN
    mv2 = (rng.integers(-8, 9, (GH, GW, 2)) * 8).astype(np.int32)
    f2 = _inter_tu(3, modes, mv2, order_hint=2)
    _assert_decoders_agree([_key_tu(), f1, f2], 3)


def test_golden_blocks_reconstruct_from_keyframe():
    """An all-GOLDEN zero-mv skip frame after a non-trivial LAST frame
    must reproduce the keyframe exactly (ref selection is observable,
    not just decodable)."""
    rng = np.random.default_rng(11)
    mv1 = (rng.integers(-8, 9, (GH, GW, 2)) * 8).astype(np.int32)
    key = _key_tu()
    f1 = _inter_tu(5, np.ones((GH, GW), np.int32), mv1, order_hint=1)

    z2 = np.zeros((GH, GW), np.int32)
    zu = np.zeros((SIZE // 2, SIZE // 2), np.int32)
    skip = np.ones((GH, GW), np.int32)
    tiles = native.encode_tile_rows(
        "inter", Q, MI, MI, W.tile_row_spans(SIZE, 1),
        (np.full((GH, GW), 4, np.int32),
         np.zeros((GH, GW, 2), np.int32), skip),
        np.zeros((SIZE, SIZE), np.int32), zu, zu,
        split3=(z2, np.zeros((GH, GW, 4, 2), np.int32),
                np.zeros((GH, GW, 4), np.int32)))
    hdr = W.write_inter_frame_header(
        SIZE, SIZE, Q, order_hint=2, refresh_frame_flags=0x01,
        tile_rows_log2=1, ref_slots=(0, 0, 0, 1, 0, 0, 0))
    hdr.byte_align()
    f2 = obu_mod.make_obu(
        obu_mod.OBU_FRAME, hdr.tobytes() + W.assemble_tile_group(tiles))

    dec = aomcodec.Decoder()
    k = dec.decode(key)[0]
    dec.decode(f1)
    g = dec.decode(f2)[0]
    for pl in range(3):
        assert np.array_equal(np.asarray(k[pl], np.int64),
                              np.asarray(g[pl], np.int64)), f"plane {pl}"


def test_golden_split_quadrants_inherit_ref():
    """A 32->16 SPLIT block under GOLDEN codes all four quadrants
    against the keyframe slot."""
    rng = np.random.default_rng(13)
    key = _key_tu()
    f1 = _inter_tu(6, np.ones((GH, GW), np.int32),
                   (rng.integers(-8, 9, (GH, GW, 2)) * 8).astype(
                       np.int32), order_hint=1)
    modes = np.ones((GH, GW), np.int32)
    modes[2:5, 2:5] = 4
    splits = np.zeros((GH, GW), np.int32)
    splits[3, 3] = 1
    splits[1, 1] = 1                                 # LAST split too
    mvs16 = (rng.integers(-4, 5, (GH, GW, 4, 2)) * 8).astype(np.int32)
    skips16 = np.zeros((GH, GW, 4), np.int32)
    f2 = _inter_tu(7, modes,
                   (rng.integers(-8, 9, (GH, GW, 2)) * 8).astype(
                       np.int32), order_hint=2, splits=splits,
                   mvs16=mvs16, skips16=skips16)
    _assert_decoders_agree([key, f1, f2], 3)
