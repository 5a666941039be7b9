"""Writer→libaom→our-decoder conformance for the spec-AV1 layer.

Every temporal unit built by av1tpu.specav1.writer must decode
IDENTICALLY in the independent libaom decoder and in our own spec
decoder.  This pins, simultaneously: header syntax, the daala EC,
default CDF tables, symbol order/contexts, scan orders, dequant, the
inverse transforms and the intra predictors.

Feature coverage grows with the conformance work; each case here is a
construct the TPU encoder emits.
"""

import numpy as np
import pytest

from av1tpu.conformance import aomcodec
from av1tpu.specav1 import decoder as specdec
from av1tpu.specav1 import recon
from av1tpu.specav1 import tile as T
from av1tpu.specav1 import writer as W
from av1tpu.specav1.cdfs import FrameContext

pytestmark = pytest.mark.skipif(
    not aomcodec.available(), reason="system libaom not present")


def mi_dims(w, h):
    return 2 * ((w + 7) >> 3), 2 * ((h + 7) >> 3)


def decode_both(tu):
    ref = aomcodec.decode_stream([tu])[0]
    mine = specdec.decode_stream([tu])[0]
    return ref, mine


def check(tu):
    ref, mine = decode_both(tu)
    for i, name in enumerate("yuv"):
        assert np.array_equal(np.asarray(ref[i], np.int64),
                              np.asarray(mine[i], np.int64)), \
            f"plane {name} mismatch (max " \
            f"{np.abs(np.asarray(ref[i], np.int64) - np.asarray(mine[i], np.int64)).max()})"
    return ref


def single_block_frame(size, qidx, blocks):
    """Build a frame of `size`x`size`; blocks is a list of
    (mi_r, mi_c, bsize, y_mode, uv_mode, {plane: (tx, vals)}).
    Caller must tile the whole frame."""
    w = h = size
    mi_cols, mi_rows = mi_dims(w, h)
    fc = FrameContext(qidx)
    tw = W.TileWriter(fc, mi_cols, mi_rows, qidx)
    sb4 = 16
    for r, c, bsize, y_mode, uv_mode, planes in blocks:
        if c == 0 and (r % sb4) == 0:
            tw.start_sb_row(r)
        # emit forced-split path: partitions down from 64 to bsize at
        # this position (valid only for frames <= 64 with one block or
        # full tilings; tests keep it simple)
        w4 = T.BLOCK_SIZES[bsize][0]
        bsl = w4.bit_length() - 1
        # walk down sizes reading/forcing partitions
        sz = 16  # 64x64 in mi units
        while sz > w4:
            half = sz >> 1
            has = (r % sz == 0 and c % sz == 0)
            if has:
                node_bsl = sz.bit_length() - 1
                nr, nc = r - (r % sz), c - (c % sz)
                has_rows = (nr + half) < mi_rows
                has_cols = (nc + half) < mi_cols
                if has_rows and has_cols:
                    tw.partition(nr, nc,
                                 T._SQUARES[sz], T.PARTITION_SPLIT)
            sz = half
        tw.partition(r, c, bsize, T.PARTITION_NONE)
        skip = int(not planes)
        tw.block_intra(r, c, bsize, skip, y_mode, uv_mode)
        if not skip:
            for plane in (0, 1, 2):
                tx, vals = planes[plane]
                ss = 1 if plane else 0
                x = (c * 4) >> ss
                y = (r * 4) >> ss
                tw.coeffs(plane, x, y, tx, vals, intra_dir=y_mode)
        tw.update_partition_ctx(r, c, bsize)
    tile = tw.finish()
    return W.assemble_keyframe(w, h, qidx, tile)


def _z(tx):
    twh = T.TX_SIZES_ALL[tx]
    return np.zeros((twh[1], twh[0]), np.int64)


def test_gray_multisb():
    """128x128, 4 SBs of 64x64 NONE, all-skip -> flat base color."""
    blocks = [(r, c, T.BLOCK_64X64, 0, 0, None)
              for r in (0, 16) for c in (0, 16)]
    tu = single_block_frame(128, 60, blocks)
    ref = check(tu)
    assert (np.asarray(ref[0]) == 128).all()


@pytest.mark.parametrize("level,qidx", [(2, 60), (3, 60), (8, 60),
                                        (15, 100), (40, 30), (2, 200)])
def test_dc_only_32x32(level, qidx):
    vals = _z(T.TX_32X32)
    vals[0, 0] = level
    planes = {0: (T.TX_32X32, vals),
              1: (T.TX_16X16, _z(T.TX_16X16)),
              2: (T.TX_16X16, _z(T.TX_16X16))}
    tu = single_block_frame(32, qidx, [(0, 0, T.BLOCK_32X32, 0, 0, planes)])
    check(tu)


def test_dc_negative_and_chroma():
    yv = _z(T.TX_32X32)
    yv[0, 0] = -5
    uv = _z(T.TX_16X16)
    uv[0, 0] = 7
    vv = _z(T.TX_16X16)
    vv[0, 0] = -3
    planes = {0: (T.TX_32X32, yv), 1: (T.TX_16X16, uv),
              2: (T.TX_16X16, vv)}
    tu = single_block_frame(32, 80, [(0, 0, T.BLOCK_32X32, 0, 0, planes)])
    check(tu)


def test_ac_coeffs_scan():
    """Several AC positions: pins the zigzag scan + base/br contexts."""
    yv = _z(T.TX_32X32)
    yv[0, 0] = 4
    yv[0, 1] = -3
    yv[1, 0] = 2
    yv[2, 2] = 9
    yv[0, 5] = -1
    yv[7, 0] = 1
    planes = {0: (T.TX_32X32, yv),
              1: (T.TX_16X16, _z(T.TX_16X16)),
              2: (T.TX_16X16, _z(T.TX_16X16))}
    tu = single_block_frame(32, 60, [(0, 0, T.BLOCK_32X32, 0, 0, planes)])
    check(tu)


def test_golomb_escape():
    yv = _z(T.TX_32X32)
    yv[0, 0] = 300   # far beyond 15: golomb suffix
    yv[0, 1] = 17
    planes = {0: (T.TX_32X32, yv),
              1: (T.TX_16X16, _z(T.TX_16X16)),
              2: (T.TX_16X16, _z(T.TX_16X16))}
    tu = single_block_frame(32, 40, [(0, 0, T.BLOCK_32X32, 0, 0, planes)])
    check(tu)


def test_chroma_8x8_coeffs():
    """16x16 block: chroma 8x8 txbs carry coefficients."""
    uv = _z(T.TX_8X8)
    uv[0, 0] = 6
    uv[1, 1] = -2
    planes = {0: (T.TX_16X16, _z(T.TX_16X16)),
              1: (T.TX_8X8, uv), 2: (T.TX_8X8, _z(T.TX_8X8))}
    # NOTE: luma all-zero => txb_skip=1, no tx_type symbol needed
    tu = single_block_frame(16, 60, [(0, 0, T.BLOCK_16X16, 0, 0, planes)])
    check(tu)


def test_multi_block_adaptation():
    """Four 32x32 blocks with varied coeffs: CDF adaptation + ctx
    propagation across blocks."""
    rng = np.random.default_rng(3)
    blocks = []
    for i, (r, c) in enumerate(((0, 0), (0, 8), (8, 0), (8, 8))):
        yv = _z(T.TX_32X32)
        for _ in range(6):
            rr, cc = rng.integers(0, 6), rng.integers(0, 6)
            yv[rr, cc] = int(rng.integers(-9, 10))
        yv[0, 0] = int(rng.integers(1, 12))
        uv = _z(T.TX_16X16)
        uv[0, 0] = int(rng.integers(-4, 5))
        vv = _z(T.TX_16X16)
        planes = {0: (T.TX_32X32, yv), 1: (T.TX_16X16, uv),
                  2: (T.TX_16X16, vv)}
        blocks.append((r, c, T.BLOCK_32X32, 0, 0, planes))
    tu = single_block_frame(64, 70, blocks)
    check(tu)
