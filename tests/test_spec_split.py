"""32->16 PARTITION_SPLIT inter tiles: native writer vs Python writer.

The Python TileWriter's mixed-partition inter syntax is fuzz-validated
against libaom (tests/fuzz_tiles.py); spec_tile.cc's split path must
emit byte-identical tiles for the same block stream.  Each case builds
a random mix of 32x32 NONE and 32->SPLIT 16x16 blocks with random MVs,
skips, and sparse levels, encodes it with both writers, and compares
bytes.  Conformance of the full device pipeline (device split RDO ->
native tile -> libaom decode) is covered by tests/test_spec_jax_inter.
"""

import numpy as np
import pytest

from av1tpu.specav1 import mvrefs, native, writer as W
from av1tpu.specav1 import tile as T
from av1tpu.specav1.cdfs import FrameContext


def _derive(stack, mv):
    pr, pc = stack.ref_mv(0)
    if (mv[0], mv[1]) == (pr, pc):
        return T.NEARESTMV
    if (mv[0], mv[1]) == (0, 0):
        return T.GLOBALMV
    return T.NEWMV


def _python_dual(qidx, mi, ylv, ulv, vlv, modes, mvs, skips, splits,
                 mvs16, skips16):
    fc = FrameContext(qidx)
    tw_ = W.TileWriter(fc, mi, mi, qidx)

    def coeffs(r, c, bsize):
        w4, _ = T.BLOCK_SIZES[bsize]
        x0, y0 = c * 4, r * 4
        ytx = T.TX_32X32 if w4 == 8 else T.TX_16X16
        ctx_ = T.TX_16X16 if w4 == 8 else T.TX_8X8
        tws, ths = T.TX_SIZES_ALL[ytx]
        tw_.coeffs(0, x0, y0, ytx,
                   ylv[y0:y0 + ths, x0:x0 + tws].astype(np.int64),
                   is_inter=True)
        ctw, cth = T.TX_SIZES_ALL[ctx_]
        cx, cy = x0 // 2, y0 // 2
        tw_.coeffs(1, cx, cy, ctx_,
                   ulv[cy:cy + cth, cx:cx + ctw].astype(np.int64),
                   is_inter=True)
        tw_.coeffs(2, cx, cy, ctx_,
                   vlv[cy:cy + cth, cx:cx + ctw].astype(np.int64),
                   is_inter=True)

    for sb_r in range(0, mi, 16):
        tw_.start_sb_row(sb_r)
        for sb_c in range(0, mi, 16):
            tw_.partition(sb_r, sb_c, T.BLOCK_64X64, T.PARTITION_SPLIT)
            for (dr, dc) in [(0, 0), (0, 8), (8, 0), (8, 8)]:
                br, bc = sb_r + dr, sb_c + dc
                if br >= mi or bc >= mi:
                    continue
                gr, gc = br // 8, bc // 8
                if splits[gr, gc]:
                    tw_.partition(br, bc, T.BLOCK_32X32,
                                  T.PARTITION_SPLIT)
                    for qi, (qdr, qdc) in enumerate(
                            [(0, 0), (0, 4), (4, 0), (4, 4)]):
                        qr, qc = br + qdr, bc + qdc
                        tw_.partition(qr, qc, T.BLOCK_16X16,
                                      T.PARTITION_NONE)
                        st = tw_.mv_stack(qr, qc, T.BLOCK_16X16,
                                          mvrefs.LAST_FRAME)
                        mv = tuple(int(x) for x in mvs16[gr, gc, qi])
                        sk = int(skips16[gr, gc, qi])
                        tw_.block_inter(qr, qc, T.BLOCK_16X16, sk,
                                        mvrefs.LAST_FRAME,
                                        _derive(st, mv), mv, st)
                        if not sk:
                            coeffs(qr, qc, T.BLOCK_16X16)
                        tw_.update_partition_ctx(qr, qc, T.BLOCK_16X16)
                else:
                    tw_.partition(br, bc, T.BLOCK_32X32,
                                  T.PARTITION_NONE)
                    st = tw_.mv_stack(br, bc, T.BLOCK_32X32,
                                      mvrefs.LAST_FRAME)
                    mv = tuple(int(x) for x in mvs[gr, gc])
                    sk = int(skips[gr, gc])
                    tw_.block_inter(br, bc, T.BLOCK_32X32, sk,
                                    mvrefs.LAST_FRAME, _derive(st, mv),
                                    mv, st)
                    if not sk:
                        coeffs(br, bc, T.BLOCK_32X32)
                    tw_.update_partition_ctx(br, bc, T.BLOCK_32X32)
    return bytes(tw_.finish())


@pytest.mark.parametrize("seed,size", [(0, 64), (1, 128), (2, 128),
                                       (3, 192)])
def test_native_split_tile_matches_python(seed, size):
    rng = np.random.default_rng(seed)
    mi = size // 4
    gh = gw = size // 32
    qidx = 80
    ylv = np.zeros((size, size), np.int32)
    ulv = np.zeros((size // 2, size // 2), np.int32)
    vlv = np.zeros((size // 2, size // 2), np.int32)
    modes = np.ones((gh, gw), np.int32)
    mvs = rng.integers(-20, 21, (gh, gw, 2)).astype(np.int32) * 2
    skips = (rng.random((gh, gw)) < 0.4).astype(np.int32)
    splits = (rng.random((gh, gw)) < 0.5).astype(np.int32)
    mvs16 = rng.integers(-20, 21, (gh, gw, 4, 2)).astype(np.int32) * 2
    skips16 = (rng.random((gh, gw, 4)) < 0.4).astype(np.int32)

    def fill(dst, n):
        for _ in range(int(rng.integers(1, 5))):
            dst[rng.integers(0, n), rng.integers(0, n)] = \
                int(rng.integers(-9, 10))

    for gr in range(gh):
        for gc in range(gw):
            if splits[gr, gc]:
                for qi, (dr, dc) in enumerate(
                        [(0, 0), (0, 16), (16, 0), (16, 16)]):
                    if skips16[gr, gc, qi]:
                        continue
                    y0, x0 = gr * 32 + dr, gc * 32 + dc
                    fill(ylv[y0:y0 + 16, x0:x0 + 16], 6)
                    fill(ulv[y0 // 2:y0 // 2 + 8, x0 // 2:x0 // 2 + 8], 4)
                    fill(vlv[y0 // 2:y0 // 2 + 8, x0 // 2:x0 // 2 + 8], 4)
            elif not skips[gr, gc]:
                y0, x0 = gr * 32, gc * 32
                fill(ylv[y0:y0 + 32, x0:x0 + 32], 8)
                fill(ulv[y0 // 2:y0 // 2 + 16, x0 // 2:x0 // 2 + 16], 6)
                fill(vlv[y0 // 2:y0 // 2 + 16, x0 // 2:x0 // 2 + 16], 6)

    tile_native = native.encode_inter32_tile(
        qidx, mi, mi, modes, mvs, skips, ylv, ulv, vlv,
        splits=splits, mvs16=mvs16, skips16=skips16)
    tile_py = _python_dual(qidx, mi, ylv, ulv, vlv, modes, mvs, skips,
                           splits, mvs16, skips16)
    assert tile_native == tile_py, (
        f"seed {seed}: native {len(tile_native)}B != python "
        f"{len(tile_py)}B")
