"""Native (C++) spec tile writer vs the Python TileWriter.

spec_tile.cc must emit byte-identical tiles to writer.TileWriter for
the fixed-32x32 intra grid, and the assembled streams must decode in
the independent libaom decoder to the encoder's own recon.
"""

import numpy as np
import pytest

from av1tpu.conformance import aomcodec
from av1tpu.specav1 import native
from av1tpu.specav1 import writer as W
from av1tpu.specav1.encode import KeyFrameEncoder


def _rng_frame(w, h, seed):
    rng = np.random.default_rng(seed)
    # gradients + noise: produces a healthy mix of skip/low/high-energy
    # blocks (pure noise never skips; pure gradient rarely exercises br)
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx * 255 // max(w - 1, 1)) + rng.integers(0, 40, (h, w))) % 256
    u = ((yy[::2, ::2] * 200 // max(h - 1, 1)) +
         rng.integers(0, 20, (h // 2, w // 2))) % 256
    v = rng.integers(100, 140, (h // 2, w // 2))
    return (y.astype(np.uint8), u.astype(np.uint8), v.astype(np.uint8))


@pytest.mark.parametrize("size,qidx,seed", [
    (64, 96, 0),
    (128, 96, 1),
    (128, 40, 2),     # low q: big levels, exercises br + golomb
    (192, 200, 3),    # high q: many skip blocks
])
def test_native_tile_matches_python(size, qidx, seed):
    y, u, v = _rng_frame(size, size, seed)
    enc = KeyFrameEncoder(qidx)
    enc.encode(y, u, v)
    tile_native = native.encode_intra32_tile(
        qidx, enc.mi_cols, enc.mi_rows, enc.grid_y_mode, enc.grid_uv_mode,
        enc.grid_skip, enc.levels_y, enc.levels_u, enc.levels_v)
    assert tile_native == enc.tile_bytes


@pytest.mark.skipif(not aomcodec.available(), reason="no system libaom")
def test_native_tile_stream_decodes_in_libaom():
    qidx = 80
    y, u, v = _rng_frame(128, 128, 7)
    enc = KeyFrameEncoder(qidx)
    _, rec = enc.encode(y, u, v)
    tile = native.encode_intra32_tile(
        qidx, enc.mi_cols, enc.mi_rows, enc.grid_y_mode, enc.grid_uv_mode,
        enc.grid_skip, enc.levels_y, enc.levels_u, enc.levels_v)
    tu = W.assemble_keyframe(128, 128, qidx, tile)
    planes = aomcodec.decode_stream([tu])[0]
    for got, want in zip(planes, rec):
        assert np.array_equal(np.asarray(got, np.int64),
                              np.asarray(want, np.int64))
