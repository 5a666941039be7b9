"""Pin the analytic rect-tx default scans to the spec constants.

The AV1 spec fixes explicit Default_Scan tables for rectangular
transforms; they are NOT the alternating JPEG zigzag (a single
coefficient at (1,0) of a 16x32 inter tx desyncs libaom under the
alternating rule — found by tests/fuzz_tiles.py in round 3).  With no
spec text or dev headers in this container, the ground truth is the
int16 permutation arrays embedded in BOTH system codec binaries'
.rodata (libaom and libgav1 — independent builds agreeing on a spec
constant).  tools/extract_scans.py recovers them; this test asserts
specav1.tile's analytic one-direction-diagonal generator reproduces
every recovered table exactly, so a libaom/libgav1 upgrade that
shifted .rodata could never silently diverge from the encoder.
"""
import os

import numpy as np
import pytest

from av1tpu.specav1 import tile as T
from tools import extract_scans


def _libs_present():
    return (os.path.exists(extract_scans.LIBAOM)
            and os.path.exists(extract_scans.LIBGAV1))


@pytest.mark.skipif(not _libs_present(),
                    reason="system libaom/libgav1 not present")
def test_rect_scans_match_rodata():
    tables = extract_scans.main(None)
    checked = 0
    for (w, h), cands in tables.items():
        assert len(cands) == 1, \
            f"{w}x{h}: expected a unique shared diagonal scan, " \
            f"got {len(cands)}"
        seg = cands[0]
        got = T._zigzag(w, h)           # (L, 2) of (row, col)
        want = np.stack([seg // w, seg % w], axis=1)
        assert np.array_equal(got, want), f"{w}x{h} scan mismatch"
        checked += 1
    assert checked == len(extract_scans.RECT_SHAPES)
