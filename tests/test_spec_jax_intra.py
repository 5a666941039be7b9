"""Device (JAX) spec keyframe encoder conformance.

The jitted wavefront encoder's reconstruction must match what the
independent libaom decoder and our own spec decoder produce from the
emitted bitstream — pinning the JAX integer inverse DCT, the batched
spec intra predictors, availability plans, quant/dequant, and the
native tile writer, end to end.
"""

import numpy as np
import pytest

from av1tpu.conformance import aomcodec
from av1tpu.specav1 import decoder as specdec
from av1tpu.specav1 import jax_intra
from av1tpu.utils import testsrc


def _check(w, h, q, seed=0):
    f = testsrc.testsrc2(w, h, seed)
    tu, rec = jax_intra.encode_keyframe_device(f.y, f.u, f.v, q)
    dims = [(h, w), (h // 2, w // 2), (h // 2, w // 2)]
    mine = specdec.decode_stream([tu])[0]
    for i in range(3):
        got = np.asarray(mine[i], np.int64)[:dims[i][0], :dims[i][1]]
        assert np.array_equal(got, np.asarray(rec[i], np.int64)), \
            f"spec decoder plane {i} mismatch"
    if aomcodec.available():
        ref = aomcodec.decode_stream([tu])[0]
        for i in range(3):
            got = np.asarray(ref[i], np.int64)[:dims[i][0], :dims[i][1]]
            assert np.array_equal(got, np.asarray(rec[i], np.int64)), \
                f"libaom plane {i} mismatch"
    return tu


@pytest.mark.parametrize("w,h,q", [
    (128, 128, 96),
    (320, 192, 40),    # low q: golomb/br coverage
    (300, 180, 200),   # render-size padding, high q (skips)
])
def test_device_keyframe_conformance(w, h, q):
    _check(w, h, q)


def test_device_keyframe_wavefront_edges():
    # tall-narrow and wide-short exercise wave table padding edges
    _check(64, 256, 96, seed=3)
    _check(256, 64, 96, seed=4)
