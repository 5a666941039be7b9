"""Golden bitstream regression vectors.

The fixtures in tests/golden/ were encoded by this codec and their
decoded reconstructions checksummed; any change to normative behavior
(entropy coding, transforms, prediction, loop filters, headers) breaks
these checksums.  Bitstream-compatible refactors must keep them green;
intentional bitstream revisions must regenerate the fixtures and say so.
"""

import hashlib
import json
import os

import pytest

from av1tpu.legacy import decoder as dec_mod

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize("name", ["g8_16", "g8_32", "g10_16"])
def test_golden_stream_decodes_bit_exact(name):
    with open(os.path.join(GOLDEN, "manifest.json")) as f:
        meta = json.load(f)[name]
    frames = dec_mod.decode_ivf(os.path.join(GOLDEN, f"{name}.ivf"))
    assert len(frames) == meta["frames"]
    for fr, expect in zip(frames, meta["recon_sha256"]):
        got = hashlib.sha256(fr.y.tobytes() + fr.u.tobytes()
                             + fr.v.tobytes()).hexdigest()
        assert got == expect
        assert fr.y.shape == (meta["height"], meta["width"])
