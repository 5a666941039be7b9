"""Engine-level GOLDEN reference selection: the device encoder picks
the GOP keyframe (slot 1) for blocks it predicts better than LAST, and
the emitted mixed-reference stream stays bit-exact in libaom.

Scenario: a "flash" GOP — key A, inter B (different content), inter
back to A.  LAST (B's recon) is useless for the third frame while
GOLDEN (A's recon) is near-perfect, so reference selection is
observable as a large payload shrink, not just as decodability.

Reference parity: av1-go's av1_vaapi encoder uses multi-reference
prediction inside ffmpeg (/root/reference/internal/ffmpeg/
transcode.go:119-123)."""
import numpy as np
import pytest

from av1tpu.conformance import aomcodec

pytestmark = pytest.mark.skipif(not aomcodec.available(),
                                reason="system libaom unavailable")


def _encode_gop(golden: bool):
    import jax

    from av1tpu.spec_engine import SpecTpuEngine
    from av1tpu.utils.testsrc import testsrc2

    eng = SpecTpuEngine()
    eng.cfg.keyint = 8
    eng.cfg.golden = golden
    eng._golden = golden
    eng.start_stream()
    frames = [testsrc2(192, 160, 0), testsrc2(192, 160, 40),
              testsrc2(192, 160, 0)]
    payloads, recons = [], []
    for i, fr in enumerate(frames):
        # pin frame types: the flash content would otherwise trip the
        # scene-cut detector into keying frames 1-2, which is exactly
        # the policy golden exists to beat — tested separately
        pend = eng._submit(fr, 96, is_key=(i == 0))
        recons.append(tuple(
            np.asarray(p)[:160 >> (0 if pl == 0 else 1),
                          :192 >> (0 if pl == 0 else 1)]
            for pl, p in enumerate(jax.device_get(eng._resolve_refs()))))
        payloads.append(bytes(eng._finalize(pend)[0]))
    return payloads, recons


@pytest.mark.heavy
def test_golden_flash_gop_bitexact_and_smaller():
    pg, rg = _encode_gop(golden=True)
    pn, _ = _encode_gop(golden=False)

    # both decoders reproduce the engine recon exactly
    dec = aomcodec.Decoder()
    idx = 0
    for p in pg:
        for f in dec.decode(p):
            for pl in range(3):
                assert np.array_equal(np.asarray(f[pl], np.int64),
                                      np.asarray(rg[idx][pl], np.int64)), \
                    f"frame {idx} plane {pl}"
            idx += 1
    assert idx == 3

    from av1tpu.specav1 import decoder as specdec
    ours = specdec.decode_stream(pg)
    assert len(ours) == 3
    for fi in range(3):
        for pl in range(3):
            assert np.array_equal(np.asarray(ours[fi][pl], np.int64),
                                  np.asarray(rg[fi][pl], np.int64)), \
                f"our decoder frame {fi} plane {pl}"

    # the flash-back frame codes against GOLDEN: observable as a large
    # payload shrink vs the LAST-only encode of the same GOP
    assert len(pg[2]) < len(pn[2]) // 2, \
        (len(pg[2]), len(pn[2]))
