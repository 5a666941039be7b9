"""Subpel MC tests: filter properties, normative interp, GOP round-trip."""

import numpy as np
import pytest

import jax.numpy as jnp

from av1tpu.legacy import decoder as dec_mod
from av1tpu.encoder.kernels import mc, motion
from av1tpu.engine_tpu import TpuEngine
from av1tpu.utils.testsrc import testsrc2 as make_testsrc


def test_filter_tables():
    f = mc.luma_filters()
    assert f.shape == (4, 8)
    assert (f.sum(axis=1) == 128).all()
    assert list(f[0]) == [0, 0, 0, 128, 0, 0, 0, 0]  # phase 0 = copy
    # half-pel filter symmetric
    assert (f[2] == f[2][::-1]).all()
    cf = mc.chroma_filters()
    assert cf.shape == (8, 4)
    assert (cf.sum(axis=1) == 128).all()


def test_phase0_is_copy():
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 256, (64, 64), np.int32)
    refp = jnp.pad(jnp.asarray(ref), ((64, 64),) * 2, mode="edge")
    pos = jnp.asarray([[16, 16], [32, 8]], jnp.int32)
    mv0 = jnp.zeros((2, 2), jnp.int32)
    pred = np.asarray(mc.predict_subpel_luma(refp, pos, mv0, 16, 64))
    np.testing.assert_array_equal(pred[0], ref[16:32, 16:32])
    np.testing.assert_array_equal(pred[1], ref[32:48, 8:24])


def test_fullpel_mv_is_gather():
    rng = np.random.default_rng(1)
    ref = rng.integers(0, 256, (64, 64), np.int32)
    refp = jnp.pad(jnp.asarray(ref), ((64, 64),) * 2, mode="edge")
    pos = jnp.asarray([[16, 16]], jnp.int32)
    mv = jnp.asarray([[3 * 4, -2 * 4]], jnp.int32)  # (3, -2) full-pel in q4
    pred = np.asarray(mc.predict_subpel_luma(refp, pos, mv, 16, 64))
    np.testing.assert_array_equal(pred[0], ref[19:35, 14:30])


def test_halfpel_linear_exact():
    """On linear signals the half-pel interp equals bilinear exactly."""
    ramp = (np.arange(48)[None, :] * 3 + np.arange(48)[:, None] * 5) \
        .astype(np.int32)
    refp = jnp.pad(jnp.asarray(ramp), ((64, 64),) * 2, mode="edge")
    pos = jnp.asarray([[8, 8]], jnp.int32)
    pred = np.asarray(mc.predict_subpel_luma(
        refp, pos, jnp.asarray([[2, 2]], jnp.int32), 16, 64))
    ex = ramp[8:25, 8:25].astype(np.float64)
    bilin = (ex[:-1, :-1] + ex[1:, :-1] + ex[:-1, 1:] + ex[1:, 1:]) / 4
    np.testing.assert_array_equal(pred[0], np.round(bilin - 1e-9))


def test_subpel_refine_finds_half_pel_shift():
    """Reference shifted by exactly 0.5 px (via interpolation) → refine
    should pick the half-pel MV for most blocks."""
    rng = np.random.default_rng(2)
    base = rng.normal(0, 1, (80, 96))
    from numpy.fft import fft2, ifft2
    k = np.exp(-0.5 * ((np.fft.fftfreq(80)[:, None] * 8) ** 2
                       + (np.fft.fftfreq(96)[None, :] * 8) ** 2))
    smooth = np.real(ifft2(fft2(base) * k))
    ref = ((smooth - smooth.min()) / np.ptp(smooth) * 255).astype(np.int32)
    # build src = ref shifted by (0.5, 0) using averaging of adjacent rows
    src = ((ref[:-1] + ref[1:]) // 2)
    src = np.vstack([src, src[-1:]]).astype(np.int32)

    refp = motion.pad_ref(jnp.asarray(ref))
    pos = jnp.asarray(motion.block_positions(80, 96, 16))
    blocks = (jnp.asarray(src).reshape(5, 16, 6, 16)
              .transpose(0, 2, 1, 3).reshape(-1, 16, 16))
    full = jnp.zeros((30, 2), jnp.int32)
    mv_q = np.asarray(motion.subpel_refine(blocks, refp, pos, full, 16))
    interior = mv_q.reshape(5, 6, 2)[1:-1, 1:-1].reshape(-1, 2)
    # expect mostly (2, 0) in q4 units (0.5 px down)
    frac_right = ((interior[:, 0] == 2) & (interior[:, 1] == 0)).mean()
    assert frac_right > 0.7, (frac_right, interior[:4])


@pytest.mark.heavy
def test_gop_subpel_roundtrip_parity():
    """Subpel P-frames: decoder recon must still bit-match encoder."""
    eng = TpuEngine()
    eng.cfg.keyint = 100
    eng.start_stream()
    state = dec_mod.DecoderState()
    state.seq = eng.sequence_header(160, 96)
    for i in range(4):
        fr = make_testsrc(160, 96, i)
        payload, _ = eng.encode_next(fr, 96)
        out = dec_mod.decode_frame_payload(payload, state)
        enc_y = eng._ref[0][:96, :160]
        assert np.array_equal(enc_y, out.y.astype(np.int32)), f"frame {i}"


def test_deblock_smooths_artificial_edge():
    import jax.numpy as jnp
    from av1tpu.encoder.kernels import deblock
    rec = np.full((32, 32), 100, np.int32)
    rec[:, 16:] = 104  # small blocking step at the block edge
    out = np.asarray(deblock.deblock_plane(jnp.asarray(rec), 16, 120))
    # step reduced across the edge
    assert abs(int(out[5, 16]) - int(out[5, 15])) < 4
    # far-from-edge pixels untouched
    assert (out[:, :14] == 100).all()
    assert (out[:, 18:] == 104).all()
    # strong real edges preserved (level thresholds)
    rec2 = np.full((32, 32), 50, np.int32)
    rec2[:, 16:] = 200
    out2 = np.asarray(deblock.deblock_plane(jnp.asarray(rec2), 16, 120))
    np.testing.assert_array_equal(out2, rec2)


def test_deblock_disabled_at_low_qindex():
    import jax.numpy as jnp
    from av1tpu.encoder.kernels import deblock
    rng = np.random.default_rng(0)
    rec = rng.integers(0, 256, (32, 32)).astype(np.int32)
    out = np.asarray(deblock.deblock_plane(jnp.asarray(rec), 16, 20))
    np.testing.assert_array_equal(out, rec)  # level 0 → identity
