"""Spec CDEF conformance (spec 7.15; BASELINE config #4 names CDEF as
a required in-loop filter — internal/ffmpeg/transcode.go:119-123).

Three rings of evidence:
  1. host encoder emits enable_cdef streams whose libaom decode is
     bit-exact with our numpy cdef reference (the normative oracle);
  2. our own spec decoder applies CDEF to the same planes;
  3. the device (JAX) cdef_apply matches numpy bit-for-bit, and
     cdef_search_apply returns strengths whose application equals
     cdef_apply with those strengths.
"""
import numpy as np
import pytest

from av1tpu.conformance import aomcodec
from av1tpu.specav1 import cdef as CD
from av1tpu.specav1 import decoder as D
from av1tpu.specav1 import encode as E

needs_libaom = pytest.mark.skipif(not aomcodec.available(),
                                  reason="libaom unavailable")


def _mkframes(w, h, n, seed=7, motion=(2, 3), noise=4):
    rng = np.random.default_rng(seed)
    base = rng.integers(20, 230, (h * 2, w * 2)).astype(np.int32)
    out = []
    for i in range(n):
        dy, dx = motion[0] * i, motion[1] * i
        y = np.clip(base[dy:dy + h, dx:dx + w] +
                    rng.integers(-noise, noise + 1, (h, w)), 0, 255)
        u = np.clip(np.full((h // 2, w // 2), 118, np.int32) +
                    rng.integers(-6, 7, (h // 2, w // 2)), 0, 255)
        v = np.clip(np.full((h // 2, w // 2), 130, np.int32) +
                    rng.integers(-6, 7, (h // 2, w // 2)), 0, 255)
        out.append((y, u, v))
    return out


def _assert_bitexact(tus, recons):
    out = aomcodec.decode_stream(tus)
    assert len(out) == len(recons)
    for i, (got, want) in enumerate(zip(out, recons)):
        for p in range(3):
            a = np.asarray(got[p], np.int64)
            b = np.asarray(want[p], np.int64)
            a = a[:b.shape[0], :b.shape[1]]
            assert np.array_equal(a, b), f"frame {i} plane {p}"


STRENGTHS = [
    (4, 2, 1, 2, 1),
    (4, 4, 2, 2, 2),
    (3, 1, 0, 0, 0),
    (5, 12, 4, 8, 2),
    (4, 0, 1, 0, 0),   # secondary-only luma
]


@needs_libaom
@pytest.mark.parametrize("cdef", STRENGTHS)
def test_keyframe_cdef_bitexact(cdef):
    frames = _mkframes(96, 64, 1)
    tus, recons = E.encode_stream_host(frames, qindex=72, cdef=cdef)
    _assert_bitexact(tus, recons)


@needs_libaom
def test_gop_cdef_bitexact():
    frames = _mkframes(112, 80, 5)
    tus, recons = E.encode_stream_host(frames, qindex=88,
                                       cdef=(4, 3, 1, 2, 1))
    _assert_bitexact(tus, recons)


@needs_libaom
def test_gop_cdef_static_heavy_skip():
    # static content codes mostly skip blocks: exercises the all-skip
    # 8x8-unit exemption (spec 7.15.1)
    frames = _mkframes(128, 64, 4, motion=(0, 0), noise=1)
    tus, recons = E.encode_stream_host(frames, qindex=120,
                                       cdef=(4, 6, 2, 4, 1))
    _assert_bitexact(tus, recons)


def test_own_decoder_matches_recon():
    frames = _mkframes(96, 64, 3)
    tus, recons = E.encode_stream_host(frames, qindex=80,
                                       cdef=(4, 3, 2, 2, 1))
    got = D.decode_stream(tus)
    assert len(got) == len(recons)
    for i, (g, want) in enumerate(zip(got, recons)):
        for p in range(3):
            assert np.array_equal(np.asarray(g[p], np.int64)
                                  [:want[p].shape[0], :want[p].shape[1]],
                                  np.asarray(want[p], np.int64)), \
                f"frame {i} plane {p}"


# ---- device parity ------------------------------------------------------

def _rand_planes(w, h, seed=11, bd=8):
    rng = np.random.default_rng(seed)
    hi = (1 << bd) - 1
    y = rng.integers(0, hi + 1, (h, w)).astype(np.int32)
    u = rng.integers(0, hi + 1, (h // 2, w // 2)).astype(np.int32)
    v = rng.integers(0, hi + 1, (h // 2, w // 2)).astype(np.int32)
    return y, u, v


@pytest.mark.parametrize("cdef", [(4, 2, 1, 2, 1), (4, 0, 1, 0, 0),
                                  (5, 12, 4, 8, 2)])
@pytest.mark.parametrize("bd", [8, 10])
def test_jax_apply_matches_numpy(cdef, bd):
    from av1tpu.specav1 import jax_cdef
    import jax.numpy as jnp
    damping, yp_, ys_, up_, us_ = cdef
    w, h = 64, 64
    y, u, v = _rand_planes(w, h, bd=bd)
    rng = np.random.default_rng(5)
    skips4 = rng.integers(0, 2, (h // 4, w // 4)).astype(np.int32)
    ny, nu, nv = CD.cdef_frame((y, u, v), skips4, y_pri=yp_, y_sec=ys_,
                               uv_pri=up_, uv_sec=us_, damping=damping,
                               bit_depth=bd)
    s4 = skips4.astype(bool)
    skip8 = (s4[0::2, 0::2] & s4[1::2, 0::2] &
             s4[0::2, 1::2] & s4[1::2, 1::2])
    jy, ju, jv = jax_cdef.cdef_apply(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
        jnp.asarray(skip8), yp_, ys_, up_, us_, damping, bit_depth=bd)
    assert np.array_equal(np.asarray(jy), np.asarray(ny, np.int32))
    assert np.array_equal(np.asarray(ju), np.asarray(nu, np.int32))
    assert np.array_equal(np.asarray(jv), np.asarray(nv, np.int32))


def test_jax_search_consistent():
    """search_apply's planes == cdef_apply at the returned strengths,
    and (0,0,0,0) is returned for already-clean recon."""
    from av1tpu.specav1 import jax_cdef
    import jax.numpy as jnp
    w, h = 64, 64
    rng = np.random.default_rng(3)
    src_y, src_u, src_v = _rand_planes(w, h, seed=3)
    # noisy recon = source + ring noise, so some filtering should win
    rec_y = np.clip(src_y + rng.integers(-6, 7, src_y.shape), 0, 255)
    rec_u = np.clip(src_u + rng.integers(-4, 5, src_u.shape), 0, 255)
    rec_v = np.clip(src_v + rng.integers(-4, 5, src_v.shape), 0, 255)
    skip8 = np.zeros((h // 8, w // 8), np.int32)
    fy, fu, fv, st = jax_cdef.cdef_search_apply(
        jnp.asarray(rec_y), jnp.asarray(rec_u), jnp.asarray(rec_v),
        jnp.asarray(src_y), jnp.asarray(src_u), jnp.asarray(src_v),
        jnp.asarray(skip8), 4)
    st = [int(x) for x in np.asarray(st)]
    ay, au, av = jax_cdef.cdef_apply(
        jnp.asarray(rec_y), jnp.asarray(rec_u), jnp.asarray(rec_v),
        jnp.asarray(skip8), st[0], st[1], st[2], st[3], 4)
    assert np.array_equal(np.asarray(fy), np.asarray(ay))
    assert np.array_equal(np.asarray(fu), np.asarray(au))
    assert np.array_equal(np.asarray(fv), np.asarray(av))
    # identical recon==source: the (0,0) candidate must win
    _, _, _, st0 = jax_cdef.cdef_search_apply(
        jnp.asarray(src_y), jnp.asarray(src_u), jnp.asarray(src_v),
        jnp.asarray(src_y), jnp.asarray(src_u), jnp.asarray(src_v),
        jnp.asarray(skip8), 4)
    assert [int(x) for x in np.asarray(st0)] == [0, 0, 0, 0]
