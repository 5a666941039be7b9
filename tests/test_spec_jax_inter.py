"""Device (JAX) spec-AV1 inter encoder: GOPs through the native tile
writer must decode bit-exactly in libaom (SURVEY §7 step C/D oracle)."""
import numpy as np
import pytest

from av1tpu.conformance import aomcodec

pytestmark = pytest.mark.skipif(not aomcodec.available(),
                                reason="libaom unavailable")


def _gop(size, nframes, qindex, seed=5, motion=(3, 5)):
    import jax.numpy as jnp
    from av1tpu.specav1 import jax_intra, jax_inter, native, writer as W

    rng = np.random.default_rng(seed)
    base = rng.integers(20, 230, (size * 2, size * 2)).astype(np.uint8)
    frames = []
    for i in range(nframes):
        y = base[motion[0] * i:motion[0] * i + size,
                 motion[1] * i:motion[1] * i + size]
        u = np.clip(128 + rng.integers(-20, 20, (size // 2, size // 2)),
                    0, 255).astype(np.uint8)
        v = np.clip(128 + rng.integers(-20, 20, (size // 2, size // 2)),
                    0, 255).astype(np.uint8)
        frames.append((y, u, v))

    tu, rec_kf = jax_intra.encode_keyframe_device(*frames[0], qindex)
    tus, recons = [tu], [tuple(np.asarray(p) for p in rec_kf)]
    ref = tuple(jnp.asarray(np.asarray(p, np.int32)) for p in rec_kf)
    for i in range(1, nframes):
        (modes, mvs, skips, ylv, ulv, vlv), rec_dev = \
            jax_inter.encode_interframe_device(*frames[i], ref, qindex)
        tile = native.encode_inter32_tile(qindex, size // 4, size // 4,
                                          modes, mvs, skips, ylv, ulv, vlv)
        tus.append(W.assemble_interframe(size, size, qindex, tile,
                                         order_hint=i & 127))
        recons.append(tuple(np.asarray(p) for p in rec_dev))
        ref = rec_dev
    return tus, recons


def test_device_gop_bitexact():
    tus, recons = _gop(128, 4, 80)
    out = aomcodec.decode_stream(tus)
    assert len(out) == len(recons)
    for i, (got, want) in enumerate(zip(out, recons)):
        for p in range(3):
            assert np.array_equal(np.asarray(got[p], np.int64),
                                  np.asarray(want[p], np.int64)), \
                f"frame {i} plane {p}"


def test_device_gop_static_skips():
    tus, recons = _gop(64, 3, 60, motion=(0, 0))
    out = aomcodec.decode_stream(tus)
    for i, (got, want) in enumerate(zip(out, recons)):
        for p in range(3):
            assert np.array_equal(np.asarray(got[p], np.int64),
                                  np.asarray(want[p], np.int64)), \
                f"frame {i} plane {p}"
