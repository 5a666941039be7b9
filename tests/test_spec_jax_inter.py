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
        (modes, mvs, skips, ylv, ulv, vlv, split3), rec_dev = \
            jax_inter.encode_interframe_device(*frames[i], ref, qindex)
        tile = native.encode_inter32_tile(qindex, size // 4, size // 4,
                                          modes, mvs, skips, ylv, ulv,
                                          vlv, splits=split3[0],
                                          mvs16=split3[1],
                                          skips16=split3[2])
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


def test_device_gop_true_dims_overhang():
    """184-tall frames: true-dims headers with a 2-mi block overhang
    (the 1080p-class edge geometry) must stay bit-exact in libaom."""
    import jax
    import jax.numpy as jnp
    from av1tpu.specav1 import jax_intra, jax_inter, native, writer as W
    from av1tpu.specav1 import obu as obu_mod

    TH, TW, PH, PW = 184, 192, 192, 192
    rng = np.random.default_rng(5)
    base = rng.integers(20, 230, (TH * 2, TW * 2)).astype(np.uint8)

    def pad(a, ph, pw):
        return np.pad(a, ((0, ph - a.shape[0]), (0, pw - a.shape[1])),
                      mode="edge")

    mi_cols, mi_rows = TW // 4, TH // 4
    tus, recons = [], []
    y = base[:TH, :TW]
    u = np.full((TH // 2, TW // 2), 120, np.uint8)
    v = np.full((TH // 2, TW // 2), 130, np.uint8)
    out = jax_intra._encode_frame(
        jnp.asarray(pad(y, PH, PW)), jnp.asarray(pad(u, PH // 2, PW // 2)),
        jnp.asarray(pad(v, PH // 2, PW // 2)), jnp.int32(80),
        nbr=PH // 32, nbc=PW // 32, bit_depth=8, th=TH, tw=TW)
    got = jax.device_get(out[3:15])
    tile = native.encode_intra32_tile(80, mi_cols, mi_rows, got[3],
                                      got[4], got[5], got[0], got[1],
                                      got[2], angles=got[6],
                                      split5=tuple(got[7:12]))
    hdr = W.write_key_frame_header(TW, TH, 80)
    hdr.byte_align()
    tus.append(obu_mod.temporal_delimiter() +
               W.write_sequence_header(TW, TH) +
               obu_mod.make_obu(obu_mod.OBU_FRAME, hdr.tobytes() +
                                bytes(tile)))
    ref = out[0:3]
    recons.append(tuple(np.asarray(p) for p in ref))
    for i in range(1, 3):
        y = base[3 * i:3 * i + TH, 5 * i:5 * i + TW]
        out = jax_inter._encode_frame(
            jnp.asarray(pad(y, PH, PW)),
            jnp.asarray(pad(u, PH // 2, PW // 2)),
            jnp.asarray(pad(v, PH // 2, PW // 2)),
            ref[0], ref[1], ref[2], 80, 8, th=TH, tw=TW)
        mv8, skip, ylv, ulv, vlv = jax.device_get(out[0:5])
        spl, mv16, sk16 = jax.device_get(out[11:14])
        gh, gw = PH // 32, PW // 32
        tile = native.encode_inter32_tile(
            80, mi_cols, mi_rows, np.ones((gh, gw), np.int32),
            np.asarray(mv8).reshape(gh, gw, 2),
            np.asarray(skip).reshape(gh, gw), ylv, ulv, vlv,
            splits=np.asarray(spl).reshape(gh, gw),
            mvs16=np.asarray(mv16).reshape(gh, gw, 4, 2),
            skips16=np.asarray(sk16).reshape(gh, gw, 4))
        ih = W.write_inter_frame_header(TW, TH, 80, order_hint=i)
        ih.byte_align()
        tus.append(obu_mod.temporal_delimiter() + obu_mod.make_obu(
            obu_mod.OBU_FRAME, ih.tobytes() + bytes(tile)))
        ref = out[5:8]
        recons.append(tuple(np.asarray(p) for p in ref))

    outd = aomcodec.decode_stream(tus)
    for i, (got_f, want) in enumerate(zip(outd, recons)):
        for p, ss in ((0, 0), (1, 1), (2, 1)):
            a = np.asarray(got_f[p], np.int64)
            b = np.asarray(want[p], np.int64)[:TH >> ss, :TW >> ss]
            assert a.shape == b.shape, (i, p, a.shape, b.shape)
            assert np.array_equal(a, b), f"frame {i} plane {p}"


def test_device_gop_static_skips():
    tus, recons = _gop(64, 3, 60, motion=(0, 0))
    out = aomcodec.decode_stream(tus)
    for i, (got, want) in enumerate(zip(out, recons)):
        for p in range(3):
            assert np.array_equal(np.asarray(got[p], np.int64),
                                  np.asarray(want[p], np.int64)), \
                f"frame {i} plane {p}"
