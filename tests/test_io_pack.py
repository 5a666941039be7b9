"""Delta source-upload packing (encoder/io_pack.py).

The chunk upload path must be bit-LOSSLESS: the packed-delta program
and the raw program must produce byte-identical bitstreams.  These
tests pin (1) the pack/unpack roundtrip (both predictors, outliers,
the over-cap fallback) and (2) engine-level stream equality with the
packed path actually engaged.
"""
import numpy as np
import pytest

from av1tpu.encoder import io_pack
from av1tpu.utils import testsrc


def _planes(f):
    return (f.y, f.u, f.v)


def _unpack(r, base, k, ph, pw):
    import jax.numpy as jnp
    nib, ep, ev, modes = r
    return io_pack.unpack_chunk(
        jnp.asarray(nib), jnp.asarray(ep), jnp.asarray(ev),
        jnp.asarray(modes), *[jnp.asarray(b) for b in base], k, ph, pw)


@pytest.mark.parametrize("k", [1, 3, 4])
def test_roundtrip_testsrc(k):
    fr = [testsrc.testsrc2(320, 192, i) for i in range(k + 1)]
    base = _planes(fr[0])
    chunk = [_planes(f) for f in fr[1:]]
    ph, pw = fr[0].y.shape
    r = io_pack.pack_chunk(chunk, base, cap=300000)
    assert r is not None
    ys, us, vs = _unpack(r, base, k, ph, pw)
    for i in range(k):
        assert np.array_equal(np.asarray(ys[i]), chunk[i][0])
        assert np.array_equal(np.asarray(us[i]), chunk[i][1])
        assert np.array_equal(np.asarray(vs[i]), chunk[i][2])


def test_roundtrip_outliers_and_modes():
    """Hand-built content: Y smooth temporally (mode 0), chroma a
    horizontal gradient (mode 1), plus scattered hard outliers that
    must ride the exception list exactly."""
    rng = np.random.default_rng(7)
    ph, pw = 64, 128
    base_y = np.full((ph, pw), 100, np.uint8)
    grad = (np.arange(pw // 2, dtype=np.uint8) * 3)[None, :]
    base_u = np.broadcast_to(grad, (ph // 2, pw // 2)).copy()
    base_v = base_u.copy()
    chunk = []
    cur = (base_y, base_u, base_v)
    for i in range(3):
        y = (cur[0].astype(np.int16) + rng.integers(-3, 4, cur[0].shape)) % 256
        # 40 hard outliers per frame
        pos = rng.integers(0, y.size, 40)
        y.reshape(-1)[pos] = rng.integers(0, 256, 40)
        u = ((base_u.astype(np.int16) + i) % 256).astype(np.uint8)
        v = ((base_v.astype(np.int16) + 200 * i) % 256).astype(np.uint8)
        cur = (y.astype(np.uint8), u, v)
        chunk.append(cur)
    base = (base_y, base_u, base_v)
    r = io_pack.pack_chunk(chunk, base)
    assert r is not None
    ys, us, vs = _unpack(r, base, 3, ph, pw)
    for i in range(3):
        assert np.array_equal(np.asarray(ys[i]), chunk[i][0])
        assert np.array_equal(np.asarray(us[i]), chunk[i][1])
        assert np.array_equal(np.asarray(vs[i]), chunk[i][2])


def test_over_cap_falls_back():
    rng = np.random.default_rng(0)
    ph, pw = 64, 128
    mk = lambda: (rng.integers(0, 256, (ph, pw), np.uint8),
                  rng.integers(0, 256, (ph // 2, pw // 2), np.uint8),
                  rng.integers(0, 256, (ph // 2, pw // 2), np.uint8))
    base = mk()
    assert io_pack.pack_chunk([mk(), mk()], base) is None


def _smooth_frames(n, w=128, h=96):
    """Content whose deltas all fit one nibble: the packed path must
    engage (no fallback)."""
    xs = np.arange(w, dtype=np.int32)[None, :]
    frames = []
    for i in range(n):
        y = ((xs // 16 + i) % 200 + 20).astype(np.uint8)
        y = np.broadcast_to(y, (h, w)).copy()
        u = np.full((h // 2, w // 2), (100 + 2 * i) % 256, np.uint8)
        v = np.full((h // 2, w // 2), (60 + i) % 256, np.uint8)
        frames.append(testsrc.Frame(y, u, v))
    return frames


@pytest.mark.heavy
def test_engine_stream_identical_packed_vs_raw(monkeypatch):
    """The flagship contract: delta_upload changes H2D bytes, not one
    bit of the bitstream."""
    from av1tpu import config as config_mod
    from av1tpu.spec_engine import SpecTpuEngine

    frames = _smooth_frames(7)

    def run(delta, record=None):
        cfg = config_mod.TpuEncoderConfig(chunk=3, keyint=100,
                                          delta_upload=delta,
                                          self_test=False)
        eng = SpecTpuEngine(cfg)
        eng.start_stream()
        return [p for p, _ in eng.encode_stream(list(frames), 96)]

    calls = []
    real_pack = io_pack.pack_chunk

    def spy(planes, base, cap=None, bit_depth=8):
        r = real_pack(planes, base, cap, bit_depth)
        calls.append(r is not None)
        return r

    monkeypatch.setattr(io_pack, "pack_chunk", spy)
    packed = run(True)
    monkeypatch.setattr(io_pack, "pack_chunk", real_pack)
    raw = run(False)

    assert calls and all(calls), "packed path never engaged"
    assert len(packed) == len(raw) == 7
    for a, b in zip(packed, raw):
        assert a == b


@pytest.mark.parametrize("k", [1, 3])
def test_roundtrip_10bit(k):
    fr = [testsrc.testsrc2(320, 192, i, bit_depth=10)
          for i in range(k + 1)]
    base = _planes(fr[0])
    chunk = [_planes(f) for f in fr[1:]]
    ph, pw = fr[0].y.shape
    r = io_pack.pack_chunk(chunk, base, cap=500000, bit_depth=10)
    assert r is not None
    import jax.numpy as jnp
    nib, ep, ev, modes = r
    assert ev.dtype == np.uint16
    ys, us, vs = io_pack.unpack_chunk(
        jnp.asarray(nib), jnp.asarray(ep), jnp.asarray(ev),
        jnp.asarray(modes), *[jnp.asarray(b) for b in base], k, ph, pw,
        bit_depth=10)
    for i in range(k):
        assert np.array_equal(np.asarray(ys[i]), chunk[i][0])
        assert np.array_equal(np.asarray(us[i]), chunk[i][1])
        assert np.array_equal(np.asarray(vs[i]), chunk[i][2])


def test_sharded_10bit_stream_identical_to_single_chip(monkeypatch):
    """VERDICT r4 item 6: the packed-delta upload composes with
    striping AND 10-bit — a 4-stripe 10-bit chunked encode emits the
    byte-identical stream of the single-chip encode, with the packed
    path actually engaged."""
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    engaged = []
    real_pack = io_pack.pack_chunk

    def spy(planes, base, cap=None, bit_depth=8):
        r = real_pack(planes, base, cap, bit_depth)
        engaged.append(r is not None)
        return r

    monkeypatch.setattr(io_pack, "pack_chunk", spy)
    from av1tpu import config as config_mod
    from av1tpu.spec_engine import SpecTpuEngine

    # smooth 10-bit content (noise-free: the nibble window covers the
    # deltas, so the packed path engages instead of falling back raw)
    yy, xx = np.mgrid[0:256, 0:192].astype(np.float64)
    frames = []
    from av1tpu.utils.testsrc import Frame
    for i in range(4):
        y = (512 + 340 * np.sin(xx / 53 + i * .2) *
             np.cos(yy / 41 - i * .15)).clip(0, 1023)
        u = (512 + 200 * np.sin(yy[::2, ::2] / 37 + i * .1)).clip(0, 1023)
        v = np.full((128, 96), 480 + 4 * i, np.uint16)
        frames.append(Frame(y=y.astype(np.uint16),
                            u=u.astype(np.uint16), v=v,
                            bit_depth=10))

    def run(chips):
        cfg = config_mod.TpuEncoderConfig(chunk=3, keyint=100,
                                          delta_upload=True,
                                          self_test=False)
        cfg.num_chips = chips
        eng = SpecTpuEngine(cfg)
        eng.start_stream()
        return [p for p, _ in eng.encode_stream(list(frames), 96)]

    single = run(0)
    engaged.clear()
    striped = run(4)
    assert engaged and all(engaged), \
        "packed-delta upload must engage under striping"
    assert len(single) == len(striped) == 4
    for i, (a, b) in enumerate(zip(single, striped)):
        assert a == b, f"payload {i} differs under striping"
