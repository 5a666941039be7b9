"""10-bit spec-AV1 path: device encoders at bit_depth=10 produce
standard AV1 high-bitdepth streams that libaom decodes bit-exactly
(VERDICT round-2 item 5 — a real 10-bit path, not 8-bit nv12)."""
import numpy as np
import pytest

from av1tpu.conformance import aomcodec

pytestmark = pytest.mark.skipif(not aomcodec.available(),
                                reason="libaom unavailable")


def _frames10(size, n, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.integers(64, 960, (size * 2, size * 2)).astype(np.uint16)
    out = []
    for i in range(n):
        y = base[3 * i:3 * i + size, 5 * i:5 * i + size]
        u = np.clip(512 + rng.integers(-80, 80, (size // 2, size // 2)),
                    0, 1023).astype(np.uint16)
        v = np.clip(512 + rng.integers(-80, 80, (size // 2, size // 2)),
                    0, 1023).astype(np.uint16)
        out.append((y, u, v))
    return out


def test_device_gop_10bit_bitexact_in_libaom():
    import jax
    import jax.numpy as jnp
    from av1tpu.specav1 import jax_intra, jax_inter, native, writer as W
    from av1tpu.specav1 import obu as obu_mod

    SZ, Q = 128, 80
    frames = _frames10(SZ, 3)
    mi = SZ // 4

    out = jax_intra._encode_frame(
        jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]),
        jnp.asarray(frames[0][2]), jnp.int32(Q),
        nbr=SZ // 32, nbc=SZ // 32, bit_depth=10)
    got = jax.device_get(out[3:15])
    tile = native.encode_intra32_tile(Q, mi, mi, got[3], got[4], got[5],
                                      got[0], got[1], got[2],
                                      angles=got[6],
                                      split5=tuple(got[7:12]))
    hdr = W.write_key_frame_header(SZ, SZ, Q)
    hdr.byte_align()
    tus = [obu_mod.temporal_delimiter() +
           W.write_sequence_header(SZ, SZ, bit_depth=10) +
           obu_mod.make_obu(obu_mod.OBU_FRAME, hdr.tobytes() + tile)]
    ref = out[0:3]
    recons = [tuple(np.asarray(p) for p in ref)]
    for i in range(1, 3):
        out = jax_inter._encode_frame(
            jnp.asarray(frames[i][0]), jnp.asarray(frames[i][1]),
            jnp.asarray(frames[i][2]), ref[0], ref[1], ref[2], Q, 10)
        mv8, skip, ylv, ulv, vlv = jax.device_get(out[0:5])
        spl, mv16, sk16 = jax.device_get(out[11:14])
        g = SZ // 32
        tile = native.encode_inter32_tile(
            Q, mi, mi, np.ones((g, g), np.int32),
            np.asarray(mv8).reshape(g, g, 2),
            np.asarray(skip).reshape(g, g), ylv, ulv, vlv,
            splits=np.asarray(spl).reshape(g, g),
            mvs16=np.asarray(mv16).reshape(g, g, 4, 2),
            skips16=np.asarray(sk16).reshape(g, g, 4))
        ih = W.write_inter_frame_header(SZ, SZ, Q, order_hint=i)
        ih.byte_align()
        tus.append(obu_mod.temporal_delimiter() + obu_mod.make_obu(
            obu_mod.OBU_FRAME, ih.tobytes() + tile))
        ref = out[5:8]
        recons.append(tuple(np.asarray(p) for p in ref))

    decoded = aomcodec.decode_stream(tus)
    assert len(decoded) == 3
    for i, (got_f, want) in enumerate(zip(decoded, recons)):
        assert got_f[3] == 10, f"frame {i} decoded at {got_f[3]} bits"
        for p in range(3):
            a = np.asarray(got_f[p], np.int64)
            b = np.asarray(want[p], np.int64)
            assert np.array_equal(a, b), f"frame {i} plane {p}"


@pytest.mark.heavy
def test_spec_engine_10bit_frames():
    """SpecTpuEngine end-to-end on 10-bit Frames: every payload decodes
    in libaom at 10 bits."""
    from av1tpu.spec_engine import SpecTpuEngine
    from av1tpu.utils.testsrc import testsrc2

    eng = SpecTpuEngine()
    eng.cfg.keyint = 4
    eng.start_stream()
    frames = [testsrc2(128, 96, i, bit_depth=10) for i in range(5)]
    payloads = list(eng.encode_stream(iter(frames), 96))
    assert len(payloads) == 5

    dec = aomcodec.Decoder()
    n = 0
    for payload, is_key in payloads:
        for y, u, v, bd in dec.decode(bytes(payload)):
            assert bd == 10
            assert y.shape == (96, 128)
            n += 1
    n += len(dec.flush()) if hasattr(dec, "flush") else 0
    assert n == 5


@pytest.mark.heavy
def test_y4m_10bit_source_end_to_end(tmp_path):
    """A 10-bit y4m source transcodes through the daemon-shaped engine
    into a high_bitdepth AV1 stream that libaom decodes at 10 bits
    (BASELINE config #4: the 10-bit path done natively, not through the
    reference's 8-bit nv12 squeeze)."""
    from av1tpu.media import y4m
    from av1tpu.media import mkv
    from av1tpu.media.probe import probe_file
    from av1tpu.spec_engine import SpecTpuEngine

    rng = np.random.default_rng(3)
    frames = []
    base = rng.integers(80, 940, (96 * 2, 128 * 2)).astype(np.uint16)
    for i in range(6):
        frames.append((base[2 * i:2 * i + 96, 3 * i:3 * i + 128],
                       np.full((48, 64), 512, np.uint16),
                       np.full((48, 64), 480, np.uint16)))
    src = str(tmp_path / "clip10.y4m")
    y4m.write(src, frames, fps=(24, 1), bit_depth=10)

    pr = probe_file(src)
    assert pr.video_stream.bit_depth == 10
    out = str(tmp_path / "out10.mkv")
    eng = SpecTpuEngine()
    eng.cfg.keyint = 4
    eng.transcode(src, out, pr, False)

    with open(out, "rb") as f:
        m = mkv.parse(f)
        v = [t for t in m.tracks if t.codec_id == "V_AV1"][0]
        pkts = [p for p in mkv.iter_packets(f, m)
                if p.track_number == v.number]
    assert len(pkts) == 6
    dec = aomcodec.Decoder()
    n = 0
    se = 0.0
    for i, p in enumerate(pkts):
        for y, u, v_, bd in dec.decode(bytes(p.data)):
            assert bd == 10
            assert y.shape == (96, 128)
            assert y.max() > 255  # real 10-bit range survived
            d = y.astype(np.float64) - frames[n][0].astype(np.float64)
            se += (d ** 2).mean()
            n += 1
    assert n == 6
    psnr = 10 * np.log10(1023.0 ** 2 / (se / n))
    assert psnr > 34, psnr
