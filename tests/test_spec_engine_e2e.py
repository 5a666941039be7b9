"""SpecTpuEngine end-to-end: daemon-shaped transcode producing standard
AV1, verified by the independent libaom decoder and the daemon's
decode-verify gate."""
import numpy as np
import pytest

from av1tpu.conformance import aomcodec
from av1tpu.daemon import core
from av1tpu.media import mkv
from av1tpu.media.probe import probe_file

pytestmark = pytest.mark.skipif(not aomcodec.available(),
                                reason="libaom unavailable")


@pytest.fixture()
def mp4_source(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from av1tpu.utils.testsrc import testsrc2
    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24.0,
                        (192, 128))
    assert w.isOpened()
    for i in range(10):
        f = testsrc2(192, 128, frame_index=i)
        yuv = np.stack([f.y, cv2.resize(f.u, (192, 128)),
                        cv2.resize(f.v, (192, 128))], -1)
        w.write(cv2.cvtColor(yuv, cv2.COLOR_YUV2BGR))
    w.release()
    return path


@pytest.mark.heavy
def test_spec_transcode_decodes_in_libaom(mp4_source, tmp_path):
    from av1tpu.spec_engine import SpecTpuEngine
    pr = probe_file(mp4_source)
    out = str(tmp_path / "out.mkv")
    eng = SpecTpuEngine()
    eng.cfg.keyint = 8
    eng.transcode(mp4_source, out, pr, pr.is_webrip_like)

    # the daemon's pre-replace gate passes
    ok, why = core.verify_output_av1(out)
    assert ok, why

    # every packet decodes in libaom; frame count matches
    with open(out, "rb") as f:
        m = mkv.parse(f)
        v = [t for t in m.tracks if t.codec_id == "V_AV1"][0]
        pkts = [p for p in mkv.iter_packets(f, m)
                if p.track_number == v.number]
    assert len(pkts) == 10
    dec = aomcodec.Decoder()
    frames = []
    for p in pkts:
        frames += dec.decode(bytes(p.data))
    assert len(frames) == 10
    y = np.asarray(frames[0][0])
    assert y.shape == (128, 192)


def test_spec_engine_smoke_frame():
    from av1tpu.spec_engine import SpecTpuEngine
    from av1tpu.utils.testsrc import testsrc2
    eng = SpecTpuEngine()
    payload = eng.encode_smoke_frame(testsrc2(128, 96, frame_index=0))
    dec = aomcodec.Decoder()
    out = dec.decode(bytes(payload))
    assert len(out) == 1
    assert np.asarray(out[0][0]).shape == (96, 128)


@pytest.mark.heavy
def test_spec_engine_multitile_bitexact():
    """512x512 (4 tile rows): libaom recon must equal the device recon
    bit-exactly — validates per-tile context resets, tile size fields,
    and frame-relative MV clamping in tile rows."""
    import jax
    from av1tpu.spec_engine import SpecTpuEngine
    from av1tpu.utils.testsrc import testsrc2

    eng = SpecTpuEngine()
    eng.cfg.keyint = 8
    eng.start_stream()
    frames = [testsrc2(512, 512, i) for i in range(4)]
    payloads = []
    recons = []
    for fr in frames:
        pend = eng._submit(fr, 96)
        recons.append(tuple(np.asarray(p)
                            for p in jax.device_get(eng._ref_dev)))
        payloads.append(eng._finalize(pend))

    dec = aomcodec.Decoder()
    idx = 0
    for p, k in payloads:
        for f in dec.decode(bytes(p)):
            for pl in range(3):
                assert np.array_equal(np.asarray(f[pl], np.int64),
                                      np.asarray(recons[idx][pl],
                                                 np.int64)), \
                    f"frame {idx} plane {pl}"
            idx += 1
    assert idx == 4


@pytest.mark.parametrize("wh", [(192, 112), (192, 144)])
@pytest.mark.heavy
def test_spec_engine_strip_bitexact(wh):
    """16px bottom strip (height % 32 == 16, the 720p/2160p geometry):
    true-dims streams with edge-SPLIT 16x16 V_PRED strip blocks must
    decode bit-exactly in libaom.  112 puts the strip inside the last
    SB (12 mi remainder); 144 gives it its own SB row (4 mi)."""
    import jax
    from av1tpu.spec_engine import SpecTpuEngine
    from av1tpu.utils.testsrc import testsrc2

    W, H = wh
    eng = SpecTpuEngine()
    eng.cfg.keyint = 4
    eng.cfg.chunk = 4
    eng.start_stream()
    frames = [testsrc2(W, H, i) for i in range(5)]
    payloads, recons = [], []
    for fr in frames:
        pend = eng._submit(fr, 96)
        recons.append(tuple(np.asarray(p) for p in
                            jax.device_get(eng._resolve_refs())))
        payloads.append(eng._finalize(pend))
    dec = aomcodec.Decoder()
    idx = 0
    for p, k in payloads:
        for f in dec.decode(bytes(p)):
            for pl, ss in ((0, 0), (1, 1), (2, 1)):
                a = np.asarray(f[pl], np.int64)
                b = np.asarray(recons[idx][pl],
                               np.int64)[:H >> ss, :W >> ss]
                assert a.shape == b.shape
                assert np.array_equal(a, b), f"frame {idx} plane {pl}"
            idx += 1
    assert idx == 5
