"""Inter coding tests: motion search, MC, GOP round-trips, tile codec."""

import numpy as np
import pytest

from av1tpu.legacy import decoder as dec_mod
from av1tpu.legacy import entropy_tile as tile_codec
from av1tpu.encoder.kernels import motion
from av1tpu.engine_tpu import TpuEngine
from av1tpu.utils.testsrc import testsrc2 as make_testsrc


def _psnr(a, b):
    err = a.astype(np.float64) - b.astype(np.float64)
    mse = (err ** 2).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255 ** 2 / mse)


def test_tss_finds_known_shift():
    """A reference shifted by a known offset must be found exactly."""
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 256, (96, 128), np.int32)
    dy, dx = 5, -7
    src = np.roll(np.roll(ref, -dy, axis=0), -dx, axis=1)
    mvs = np.asarray(motion.tss_search(
        jnp.asarray(src), motion.pad_ref(jnp.asarray(ref)), 16))
    # interior blocks (roll wraps at edges) must find (dy, dx)
    rows, cols = 96 // 16, 128 // 16
    mv_grid = mvs.reshape(rows, cols, 2)
    interior = mv_grid[1:-1, 1:-1]
    assert (interior[..., 0] == dy).all()
    assert (interior[..., 1] == dx).all()


def test_gather_blocks_clamps_out_of_frame():
    import jax.numpy as jnp
    ref = jnp.arange(32 * 32, dtype=jnp.int32).reshape(32, 32)
    refp = motion.pad_ref(ref)
    pos = jnp.array([[0, 0]], jnp.int32)
    huge = jnp.array([[-500, -500]], jnp.int32)  # beyond padding
    blk = np.asarray(motion.gather_blocks(refp, pos, huge, 16))
    assert blk.shape == (1, 16, 16)
    assert (blk == blk[0, 0, 0]).all()  # clamped into replicated corner


def test_chroma_mv_rounds_toward_zero():
    import jax.numpy as jnp
    mv = jnp.array([[-3, 3], [-4, 4], [1, -1]], jnp.int32)
    out = np.asarray(motion.chroma_mv(mv))
    np.testing.assert_array_equal(out, [[-1, 1], [-2, 2], [0, 0]])


def test_inter_tile_roundtrip():
    rng = np.random.default_rng(1)
    B = 30
    skips = (rng.random(B) < 0.4).astype(np.uint8)
    mvs = rng.integers(-31, 32, (B, 2)).astype(np.int32)
    y = rng.integers(-5, 6, (B, 256)).astype(np.int32)
    u = rng.integers(-3, 4, (B, 64)).astype(np.int32)
    v = rng.integers(-3, 4, (B, 64)).astype(np.int32)
    y[skips == 1] = 0
    u[skips == 1] = 0
    v[skips == 1] = 0
    data = tile_codec.encode_tile_inter(skips, mvs, y, u, v)
    s2, m2, y2, u2, v2, _refs, _txs = tile_codec.decode_tile_inter(data, B)
    np.testing.assert_array_equal(s2, skips)
    np.testing.assert_array_equal(m2, mvs)
    np.testing.assert_array_equal(y2, y)
    np.testing.assert_array_equal(u2, u)
    np.testing.assert_array_equal(v2, v)


def test_intra_tile_roundtrip():
    rng = np.random.default_rng(2)
    B = 24
    skips = (rng.random(B) < 0.3).astype(np.uint8)
    ym = rng.integers(0, 7, B).astype(np.uint8)
    uvm = np.zeros(B, np.uint8)
    y = rng.integers(-2000, 2000, (B, 256)).astype(np.int32)
    y[rng.random((B, 256)) < 0.8] = 0  # sparse
    u = np.zeros((B, 64), np.int32)
    v = np.zeros((B, 64), np.int32)
    y[skips == 1] = 0
    data = tile_codec.encode_tile_intra(skips, ym, uvm, y, u, v)
    s2, ym2, uvm2, y2, u2, v2 = tile_codec.decode_tile_intra(data, B)
    np.testing.assert_array_equal(ym2, ym)
    np.testing.assert_array_equal(y2, y)
    np.testing.assert_array_equal(s2, skips)


@pytest.mark.heavy
def test_gop_roundtrip_and_parity():
    """5-frame GOP: every decoded frame bit-matches the encoder's recon."""
    eng = TpuEngine()
    eng.cfg.keyint = 100
    eng.start_stream()
    state = dec_mod.DecoderState()
    state.seq = eng.sequence_header(160, 96)
    key_size = None
    for i in range(5):
        fr = make_testsrc(160, 96, i)
        payload, is_key = eng.encode_next(fr, 96)
        assert is_key == (i == 0)
        if i == 0:
            key_size = len(payload)
        out = dec_mod.decode_frame_payload(payload, state)
        enc_y = eng._ref[0][:96, :160]
        assert np.array_equal(enc_y, out.y.astype(np.int32)), f"frame {i}"
        assert _psnr(out.y, fr.y) > 34
    # P-frames meaningfully smaller than the keyframe
    last_payload, _ = eng.encode_next(make_testsrc(160, 96, 5), 96)
    assert len(last_payload) < key_size


@pytest.mark.heavy
def test_keyint_forces_keyframes():
    eng = TpuEngine()
    eng.cfg.keyint = 3
    eng.start_stream()
    kinds = []
    for i in range(7):
        _, is_key = eng.encode_next(make_testsrc(96, 64, i), 120)
        kinds.append(is_key)
    assert kinds == [True, False, False, True, False, False, True]


def test_static_scene_mostly_skips():
    """A static scene's P-frame should be tiny (skip-dominated)."""
    eng = TpuEngine()
    eng.cfg.keyint = 100
    eng.start_stream()
    fr = make_testsrc(160, 96, 0)
    key, _ = eng.encode_next(fr, 96)
    p, _ = eng.encode_next(fr, 96)  # identical frame
    assert len(p) < len(key) / 8


def test_gate_rate_controller():
    from av1tpu.encoder.ratectrl import GateRateController
    rc = GateRateController(base_qindex=96, target_bits=100_000,
                            total_frames=100, keyint=10)
    # first GOP at the ladder point
    assert rc.qindex_for(0) == 96
    # massively overshooting -> q rises at the next GOP boundary
    for i in range(10):
        rc.record(5000)  # 50k bits in 10 frames -> projected 500k vs 100k
    q2 = rc.qindex_for(10)
    assert q2 > 96
    assert q2 <= 96 + GateRateController.MAX_BOOST
    # quality floor: undershooting can only relax back to base, not below
    rc2 = GateRateController(96, 1_000_000_000, 100, 10)
    for i in range(10):
        rc2.record(10)
    assert rc2.qindex_for(10) == 96


def test_cdef_preserves_edges_smooths_ringing():
    import jax.numpy as jnp
    from av1tpu.encoder.kernels import cdef
    rng = np.random.default_rng(0)
    # strong vertical edge + small noise (kept inside [0,255]: cdef
    # clips to the sample range like any recon plane)
    base = np.full((32, 32), 30, np.int32)
    base[:, 16:] = 220
    noisy = base + rng.integers(-3, 4, base.shape)
    out = np.asarray(cdef.cdef_plane(jnp.asarray(noisy), 120, 8))
    # edge magnitude preserved
    assert abs(int(out[:, 16].mean()) - int(out[:, 15].mean())) > 150
    # noise variance reduced away from the edge
    assert out[:, :12].std() <= noisy[:, :12].std()
    # strength 0 (low q) is identity
    out0 = np.asarray(cdef.cdef_plane(jnp.asarray(noisy), 30, 8))
    np.testing.assert_array_equal(out0, noisy)


@pytest.mark.heavy
def test_multitile_gop_parity():
    """tile_rows_log2=2 → 4 independent tile rows; decode bit-matches."""
    eng = TpuEngine()
    eng.cfg.keyint = 100
    eng.cfg.tile_rows_log2 = 2
    eng.start_stream()
    state = dec_mod.DecoderState()
    state.seq = eng.sequence_header(160, 128)
    from av1tpu.media import obu as obu_mod
    for i in range(4):
        fr = make_testsrc(160, 128, i)   # 8 block rows → 4 tiles of 2
        payload, is_key = eng.encode_next(fr, 96)
        # header carries the tile configuration
        obus = obu_mod.parse_obus(payload)
        fh, _ = obu_mod.FrameHeader.parse(obus[0][1])
        assert fh.tile_rows_log2 == 2
        out = dec_mod.decode_frame_payload(payload, state)
        enc_y = eng._ref[0][:128, :160]
        assert np.array_equal(enc_y, out.y.astype(np.int32)), f"frame {i}"


def test_multitile_clamps_to_divisor():
    """Requested tiles clamp to a legal divisor of the block rows."""
    eng = TpuEngine()
    eng.cfg.tile_rows_log2 = 3  # 8 tiles requested
    # 96px → 6 block rows: 8∤6, 4∤6, 2|6 → 2 tiles
    assert eng._tile_rows_for(96, 16) == 2
    assert eng._tile_rows_for(128, 16) == 8


def test_speed_preset_disables_subpel():
    """speed >= 7 produces full-pel MVs only (q4 multiples of 4)."""
    eng = TpuEngine()
    eng.cfg.keyint = 100
    eng.cfg.speed = 8
    eng.start_stream()
    eng.encode_next(make_testsrc(160, 96, 0), 96)
    payload, _ = eng.encode_next(make_testsrc(160, 96, 1), 96)
    from av1tpu.media import obu as obu_mod
    from av1tpu.legacy import entropy_tile as tc
    obus = obu_mod.parse_obus(payload)
    fh, hlen = obu_mod.FrameHeader.parse(obus[0][1])
    assert not fh.cdef_on and fh.lr_mode == 0  # aux filters off
    _, mvs, *_ = tc.decode_tile_inter(obus[0][1][hlen:], 60)
    assert (mvs % 4 == 0).all()


def test_scene_cut_forces_keyframe():
    eng = TpuEngine()
    eng.cfg.keyint = 1000
    eng.start_stream()
    _, k0 = eng.encode_next(make_testsrc(160, 96, 0), 96)
    _, k1 = eng.encode_next(make_testsrc(160, 96, 1), 96)
    # hard cut: inverted content
    fr = make_testsrc(160, 96, 2)
    fr.y[:] = 255 - fr.y
    _, k2 = eng.encode_next(fr, 96)
    assert (k0, k1, k2) == (True, False, True)


@pytest.mark.heavy
def test_block32_gop_parity():
    """32x32 transform blocks (auto at HD+): encode/decode bit parity."""
    eng = TpuEngine()
    eng.cfg.keyint = 100
    eng.cfg.block_log2 = 5
    eng.start_stream()
    state = dec_mod.DecoderState()
    state.seq = eng.sequence_header(192, 128)
    from av1tpu.media import obu as obu_mod
    for i in range(3):
        fr = make_testsrc(192, 128, i)
        payload, _ = eng.encode_next(fr, 96)
        obus = obu_mod.parse_obus(payload)
        fh, _ = obu_mod.FrameHeader.parse(obus[0][1])
        assert fh.luma_block_log2 == 5
        out = dec_mod.decode_frame_payload(payload, state)
        enc_y = eng._ref[0][:128, :192]
        assert np.array_equal(enc_y, out.y.astype(np.int32)), f"frame {i}"


def test_auto_block_selection():
    eng = TpuEngine()
    from av1tpu.utils.testsrc import Frame
    small = make_testsrc(320, 192, 0)
    assert eng._block_for(small) == 16
    big = Frame(y=np.zeros((720, 1280), np.uint8),
                u=np.zeros((360, 640), np.uint8),
                v=np.zeros((360, 640), np.uint8))
    assert eng._block_for(big) == 32


@pytest.mark.heavy
def test_chunked_stream_bit_identical_and_decodable():
    """cfg.chunk batches P frames into one lax.scan dispatch; the
    bitstream must be byte-identical to the unchunked path, including
    around mid-stream keyframes (scene cut splits a chunk)."""
    frames = [make_testsrc(192, 128, i) for i in range(10)]
    # inject a hard scene cut at frame 6 (forces a key mid-buffer)
    cut = make_testsrc(192, 128, 6)
    cut.y[:] = 255 - cut.y
    frames[6] = cut

    def run(chunk):
        eng = TpuEngine()
        eng.cfg.keyint = 120
        eng.cfg.chunk = chunk
        eng.start_stream()
        return [(p, k) for p, k in eng.encode_stream(frames, 96)]

    a, b = run(1), run(4)
    assert len(a) == len(b) == 10
    assert [k for _, k in b] == [k for _, k in a]
    # the single inverted frame is a FLASH (non-ref inter), not a
    # scene-cut keyframe: only the stream-opening key remains
    assert sum(k for _, k in b) == 1
    assert all(x == y for (x, _), (y, _) in zip(a, b))

    # chunked stream decodes bit-exactly against the encoder recon
    eng = TpuEngine()
    eng.cfg.keyint = 120
    eng.cfg.chunk = 4
    eng.start_stream()
    state = dec_mod.DecoderState()
    state.seq = eng.sequence_header(192, 128)
    payloads = list(eng.encode_stream(frames, 96))
    for payload, _k in payloads:
        out = dec_mod.decode_frame_payload(payload, state)
    enc_y = np.asarray(eng._ref[0])[:128, :192]
    assert np.array_equal(enc_y, out.y.astype(np.int32))


def test_two_ref_golden_reveal():
    """speed<=4 adds the GOP keyframe as a second reference: blocks
    revealed from behind a moving occluder predict from golden and the
    stream must decode bit-exactly against the encoder recon."""
    rng = np.random.default_rng(5)
    W, H = 192, 128
    bg = rng.integers(40, 220, (H, W)).astype(np.uint8)
    bg = ((bg.astype(int) + np.roll(bg, 1, 0) + np.roll(bg, 1, 1)) // 3
          ).astype(np.uint8)
    from av1tpu.utils.testsrc import Frame
    frames = []
    for i in range(8):
        y = bg.copy()
        x0 = 16 + i * 16
        y[32:96, x0:x0 + 48] = 230  # occluder marches right
        u = (y[::2, ::2] // 2 + 40).astype(np.uint8)
        frames.append(Frame(y=y, u=u, v=u.copy()))

    def run(speed):
        eng = TpuEngine()
        eng.cfg.keyint = 120
        eng.cfg.speed = speed
        eng.start_stream()
        payloads = list(eng.encode_stream(frames, 96))
        return eng, payloads

    _, p1 = run(6)
    eng, p2 = run(4)
    bytes1 = sum(len(p) for p, _ in p1)
    bytes2 = sum(len(p) for p, _ in p2)
    assert bytes2 < bytes1 * 0.95  # golden ref saves on reveals

    # golden actually selected once the revealed band exists in the key
    from av1tpu.legacy import entropy_tile as tc
    from av1tpu.media import obu as obu_mod
    obu_payload = obu_mod.parse_obus(p2[6][0])[0][1]
    fh, hl = obu_mod.FrameHeader.parse(obu_payload)
    assert fh.two_ref
    *_, refs, _txs = tc.decode_tile_inter(obu_payload[hl:], 96, 16, 8,
                                          use_refs=True)
    assert refs.sum() > 0  # some blocks predict from golden
    # the full two-ref stream decodes bit-exactly vs the encoder recon
    state = dec_mod.DecoderState()
    state.seq = eng.sequence_header(W, H)
    out = None
    for payload, _k in p2:
        out = dec_mod.decode_frame_payload(payload, state)
    enc_y = np.asarray(eng._ref[0])[:H, :W]
    assert np.array_equal(enc_y, out.y.astype(np.int32))


def test_tx_type_signaling_roundtrip():
    """Inter luma signals DCT/ADST/IDTX per block; the decoder applies
    the signaled inverse bit-exactly and the selection is non-trivial."""
    frames = [make_testsrc(192, 128, i) for i in range(4)]
    eng = TpuEngine()
    eng.cfg.keyint = 120
    eng.cfg.speed = 5  # transform selection enabled at speed <= 5
    eng.start_stream()
    payloads = list(eng.encode_stream(frames, 96))
    from av1tpu.legacy import entropy_tile as tc
    from av1tpu.media import obu as obu_mod
    hist = np.zeros(3, int)
    for p, is_key in payloads:
        if is_key:
            continue
        pl = obu_mod.parse_obus(p)[0][1]
        fh, hl = obu_mod.FrameHeader.parse(pl)
        *_, txs = tc.decode_tile_inter(pl[hl:], 96, 16, 8)
        hist += np.bincount(txs, minlength=3)
    assert hist[0] > 0 and hist[1:].sum() > 0  # selection is used
    state = dec_mod.DecoderState()
    state.seq = eng.sequence_header(192, 128)
    for p, _k in payloads:
        out = dec_mod.decode_frame_payload(p, state)
    enc_y = np.asarray(eng._ref[0])[:128, :192]
    assert np.array_equal(enc_y, out.y.astype(np.int32))


def test_flash_frame_non_reference():
    """A one-frame scene flash is coded as a NON-reference inter frame
    (refresh=0) instead of two keyframes; the next frame predicts from
    the pre-flash reference."""
    from av1tpu.media import obu as obu_mod
    frames = [make_testsrc(192, 128, i) for i in range(10)]
    flash = make_testsrc(192, 128, 6)
    flash.y[:] = 255 - flash.y
    frames[6] = flash
    eng = TpuEngine()
    eng.cfg.keyint = 120
    eng.start_stream()
    payloads = list(eng.encode_stream(frames, 96))
    keys = sum(1 for _p, k in payloads if k)
    assert keys == 1  # no scene-cut double-key around the flash
    fh6, _ = obu_mod.FrameHeader.parse(
        obu_mod.parse_obus(payloads[6][0])[0][1])
    fh7, _ = obu_mod.FrameHeader.parse(
        obu_mod.parse_obus(payloads[7][0])[0][1])
    assert not fh6.refresh          # the flash is a non-reference frame
    assert fh7.refresh
    assert len(payloads[7][0]) < len(payloads[6][0]) / 2  # cheap resume
    # whole stream decodes bit-exactly (decoder skips the ref update)
    state = dec_mod.DecoderState()
    state.seq = eng.sequence_header(192, 128)
    for p, _k in payloads:
        out = dec_mod.decode_frame_payload(p, state)
    enc_y = np.asarray(eng._ref[0])[:128, :192]
    assert np.array_equal(enc_y, out.y.astype(np.int32))


def test_persistent_scene_cut_still_keys():
    """A REAL scene change (persists beyond one frame) still forces a
    keyframe — the flash classifier only suppresses one-frame events."""
    frames = [make_testsrc(192, 128, i) for i in range(8)]
    for i in range(5, 8):  # scene changes at 5 and stays changed
        frames[i].y[:] = 255 - frames[i].y
    eng = TpuEngine()
    eng.cfg.keyint = 120
    eng.start_stream()
    payloads = list(eng.encode_stream(frames, 96))
    kinds = [k for _, k in payloads]
    assert kinds[0] is True and kinds[5] is True  # opening + scene key
    assert sum(kinds) == 2
