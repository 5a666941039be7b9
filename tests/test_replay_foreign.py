"""Foreign-stream replay: libaom-ENCODED streams decode bit-exactly in
our spec decoder (the reverse conformance direction — SURVEY §4/§7's
independent-oracle strategy, both ways).

Streams are generated with tools outside the decoder's current scope
disabled (CDEF/restoration/OBMC/warped/global motion/palette/intrabc/
dual filter/compound modes) and error-resilient so every inter frame
depends only on the previous one.  Intra frames seed the reference
slots from libaom's own reconstruction so inter replay isolates the
inter decode path.
"""
import numpy as np
import pytest

from av1tpu.conformance import aomcodec

pytestmark = pytest.mark.skipif(not aomcodec.available(),
                                reason="libaom unavailable")

OPTS = {
    "error-resilient": "1",
    "enable-cdef": "0", "enable-restoration": "0",
    "enable-obmc": "0", "enable-warped-motion": "0",
    "enable-global-motion": "0",
    "enable-filter-intra": "0", "enable-cfl-intra": "0",
    "enable-palette": "0", "enable-intrabc": "0",
    "enable-dual-filter": "0",
    "enable-interintra-comp": "0", "enable-masked-comp": "0",
    "enable-dist-wtd-comp": "0", "enable-smooth-interintra": "0",
    "enable-ref-frame-mvs": "0",
    "enable-ab-partitions": "0", "enable-1to4-partitions": "0",
    "enable-rect-partitions": "0",
    "min-partition-size": "16",
    "aq-mode": "0", "deltaq-mode": "0",
    "max-reference-frames": "3",
    "enable-keyframe-filtering": "0",
}


def _gen_stream(frames, w, h, cq, cpu=9):
    enc = aomcodec.Encoder(w, h, cpu_used=cpu, cq_level=cq, threads=1,
                           kf_max_dist=9999)
    enc.set_options(OPTS)
    tus = []
    for (y, u, v) in frames:
        tus += enc.encode(y, u, v)
    tus += enc.flush()
    enc.close()
    return tus


def _frames(w, h, n, seed=0, motion=(2, 3), noise=2):
    rng = np.random.default_rng(seed)
    base = rng.integers(20, 235, (h * 2, w * 2)).astype(np.int32)
    out = []
    for i in range(n):
        dy, dx = motion[0] * i, motion[1] * i
        y = np.clip(base[dy:dy + h, dx:dx + w] +
                    rng.integers(-noise, noise + 1, (h, w)), 0, 255)
        u = np.clip(128 + rng.integers(-20, 20, (h // 2, w // 2)), 0, 255)
        v = np.clip(128 + rng.integers(-20, 20, (h // 2, w // 2)), 0, 255)
        out.append((y.astype(np.uint8), u.astype(np.uint8),
                    v.astype(np.uint8)))
    return out


def _replay(tus):
    """Decode every frame with our decoder; intra frames seed reference
    slots from libaom recon.  Returns list of per-frame mismatch info
    (empty = clean)."""
    from av1tpu.specav1 import decoder as specdec
    from av1tpu.specav1 import headers, obu

    ref_out = aomcodec.decode_stream(tus)
    d = specdec.Decoder()
    d.ignore_loop_filter = True
    bad = []
    fidx = 0
    for tu in tus:
        for o in obu.parse_obus(bytes(tu)):
            if o.type == obu.OBU_SEQUENCE_HEADER:
                d.seq = headers.parse_sequence_header(o.payload)
            elif o.type == obu.OBU_FRAME:
                h = headers.parse_frame_header(o.payload, d.seq)
                if h.frame_is_intra():
                    # verify the keyframe decode too, then seed from
                    # libaom's recon (removes error accumulation)
                    out = d._decode_frame_obu(o.payload)
                    got = out[0]
                    want = ref_out[fidx]
                    for p in range(3):
                        a = np.asarray(got[p], np.int64)
                        b = np.asarray(want[p], np.int64)
                        if not np.array_equal(a[:b.shape[0], :b.shape[1]],
                                              b):
                            bad.append((fidx, p, "intra"))
                    planes = tuple(np.asarray(p) for p in want)
                    for i in range(8):
                        if h.refresh_frame_flags & (1 << i):
                            d.ref_frames[i] = planes
                            d.ref_slot_meta[i] = (
                                planes, planes[0].shape[1],
                                planes[0].shape[0])
                    fidx += 1
                    continue
                td_holder = {}
                out = d._decode_frame_obu(o.payload, _td_out=td_holder)
                got, want = out[0], ref_out[fidx]
                lf_on = any(h.lf.level)
                td = td_holder.get("td")
                for p in range(3):
                    a = np.asarray(got[p], np.int64)
                    b = np.asarray(want[p], np.int64)
                    a = a[:b.shape[0], :b.shape[1]]
                    if lf_on and td is not None:
                        # our replay skips the (foreign, mixed-grid)
                        # loop filter: compare pixels the filter can't
                        # reach (>=16px from every coding-block edge)
                        ss = 1 if p else 0
                        mask = _interior_mask(td, a.shape, ss)
                        if mask.any() and not np.array_equal(a[mask],
                                                             b[mask]):
                            bad.append((fidx, p, "inter"))
                    elif not np.array_equal(a, b):
                        bad.append((fidx, p, "inter"))
                fidx += 1
    return bad


def _interior_mask(td, shape, ss):
    mask = np.ones(shape, bool)
    m = 16 >> ss
    for (r, c, bsize) in td.blocks:
        x0 = (c * 4) >> ss
        y0 = (r * 4) >> ss
        mask[max(0, y0 - m):y0 + m, :] = False
        mask[:, max(0, x0 - m):x0 + m] = False
    return mask


@pytest.mark.parametrize("wh,cq", [((192, 128), 40), ((176, 144), 96),
                                   ((320, 180), 40), ((128, 128), 72)])
def test_replay_foreign_gop(wh, cq):
    w, h = wh
    frames = _frames(w, h, 4, motion=(2, 3), noise=2)
    tus = _gen_stream(frames, w, h, cq)
    bad = _replay(tus)
    assert not bad, bad


def test_replay_foreign_static():
    frames = _frames(128, 96, 4, motion=(0, 0), noise=0)
    tus = _gen_stream(frames, 128, 96, 40)
    bad = _replay(tus)
    assert not bad, bad


@pytest.mark.parametrize("wh,cq", [((352, 288), 40), ((192, 120), 96),
                                   ((320, 192), 96)])
def test_replay_foreign_keyframe(wh, cq):
    """Keyframe-only replay is bit-exact (validated across the full
    {64x32..352x288} x {q40,q96} sweep during round 2 — edge
    partitions, 1-D tx classes, near-lossless coefficient regimes)."""
    from av1tpu.specav1 import decoder as specdec

    w, h = wh
    frames = _frames(w, h, 1, motion=(0, 0), noise=0)
    tus = _gen_stream(frames, w, h, cq)
    ref_out = aomcodec.decode_stream(tus)
    d = specdec.Decoder()
    d.ignore_loop_filter = True
    out = d.decode_tu(bytes(tus[0]))
    for p in range(3):
        a = np.asarray(out[0][p], np.int64)
        b = np.asarray(ref_out[0][p], np.int64)
        assert np.array_equal(a[:b.shape[0], :b.shape[1]], b), f"plane {p}"
