"""Foreign inter-replay desync localizer (VERDICT round-2 Missing #3).

Reproduces the moving-content replay desync (tests/test_replay_foreign.py
xfail), finds the FIRST block in decode order whose reconstruction
diverges from libaom's, and prints that block's decoded syntax — the
symbol that desynced the range decoder is at or immediately before that
block, which narrows the ambiguous default-CDF row.

Usage: python -m tools.debug_replay [w h cq seed]
"""

from __future__ import annotations

import sys

import numpy as np

from av1tpu.conformance import aomcodec
from av1tpu.specav1 import decoder as specdec
from av1tpu.specav1 import headers, obu


def gen(frames, w, h, cq, cpu=9):
    from tests.test_replay_foreign import OPTS
    enc = aomcodec.Encoder(w, h, cpu_used=cpu, cq_level=cq, threads=1,
                           kf_max_dist=9999)
    enc.set_options(OPTS)
    tus = []
    for (y, u, v) in frames:
        tus += enc.encode(y, u, v)
    tus += enc.flush()
    enc.close()
    return tus


def frames_(w, h, n, seed=0, motion=(2, 3), noise=2):
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


def main():
    w, h, cq, seed = 192, 128, 40, 0
    if len(sys.argv) > 1:
        w, h, cq, seed = (int(x) for x in sys.argv[1:5])
    frames = frames_(w, h, 4, seed=seed)
    tus = gen(frames, w, h, cq)
    ref_out = aomcodec.decode_stream(tus)

    d = specdec.Decoder()
    d.ignore_loop_filter = True
    fidx = 0
    for tu in tus:
        for o in obu.parse_obus(bytes(tu)):
            if o.type == obu.OBU_SEQUENCE_HEADER:
                d.seq = headers.parse_sequence_header(o.payload)
                continue
            if o.type != obu.OBU_FRAME:
                continue
            hd = headers.parse_frame_header(o.payload, d.seq)
            if hd.frame_is_intra():
                d._decode_frame_obu(o.payload)
                planes = tuple(np.asarray(p) for p in ref_out[fidx])
                for i in range(8):
                    if hd.refresh_frame_flags & (1 << i):
                        d.ref_frames[i] = planes
                        d.ref_slot_meta[i] = (planes, planes[0].shape[1],
                                              planes[0].shape[0])
                print(f"frame {fidx}: intra (seeded from libaom)")
                fidx += 1
                continue
            holder = {}
            try:
                out = d._decode_frame_obu(o.payload, _td_out=holder)
            except Exception as e:
                print(f"frame {fidx}: DECODE RAISED: {e!r}")
                return
            td = holder["td"]
            got = out[0]
            want = ref_out[fidx]
            # per-block comparison in decode order; loop filter is off in
            # replay so compare block interiors only (margin 8px)
            first_bad = None
            for bi, (r, c, bsize) in enumerate(td.blocks):
                from av1tpu.specav1.tile import BLOCK_SIZES
                w4, h4 = BLOCK_SIZES[bsize]
                y0, x0 = r * 4, c * 4
                bw, bh = w4 * 4, h4 * 4
                a = np.asarray(got[0], np.int64)
                b = np.asarray(want[0], np.int64)
                y1 = min(y0 + bh, b.shape[0])
                x1 = min(x0 + bw, b.shape[1])
                if y0 >= b.shape[0] or x0 >= b.shape[1]:
                    continue
                # interior only (deblock margin)
                m = 8
                iy0, ix0 = y0 + m, x0 + m
                iy1, ix1 = max(iy0, y1 - m), max(ix0, x1 - m)
                if iy1 <= iy0 or ix1 <= ix0:
                    continue
                if not np.array_equal(a[iy0:iy1, ix0:ix1],
                                      b[iy0:iy1, ix0:ix1]):
                    first_bad = (bi, r, c, bsize)
                    break
            if first_bad is None:
                print(f"frame {fidx}: inter CLEAN "
                      f"({len(td.blocks)} blocks)")
            else:
                bi, r, c, bsize = first_bad
                print(f"frame {fidx}: first divergent block #{bi} at "
                      f"mi ({r},{c}) bsize={bsize}")
                print(f"  total blocks {len(td.blocks)}")
                # dump mode info for the divergent and preceding blocks
                for j in range(max(0, bi - 3), min(len(td.blocks),
                                                   bi + 2)):
                    rr, cc, bs = td.blocks[j]
                    g = td.mvgrid
                    print(f"  block {j}: mi({rr},{cc}) bsize={bs} "
                          f"skip={int(td.skips[rr, cc])} "
                          f"ymode={int(td.y_modes[rr, cc])} "
                          f"filter={int(td.filters[rr, cc])} "
                          f"txw4={int(td.tx_w4[rr, cc])} "
                          f"ref={int(g.ref[rr, cc])} "
                          f"newmv={bool(g.newmv[rr, cc])} "
                          f"mv=({int(g.mv_r[rr, cc])},"
                          f"{int(g.mv_c[rr, cc])})")
                return
            fidx += 1


if __name__ == "__main__":
    main()
