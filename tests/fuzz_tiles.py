"""Differential tile fuzzer: random LEGAL inter tiles (mixed partition
trees incl. AB/4-way, all single-ref types, NEWMV/NEAREST/NEAR/GLOBAL,
var-tx splits, intra-in-inter with angle deltas, random sparse
coefficients) written by specav1.writer, then decoded by BOTH the
system libaom (ctypes oracle) and our spec decoder — any recon
mismatch is a conformance bug in writer, decoder, or both.

Used by tests/test_fuzz_inter.py (fixed seeds) and runnable directly:
    python -m tests.fuzz_tiles [nseeds]
"""
import sys
import numpy as np
from av1tpu.conformance import aomcodec
from av1tpu.specav1 import encode as E, mvrefs, writer as W
from av1tpu.specav1 import tile as T
from av1tpu.specav1.cdfs import FrameContext
from av1tpu.specav1 import decoder as specdec

REFS = [mvrefs.LAST_FRAME, mvrefs.GOLDEN_FRAME, mvrefs.ALTREF_FRAME,
        mvrefs.BWDREF_FRAME, mvrefs.LAST2_FRAME]
MODES = ["NEWMV", "NEARESTMV", "GLOBALMV", "NEARMV", "INTRA"]
CFG: dict = {}


def _rand_levels(rng, tw_, th_):
    """Sparse random quantized levels in the low-freq corner, with an
    occasional golomb-range magnitude."""
    v = np.zeros((th_, tw_), np.int64)
    n = int(rng.integers(0, 5))
    if CFG.get("zero_levels"):
        return v
    if CFG.get("dc_only"):
        v[0, 0] = int(rng.integers(-9, 10))
        return v
    for _ in range(n):
        rr = int(rng.integers(0, min(4, th_)))
        cc = int(rng.integers(0, min(4, tw_)))
        if rng.random() < 0.1:
            v[rr, cc] = int(rng.integers(16, 400)) * \
                (1 if rng.random() < 0.5 else -1)
        else:
            v[rr, cc] = int(rng.integers(-9, 10))
    return v


def _block_rng(br, bc):
    """Per-block rng: skip/depth/levels draws are independent of other
    blocks so the shrinker can flip skips without disturbing the rest."""
    return np.random.default_rng((CFG.get("seed", 0), br, bc, 7))


def _walk_tree(sx, sy, w, h, lw, lh):
    """Decoder _transform_tree traversal order for uniform leaves."""
    if w <= lw and h <= lh:
        yield (sx, sy, T._find_tx_size(w, h))
    elif w > h:
        yield from _walk_tree(sx, sy, w // 2, h, lw, lh)
        yield from _walk_tree(sx + w // 2, sy, w // 2, h, lw, lh)
    elif w < h:
        yield from _walk_tree(sx, sy, w, h // 2, lw, lh)
        yield from _walk_tree(sx, sy + h // 2, w, h // 2, lw, lh)
    else:
        hw, hh = w // 2, h // 2
        yield from _walk_tree(sx, sy, hw, hh, lw, lh)
        yield from _walk_tree(sx + hw, sy, hw, hh, lw, lh)
        yield from _walk_tree(sx, sy + hh, hw, hh, lw, lh)
        yield from _walk_tree(sx + hw, sy + hh, hw, hh, lw, lh)


def build_frame(tw, rng, mi_rows, mi_cols, record, override=None):
    def chroma_coeffs(br, bc, bsize, is_inter, brng,
                      uv_mode=T.DC_PRED):
        w4, h4 = T.BLOCK_SIZES[bsize]
        ctx_tx = T._chroma_tx_size(bsize, 1, 1)
        ctw, cth = T.TX_SIZES_ALL[ctx_tx]
        cx0, cy0 = (bc >> 1) * 4, (br >> 1) * 4
        cbw = max(w4 >> 1, 1) * 4
        cbh = max(h4 >> 1, 1) * 4
        # intra chroma tx type derives from the uv mode, clipped to the
        # chroma tx set (decoder _coeffs mirror); inter chroma follows
        # the (DCT) luma type
        ctype = T.MODE_TO_TXFM[min(uv_mode, 13)]
        sq_up = T.tx_size_sqr_up(ctx_tx)
        if is_inter or sq_up > 2:
            ctype = 0  # DCT_DCT
        else:
            sqr = T.tx_size_sqr(ctx_tx)
            tset = T.EXT_TX_SET_DTT4_IDTX if sqr == 2 else \
                T.EXT_TX_SET_DTT4_IDTX_1DDCT
            if ctype not in tset:
                ctype = 0
        for plane in (1, 2):
            for ty in range(0, cbh, cth):
                for tx_x in range(0, cbw, ctw):
                    lv = _rand_levels(brng, ctw, cth)
                    if CFG.get("zero_chroma"):
                        lv[:] = 0
                    tw.coeffs(plane, cx0 + tx_x, cy0 + ty, ctx_tx,
                              lv, intra_dir=uv_mode, tx_type=ctype,
                              is_inter=is_inter)

    def code_block(br, bc, bsize):
        idx = len(record)
        kind = MODES[rng.integers(0, len(MODES))]
        if override is not None and override(idx) is not None:
            kind = override(idx)
        w4, h4 = T.BLOCK_SIZES[bsize]
        # coefficients only for blocks with full chroma pairing
        can_coeff = w4 >= 2 and h4 >= 2
        if kind == "INTRA" and not CFG.get("intra_coeff", True):
            can_coeff = False
        if kind != "INTRA" and not CFG.get("inter_coeff", True):
            can_coeff = False
        wl = CFG.get("nonskip_whitelist")
        if wl is not None and (br, bc) not in wl:
            can_coeff = False
        brng = _block_rng(br, bc)
        skip = 1 if (not can_coeff or brng.random() < 0.5) else 0
        x0, y0 = bc * 4, br * 4
        if kind == "INTRA":
            depth = None
            if bsize > T.BLOCK_4X4 and CFG.get("select", 1):
                dmax = min(T._max_tx_depth(bsize), 2,
                           CFG.get("max_depth", 2))
                depth = int(brng.integers(0, dmax + 1))
            y_mode = int(brng.integers(0, 13))
            uv_mode = int(brng.integers(0, 13))
            if CFG.get("dc_modes"):
                y_mode = uv_mode = T.DC_PRED
            ay = au = 0
            if bsize >= T.BLOCK_8X8 and T.V_PRED <= y_mode <= T.D67_PRED:
                ay = int(brng.integers(-3, 4))
            if bsize >= T.BLOCK_8X8 and T.V_PRED <= uv_mode <= T.D67_PRED:
                au = int(brng.integers(-3, 4))
            if CFG.get("force_intra"):
                y_mode, ay = CFG["force_intra"]
                uv_mode, au = T.DC_PRED, 0
                if not (bsize >= T.BLOCK_8X8
                        and T.V_PRED <= y_mode <= T.D67_PRED):
                    ay = 0
            tx = tw.block_intra_interframe(br, bc, bsize, skip,
                                           y_mode, uv_mode,
                                           tx_depth=depth,
                                           angle_y=ay, angle_uv=au)
            if not skip:
                tw_, th_ = T.TX_SIZES_ALL[tx]
                for ty in range(0, h4 * 4, th_):
                    for tx_x in range(0, w4 * 4, tw_):
                        tw.coeffs(0, x0 + tx_x, y0 + ty, tx,
                                  _rand_levels(brng, tw_, th_),
                                  intra_dir=y_mode)
                chroma_coeffs(br, bc, bsize, False, brng,
                              uv_mode=uv_mode)
            record.append((br, bc, bsize, "INTRA", None, None))
            return
        ref = REFS[rng.integers(0, len(REFS))]
        stack = tw.mv_stack(br, bc, bsize, ref)
        var_tx = None
        leaf_depth = 0
        if not skip and CFG.get("select", 1):
            max_tx = T.MAX_TX_SIZE_RECT[bsize]
            dmax = 0
            t = max_tx
            while dmax < min(2, CFG.get("max_depth", 2)) and \
                    T.TX_SIZES_ALL[t][0] > 4 \
                    and T.TX_SIZES_ALL[t][1] > 4:
                t = T.SPLIT_TX_SIZE[t]
                dmax += 1
            leaf_depth = int(brng.integers(0, dmax + 1))
            var_tx = (lambda d: (lambda r_, c_, tx_, depth_:
                                 depth_ < d))(leaf_depth)
        if kind == "NEWMV":
            pred = stack.ref_mv(0)
            mv = (pred[0] + int(rng.integers(-12, 13)) * 2,
                  pred[1] + int(rng.integers(-12, 13)) * 2)
            if mv == pred:
                mv = (mv[0] + 2, mv[1])
            tw.block_inter(br, bc, bsize, skip, ref, T.NEWMV, mv, stack,
                           var_tx_split=var_tx)
        elif kind == "NEARESTMV":
            mv = stack.ref_mv(0)
            tw.block_inter(br, bc, bsize, skip, ref, T.NEARESTMV, mv,
                           stack, var_tx_split=var_tx)
        elif kind == "NEARMV":
            mv = stack.ref_mv(1)
            tw.block_inter(br, bc, bsize, skip, ref, T.NEARMV, mv, stack,
                           ref_mv_idx=1, var_tx_split=var_tx)
        else:
            mv = (0, 0)
            tw.block_inter(br, bc, bsize, skip, ref, T.GLOBALMV, mv,
                           stack, var_tx_split=var_tx)
        if not skip:
            leaf = T.MAX_TX_SIZE_RECT[bsize]
            for _ in range(leaf_depth):
                leaf = T.SPLIT_TX_SIZE[leaf]
            lw, lh = T.TX_SIZES_ALL[leaf]
            for (sx, sy, txs) in _walk_tree(x0, y0, w4 * 4, h4 * 4,
                                            lw, lh):
                tws, ths = T.TX_SIZES_ALL[txs]
                lv = _rand_levels(brng, tws, ths)
                if CFG.get("zero_luma"):
                    lv[:] = 0
                tw.coeffs(0, sx, sy, txs, lv, is_inter=True)
            chroma_coeffs(br, bc, bsize, True, brng)
        record.append((br, bc, bsize, kind, ref, mv))

    def rec_partition(br, bc, bsize):
        w4, h4 = T.BLOCK_SIZES[bsize]
        half = w4 >> 1
        roll = rng.random()
        if bsize == T.BLOCK_8X8 or roll < 0.25:
            tw.partition(br, bc, bsize, T.PARTITION_NONE)
            code_block(br, bc, bsize)
            tw.update_partition_ctx(br, bc, bsize)
        elif roll < 0.35:
            # HORZ: two (bsize_w x bsize_h/2) blocks
            tw.partition(br, bc, bsize, T.PARTITION_HORZ)
            sub = T._partition_subsize(T.PARTITION_HORZ, bsize)
            code_block(br, bc, sub)
            if br + (h4 >> 1) < mi_rows:
                code_block(br + (h4 >> 1), bc, sub)
            tw.update_partition_ctx_rect(br, bc, bsize, T.PARTITION_HORZ)
        elif roll < 0.44:
            tw.partition(br, bc, bsize, T.PARTITION_VERT)
            sub = T._partition_subsize(T.PARTITION_VERT, bsize)
            code_block(br, bc, sub)
            if bc + (w4 >> 1) < mi_cols:
                code_block(br, bc + (w4 >> 1), sub)
            tw.update_partition_ctx_rect(br, bc, bsize, T.PARTITION_VERT)
        elif roll < 0.76:
            # AB partitions (rect half + two split squares)
            part = [T.PARTITION_HORZ_A, T.PARTITION_HORZ_B,
                    T.PARTITION_VERT_A, T.PARTITION_VERT_B][
                        int((roll - 0.44) / 0.08)]
            tw.partition(br, bc, bsize, part)
            sub = T._partition_subsize(part, bsize)
            ssub = T._partition_subsize(T.PARTITION_SPLIT, bsize)
            if part == T.PARTITION_HORZ_A:
                code_block(br, bc, ssub)
                code_block(br, bc + half, ssub)
                code_block(br + half, bc, sub)
            elif part == T.PARTITION_HORZ_B:
                code_block(br, bc, sub)
                code_block(br + half, bc, ssub)
                code_block(br + half, bc + half, ssub)
            elif part == T.PARTITION_VERT_A:
                code_block(br, bc, ssub)
                code_block(br + half, bc, ssub)
                code_block(br, bc + half, sub)
            else:
                code_block(br, bc, sub)
                code_block(br, bc + half, ssub)
                code_block(br + half, bc + half, ssub)
            tw.update_partition_ctx_ab(br, bc, bsize, part)
        elif roll < 0.88:
            part = (T.PARTITION_HORZ_4 if roll < 0.82
                    else T.PARTITION_VERT_4)
            tw.partition(br, bc, bsize, part)
            sub = T._partition_subsize(part, bsize)
            q = w4 >> 2
            for i in range(4):
                if part == T.PARTITION_HORZ_4:
                    code_block(br + i * q, bc, sub)
                else:
                    code_block(br, bc + i * q, sub)
            tw.update_partition_ctx_rect(br, bc, bsize, part)
        else:
            tw.partition(br, bc, bsize, T.PARTITION_SPLIT)
            sub = T._SQUARES[half]
            for (dr, dc) in ((0, 0), (0, half), (half, 0), (half, half)):
                if br + dr < mi_rows and bc + dc < mi_cols:
                    rec_partition(br + dr, bc + dc, sub)

    for sb_r in range(0, mi_rows, 16):
        tw.start_sb_row(sb_r)
        for sb_c in range(0, mi_cols, 16):
            rec_partition(sb_r, sb_c, T.BLOCK_64X64)


def run_seed(seed, w=128, h=128, verbose=False, override=None):
    CFG["seed"] = seed
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, (h, w)).astype(np.int32)
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)
    v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)
    q = 72
    kenc = E.KeyFrameEncoder(q)
    ktu, krec = kenc.encode(y, u, v)
    mi_cols, mi_rows = w // 4, h // 4
    fc = FrameContext(q)
    tw = W.TileWriter(fc, mi_cols, mi_rows, q)
    record = []
    build_frame(tw, rng, mi_rows, mi_cols, record, override)
    tile = tw.finish()
    tu = W.assemble_interframe(w, h, q, tile, order_hint=1,
                               tx_mode_select=CFG.get("select", 1))
    try:
        out = aomcodec.decode_stream([ktu, tu])
    except Exception as e:
        return f"DECODE FAILED: {e!r}", record
    ours = specdec.decode_stream([bytes(ktu), bytes(tu)])
    for p in range(3):
        a = np.asarray(out[1][p], np.int64)
        b = np.asarray(ours[1][p], np.int64)
        a = a[:b.shape[0], :b.shape[1]]
        if not np.array_equal(a, b):
            d = np.argwhere(a != b)
            if verbose:
                diff = a != b
                for (br, bc, bs, kind, ref, mv) in record:
                    w4, h4 = T.BLOCK_SIZES[bs]
                    ss = 1 if p else 0
                    y0, x0 = (br * 4) >> ss, (bc * 4) >> ss
                    dd = diff[y0:y0 + (h4 * 4 >> ss),
                              x0:x0 + (w4 * 4 >> ss)]
                    if dd.any():
                        print(f"  bad block mi({br},{bc}) bs={bs} "
                              f"{kind} ref={ref} mv={mv} n={dd.sum()}")
                        break
            return f"plane {p}: {len(d)} diffs first {tuple(d[0])}", record
    return None, record


if __name__ == "__main__":
    fails = []
    for seed in range(int(sys.argv[1]) if len(sys.argv) > 1 else 40):
        msg, record = run_seed(seed)
        if msg:
            print(f"seed {seed}: {msg} ({len(record)} blocks)")
            fails.append(seed)
        else:
            print(f"seed {seed}: ok ({len(record)} blocks)", flush=True)
    print("FAILS:", fails)
