"""Device-side spec-AV1 inter-frame encoder (JAX, fully batched).

The TPU half of the spec-conformant inter path: full-pel motion search
(reusing the encoder's Pallas/shift-scan kernels), quarter-pel
refinement and motion compensation with the **spec 8-tap subpel
filters and InterRound0/1 rounding** (mirroring specav1.inter_recon
bit-for-bit), forward DCT + quantization, and the spec-exact integer
reconstruction from jax_intra.  Unlike the intra wavefront, every
block depends only on the previous frame's reconstruction, so the
whole frame batches as one vmap over 32x32 blocks.

The per-block (mv, skip, levels) outputs feed the native C++ tile
writer (spec_tile.cc: stw_encode_inter32), which derives the coded
Y mode (NEARESTMV / GLOBALMV / NEWMV) from the spec MV-prediction
stack on the host.

Replaces the inter half of the AV1 encoder inside the reference's
exec'd ffmpeg (internal/ffmpeg/transcode.go:119-123).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from av1tpu.encoder.kernels import motion, pallas_gather
from av1tpu.specav1 import inter_recon, recon
from av1tpu.specav1.jax_intra import (_fwd_mat, _fwd_mat_kind,
                                      inv_dct2d_add, inv_tx2d_add)

PAD = motion.PAD  # luma edge padding (chroma uses PAD // 2)
_MAX_FP = PAD - 8  # clamp full-pel MVs so MC windows stay in the pad


def _rounds(bit_depth: int):
    if bit_depth == 12:
        return 5, 9
    return 3, 11


@functools.partial(jax.jit, static_argnames=("size", "ss", "bit_depth"))
def _mc_blocks(ref_pad, pos, mvs, size: int, ss: int, bit_depth: int):
    """Spec motion compensation for B size x size blocks.

    ref_pad: plane padded by PAD >> ss (edge replicate).  pos: (B, 2)
    plane-space block origins.  mvs: (B, 2) luma MVs in 1/8-pel.
    Returns (B, size, size) int32 predictions.
    """
    pad = PAD >> ss
    r0, r1 = _rounds(bit_depth)
    filt = jnp.asarray(inter_recon.SUBPEL_REGULAR, jnp.int32)  # (16, 8)
    W7 = size + 7
    Hp, Wp = ref_pad.shape
    sy16 = (pos[:, 0] << 4) + (mvs[:, 0] << (1 - ss))
    sx16 = (pos[:, 1] << 4) + (mvs[:, 1] << (1 - ss))
    fy = filt[sy16 & 15]                                 # (B, 8)
    fx = filt[sx16 & 15]
    # the clip reproduces dynamic_slice's normative start clamping
    iy = jnp.clip((sy16 >> 4) - 3 + pad, 0, Hp - W7)
    ix = jnp.clip((sx16 >> 4) - 3 + pad, 0, Wp - W7)
    win = pallas_gather.gather_windows(ref_pad, iy, ix,
                                       W7).astype(jnp.int32)
    return _subpel_hv(win, fx, fy, size, r0, r1, bit_depth)


def _subpel_hv(win, fx, fy, size: int, r0: int, r1: int,
               bit_depth: int):
    """Batched spec 8-tap h+v filtering of (B, size+7, size+7) int32
    windows with per-block taps fx/fy (B, 8); InterRound0/1 rounding
    between passes (bit-exact vs the per-block form)."""
    B = win.shape[0]
    h = jnp.zeros((B, size + 7, size), jnp.int32)
    for t in range(8):
        h = h + fx[:, t, None, None] * win[:, :, t:t + size]
    h = (h + (1 << (r0 - 1))) >> r0
    v = jnp.zeros((B, size, size), jnp.int32)
    for t in range(8):
        v = v + fy[:, t, None, None] * h[:, t:t + size, :]
    v = (v + (1 << (r1 - 1))) >> r1
    return jnp.clip(v, 0, (1 << bit_depth) - 1)


@functools.partial(jax.jit, static_argnames=("size", "ss", "bit_depth"))
def _mc_blocks2(refs2, pos, mvs, ri, size: int, ss: int,
                bit_depth: int):
    """Spec MC with a per-block reference index.

    refs2: (wide, off, Wp) — pallas_gather.make_wide2 of the padded
    (LAST, GOLDEN) planes plus the single-plane width, built ONCE per
    frame and shared across every 2-ref gather (per-call plane
    conversion/concat copies were ~10 ms/frame — round-5 trace).
    ri: (B,) int32 selecting the plane each block predicts from.
    Otherwise identical to _mc_blocks.
    """
    pad = PAD >> ss
    r0, r1 = _rounds(bit_depth)
    filt = jnp.asarray(inter_recon.SUBPEL_REGULAR, jnp.int32)
    W7 = size + 7
    wide, off, Wp = refs2
    Hp = wide.shape[0]
    sy16 = (pos[:, 0] << 4) + (mvs[:, 0] << (1 - ss))
    sx16 = (pos[:, 1] << 4) + (mvs[:, 1] << (1 - ss))
    fy = filt[sy16 & 15]
    fx = filt[sx16 & 15]
    iy = jnp.clip((sy16 >> 4) - 3 + pad, 0, Hp - W7)
    ix = jnp.clip((sx16 >> 4) - 3 + pad, 0, Wp - W7)
    win = pallas_gather.gather_windows_wide(
        wide, off, ri, iy, ix, W7).astype(jnp.int32)
    return _subpel_hv(win, fx, fy, size, r0, r1, bit_depth)


_QPEL_OFFS = tuple((dr, dc) for dr in (-2, 0, 2) for dc in (-2, 0, 2))


@functools.lru_cache(maxsize=None)
def _qpel_band_mats(size: int):
    """Static band matrices for the 3 even-quarter-pel phases.

    mv8 is full-pel*8 at refine time, so every candidate offset
    d16 in {-4, 0, +4} lands on the same sixteenth phase for every
    block: phase {12, 0, 4} with window offset {0, 1, 1} inside the
    (size+9)^2 gather.  The 8-tap filter then becomes a (size+9, size)
    band matrix per phase and the whole h/v pass is an MXU matmul
    (the per-block shift-multiply form was 64 ms/frame at 1080p n=16).

    Returns (Mx (3, size+9, size), My (3, size, size+9)) float32,
    ordered by d16 = (-4, 0, +4)."""
    W9 = size + 9
    filt = np.asarray(inter_recon.SUBPEL_REGULAR, np.int64)
    mx = np.zeros((3, W9, size), np.float32)
    my = np.zeros((3, size, W9), np.float32)
    for i, d16 in enumerate((-4, 0, 4)):
        phase = d16 & 15
        off = 0 if d16 < 0 else 1
        for c in range(size):
            for t in range(8):
                mx[i, off + c + t, c] = filt[phase, t]
                my[i, c, off + c + t] = filt[phase, t]
    return mx, my


@functools.partial(jax.jit, static_argnames=("size", "bit_depth",
                                             "golden"))
def _qpel_refine9(src_blocks, refs_pad, pos, mv8, ri, size: int,
                  bit_depth: int, golden: bool = False):
    """Quarter-pel refinement over the 9 even-1/8 offsets around mv8
    with exact spec MC, factored: ONE (size+9)^2 window gather per
    block, then 3 horizontal + 9 vertical BAND-MATRIX passes on the
    MXU (see _qpel_band_mats).  Bit-for-bit the same predictions as
    _mc_blocks/_mc_blocks2 per candidate: products/sums stay below
    2^24 at every bit depth, so float32 matmuls are exact, and the
    spec rounding shifts run in int32 between passes.

    refs_pad: padded luma plane, or the (wide, off, Wp) make_wide2
    handle of the (LAST, GOLDEN) pair when golden=True (ri selects per
    block).  Returns (mv8_best (B,2), pred (B, size, size) int32).
    """
    pad = PAD
    r0, r1 = _rounds(bit_depth)
    W9 = size + 9
    mx, my = _qpel_band_mats(size)
    mx = jnp.asarray(mx)
    my = jnp.asarray(my)

    # window covers the minimum candidate origin (d16 = -4); the
    # per-candidate offsets within it are baked into the band matrices
    oy = ((pos[:, 0] << 4) + (mv8[:, 0] << 1) - 4 >> 4) - 3 + pad
    ox = ((pos[:, 1] << 4) + (mv8[:, 1] << 1) - 4 >> 4) - 3 + pad

    if golden:
        wide, off, Wp = refs_pad
        Hp = wide.shape[0]
        oy = jnp.clip(oy, 0, Hp - W9)
        ox = jnp.clip(ox, 0, Wp - W9)
        win = pallas_gather.gather_windows_wide(wide, off, ri, oy, ox,
                                                W9)
    else:
        Hp, Wp = refs_pad.shape
        oy = jnp.clip(oy, 0, Hp - W9)
        ox = jnp.clip(ox, 0, Wp - W9)
        win = pallas_gather.gather_windows(refs_pad, oy, ox, W9)
    # gather_windows returns float32 (exact for pixels)  # (B, W9, W9)

    # Precision.HIGHEST: TPU's default f32 matmul truncates inputs to
    # bf16 — pixel windows (10-bit) and the h intermediates (~2^13) are
    # not bf16-representable, and the resulting +-1 prediction errors
    # desync the recon from any conforming decoder.  With HIGHEST the
    # products/sums stay below 2^24 at every bit depth, so the f32
    # matmuls are exact (same rule as encoder/kernels/transforms.py).
    hp = jax.lax.Precision.HIGHEST
    blk = src_blocks.astype(jnp.int32)
    hs = []
    for j in range(3):
        h = jnp.einsum("bwk,ks->bws", win, mx[j],
                       preferred_element_type=jnp.float32,
                       precision=hp)
        hs.append((h.astype(jnp.int32) + (1 << (r0 - 1))) >> r0)

    preds = []
    costs = []
    for i in range(3):                                   # dr
        for j in range(3):                               # dc
            v = jnp.einsum("rk,bks->brs", my[i],
                           hs[j].astype(jnp.float32),
                           preferred_element_type=jnp.float32,
                           precision=hp)
            v = (v.astype(jnp.int32) + (1 << (r1 - 1))) >> r1
            v = jnp.clip(v, 0, (1 << bit_depth) - 1)
            preds.append(v)
            costs.append(((blk - v) ** 2).sum(axis=(1, 2)))
    costs = jnp.stack(costs)                             # (9, B)
    pidx = jnp.argmin(costs, axis=0)                     # (B,)
    pred = preds[0]
    for k in range(1, 9):
        pred = jnp.where((pidx == k)[:, None, None], preds[k], pred)
    offs = jnp.asarray(_QPEL_OFFS, jnp.int32)
    return mv8 + offs[pidx], pred


@functools.partial(jax.jit,
                   static_argnames=("bit_depth", "refine", "th", "tw",
                                    "stripe", "deblock", "qround",
                                    "cdef", "lr", "local_ref", "split16",
                                    "golden"))
def _encode_frame(y, u, v, ref_y, ref_u, ref_v, qindex,
                  bit_depth: int, refine: bool = True,
                  th: int = 0, tw: int = 0, stripe: bool = False,
                  row0=0, lf_y=0, lf_uv=0, deblock: bool = False,
                  qround: float = 0.70, cdef: bool = False,
                  cdef_damping=4, lr: bool = False,
                  local_ref: bool = False, split16: bool = True,
                  golden: bool = False, gld_y=None, gld_u=None,
                  gld_v=None):
    """Returns (mvs (B,2) 1/8-pel, skips (B,), lv_y, lv_u, lv_v planes,
    rec_y, rec_u, rec_v, strip_skip, cdefs, lr_choice, split (B,),
    mv16 (B,4,2), skip16 (B,4), refsel (B,)) for the SB-padded frame.

    golden: per-32-block RD selection between the LAST reference
    (ref_*, the previous reconstruction) and the GOLDEN reference
    (gld_*, the GOP keyframe held in slot 1).  Both references get a
    full-pel search; the full-pel SSDs pick the block's reference (a
    rate-aware margin keeps LAST unless GOLDEN clearly wins), then
    quarter-pel refinement and MC read the selected plane per block.
    SPLIT quadrants inherit the parent's reference (the native walker
    codes one single_ref tree per 32 grid cell).  refsel is 0 = LAST,
    1 = GOLDEN; without golden it is all zeros.

    split16: per-32-block RD decision between one 32x32 MV and a
    PARTITION_SPLIT into four 16x16 blocks with their own MVs (spec
    32->16 partition; the moving-object boundary case).  Composes with
    deblocking (the split's extra 16px tx edges are filtered by the
    loopfilter's masked mid-block passes); forced off only for blocks
    not fully inside the coded frame.

    th/tw: the true (coded) frame dims.  The spec clamps reference
    reads to the coded frame, so the padded-recon reference is cropped
    there and edge-replicated back out before MC (0 = padded dims).

    stripe=True: y/u/v are a ROW STRIPE of a taller frame starting at
    (traced) mi-independent pixel row ``row0``; th/tw are the FRAME
    true dims (multi-chip tile-row sharding).  With local_ref=False
    the ref planes carry the FULL frame (replicated); with
    local_ref=True they are PREBUILT local padded windows of shape
    (stripe_h + 2*PAD, pw + 2*PAD) covering padded-frame rows
    [row0-PAD, row0+stripe_h+PAD) — assembled by the caller from a
    row-sharded reference via ppermute halo exchange
    (jax_sharded._halo_window), so per-frame ICI is O(halo) instead of
    O(frame)."""
    H, Wd = y.shape
    n = 32
    gh, gw = H // n, Wd // n
    B = gh * gw
    pos = jnp.asarray(motion.block_positions(H, Wd, n))
    if stripe and not local_ref:
        pos = pos + jnp.stack([jnp.full((B,), row0, jnp.int32),
                               jnp.zeros((B,), jnp.int32)], axis=1)
    cpos = pos // 2

    th = th or H
    tw = tw or Wd

    def prep_ref(ref, t_h, t_w, pad):
        r = ref[:t_h, :t_w]
        return jnp.pad(r, ((pad, pad + ref.shape[0] - t_h),
                           (pad, pad + ref.shape[1] - t_w)), mode="edge")

    if local_ref:
        # prebuilt windows: block positions stay stripe-local
        ref_pad_y, ref_pad_u, ref_pad_v = ref_y, ref_u, ref_v
    else:
        ref_pad_y = prep_ref(ref_y, th, tw, PAD)
        ref_pad_u = prep_ref(ref_u, th // 2, tw // 2, PAD // 2)
        ref_pad_v = prep_ref(ref_v, th // 2, tw // 2, PAD // 2)

    src_y = y.astype(jnp.int32)
    blocks = src_y.reshape(gh, n, gw, n).transpose(0, 2, 1, 3)
    blocks = blocks.reshape(B, n, n)

    dcq = jnp.asarray(recon.DC_Q[bit_depth], jnp.int32)[qindex]
    acq = jnp.asarray(recon.AC_Q[bit_depth], jnp.int32)[qindex]

    if stripe and not local_ref:
        # full-pel search sees the stripe-aligned reference window
        ref_search = jax.lax.dynamic_slice(
            ref_pad_y, (row0, 0), (H + 2 * PAD, ref_pad_y.shape[1]))
    else:
        ref_search = ref_pad_y
    mv_fp = motion.search_v3(src_y, ref_search, n)
    mv_fp = jnp.clip(mv_fp, -_MAX_FP, _MAX_FP)
    if golden:
        if stripe and not local_ref:
            raise ValueError("golden striping requires local_ref "
                             "halo windows")
        if local_ref:
            gld_pad_y, gld_pad_u, gld_pad_v = gld_y, gld_u, gld_v
        else:
            gld_pad_y = prep_ref(gld_y, th, tw, PAD)
            gld_pad_u = prep_ref(gld_u, th // 2, tw // 2, PAD // 2)
            gld_pad_v = prep_ref(gld_v, th // 2, tw // 2, PAD // 2)
        # golden full-pel: ZERO-MV evaluation only.  GOLDEN wins on
        # static / background-revealing / cut-back blocks, where the
        # zero anchor dominates; tracking blocks already have LAST.
        # Round 4 ran a seeded +-8 refine here; the whole extra chain
        # (refine + its window gathers) bought <0.1% bits on the
        # golden suites while costing several ms/frame of the +23 ms
        # golden delta (round-5 bisect profile) — the zero-only form
        # keeps the reference-selection value at ~one block-sum's cost.
        gz = jax.lax.dynamic_slice(
            gld_pad_y, (PAD, PAD), (H, Wd)).astype(jnp.float32)
        dz = src_y.astype(jnp.float32) - gz
        ssd_g_zero = motion._block_sum(dz * dz, n).reshape(B)
        ssd_g_r = ssd_g_zero
        use_zero_g = jnp.ones((B,), bool)
        mv_fp_g = jnp.zeros_like(mv_fp)

        def fp_ssd(rp, mvfp, pos_, blocks_, nloc):
            g = motion.gather_blocks(rp, pos_, mvfp,
                                     nloc).astype(jnp.int32)
            return ((blocks_ - g) ** 2).sum(axis=(1, 2)).astype(
                jnp.int64)

        ssd_l = fp_ssd(ref_pad_y, mv_fp, pos, blocks, n)
        ssd_g = jnp.where(use_zero_g, ssd_g_zero,
                          ssd_g_r).astype(jnp.int64)
        # rate-aware margin: GOLDEN costs the single_ref b3 flip and a
        # typically larger MV residual — require a ~6% distortion win
        # plus ~2 bits at the frame lambda before switching
        lam_g = (acq.astype(jnp.int64) * acq.astype(jnp.int64)) >> 7
        use_g = (ssd_g + ssd_g // 16 + 2 * lam_g) < ssd_l
        refsel = use_g.astype(jnp.int32)
        mv_fp = jnp.where(use_g[:, None], mv_fp_g, mv_fp)
        # one wide-f32 concat per plane, shared by every 2-ref gather
        refs3_y = pallas_gather.make_wide2(ref_pad_y, gld_pad_y) + \
            (ref_pad_y.shape[1],)
        refs3_u = pallas_gather.make_wide2(ref_pad_u, gld_pad_u) + \
            (ref_pad_u.shape[1],)
        refs3_v = pallas_gather.make_wide2(ref_pad_v, gld_pad_v) + \
            (ref_pad_v.shape[1],)
    else:
        refsel = jnp.zeros((B,), jnp.int32)
    mv8 = mv_fp * 8

    def mc_y32(mvc):
        if golden:
            return _mc_blocks2(refs3_y, pos, mvc, refsel, n, 0,
                               bit_depth)
        return _mc_blocks(ref_pad_y, pos, mvc, n, 0, bit_depth)

    if refine:
        # quarter-pel refinement: the 3x3 even-1/8 offsets around the
        # full-pel winner with exact spec MC (factored single-gather)
        mv8, pred_y = _qpel_refine9(
            blocks, refs3_y if golden else ref_pad_y, pos, mv8, refsel,
            n, bit_depth, golden=golden)
    else:
        pred_y = mc_y32(mv8)

    if golden:
        pred_u = _mc_blocks2(refs3_u, cpos, mv8, refsel, n // 2, 1,
                             bit_depth)
        pred_v = _mc_blocks2(refs3_v, cpos, mv8, refsel, n // 2, 1,
                             bit_depth)
    else:
        pred_u = _mc_blocks(ref_pad_u, cpos, mv8, n // 2, 1, bit_depth)
        pred_v = _mc_blocks(ref_pad_v, cpos, mv8, n // 2, 1, bit_depth)

    fm32 = jnp.asarray(_fwd_mat(32))
    fm16 = jnp.asarray(_fwd_mat(16))
    # quantizer rounding offset: floor(|c|/q + 1 - qround).  The 0.70
    # default sits on the RD knee for this deadzone quantizer (sweep in
    # BASELINE.md round-2 notes); configured via `tpu.qround` and
    # recorded in the job JSON (it changes every emitted bit).
    deadzone = jnp.float32(1.0 - qround)

    def quant(coef, nn, shift):
        dq = jnp.full((nn, nn), acq, jnp.float32)
        dq = dq.at[0, 0].set(dcq.astype(jnp.float32))
        dq = dq / (1 << shift)
        mag = jnp.abs(coef) / dq + deadzone
        lv = jnp.clip(jnp.floor(mag), 0, 32767).astype(jnp.int32)
        return jnp.where(coef < 0, -lv, lv)

    def dequant(lv, nn, shift):
        dq = jnp.full((nn, nn), acq, jnp.int32)
        dq = dq.at[0, 0].set(dcq)
        mag = (jnp.abs(lv) * dq) & 0xFFFFFF
        return jnp.sign(lv) * (mag >> shift)

    def blockify(src, nn, nbh, nbw):
        return src.astype(jnp.int32).reshape(
            nbh, nn, nbw, nn).transpose(0, 2, 1, 3).reshape(
            nbh * nbw, nn, nn)

    def plane_pipe(src, preds, nn, shift, fmat, nbh, nbw):
        sb = blockify(src, nn, nbh, nbw)
        resid = (sb - preds).astype(jnp.float32)
        coef = jnp.einsum("ij,bjk,lk->bil", fmat, resid, fmat)
        lv = quant(coef, nn, shift)
        rec = inv_dct2d_add(dequant(lv, nn, shift), preds, bit_depth)
        return lv, rec

    lam = (acq.astype(jnp.int64) * acq.astype(jnp.int64)) >> 7

    def skip_rdo(src3, preds3, lvs3, recs3):
        """Per-block skip decision over the 3 planes; returns the
        (lv, rec) selections plus final (d, nnz, skip)."""
        d_skip = sum(((s - p) ** 2).sum((1, 2))
                     for s, p in zip(src3, preds3))
        d_code = sum(((s - r) ** 2).sum((1, 2))
                     for s, r in zip(src3, recs3))
        nnz = sum((l != 0).sum((1, 2)) for l in lvs3)
        force = d_skip.astype(jnp.int64) < \
            d_code.astype(jnp.int64) + lam * (3 * nnz.astype(jnp.int64))
        fmask = force[:, None, None]
        lvs = [jnp.where(fmask, 0, l) for l in lvs3]
        recs = [jnp.where(fmask, p, r) for p, r in zip(preds3, recs3)]
        d = jnp.where(force, d_skip, d_code).astype(jnp.int64)
        nnz = jnp.where(force, 0, nnz)
        skip = ((lvs[0] == 0).all(axis=(1, 2)) &
                (lvs[1] == 0).all(axis=(1, 2)) &
                (lvs[2] == 0).all(axis=(1, 2))).astype(jnp.int32)
        return lvs, recs, d, nnz, skip

    lv_y, rec_y_b = plane_pipe(y, pred_y, 32, 1, fm32, gh, gw)
    lv_u, rec_u_b = plane_pipe(u, pred_u, 16, 0, fm16, gh, gw)
    lv_v, rec_v_b = plane_pipe(v, pred_v, 16, 0, fm16, gh, gw)

    yb, ub, vb = (blockify(y, 32, gh, gw), blockify(u, 16, gh, gw),
                  blockify(v, 16, gh, gw))
    (lv_y, lv_u, lv_v), (rec_y_b, rec_u_b, rec_v_b), d32, nnz32, skip = \
        skip_rdo((yb, ub, vb), (pred_y, pred_u, pred_v),
                 (lv_y, lv_u, lv_v), (rec_y_b, rec_u_b, rec_v_b))

    def to_plane(b, nn, nbh, nbw):
        return b.reshape(nbh, nbw, nn, nn).transpose(0, 2, 1, 3).reshape(
            nbh * nn, nbw * nn)

    rec_y_p = to_plane(rec_y_b, 32, gh, gw)
    rec_u_p = to_plane(rec_u_b, 16, gh, gw)
    rec_v_p = to_plane(rec_v_b, 16, gh, gw)
    lv_y_p = to_plane(lv_y, 32, gh, gw)
    lv_u_p = to_plane(lv_u, 16, gh, gw)
    lv_v_p = to_plane(lv_v, 16, gh, gw)

    # ---- 32 -> 16 partition RD (spec PARTITION_SPLIT) ----------------
    # (composes with deblock: the split's 16px tx edges are filtered by
    # loopfilter's masked mid-block passes)
    do_split = split16
    if do_split:
        g16h, g16w = H // 16, Wd // 16
        B16 = g16h * g16w
        pos16 = jnp.asarray(motion.block_positions(H, Wd, 16))
        if stripe and not local_ref:
            pos16 = pos16 + jnp.stack(
                [jnp.full((B16,), row0, jnp.int32),
                 jnp.zeros((B16,), jnp.int32)], axis=1)
        cpos16 = pos16 // 2
        blocks16 = blockify(y, 16, g16h, g16w)
        # quadrant full-pel search: seed each 16-block from its parent
        # 32-block's SELECTED winner and refine +-8 in the Pallas
        # kernel — the parent search already ran zero-seeded and
        # coarse-seeded families over the same pixels, so an
        # independent wide 16-grid search (a 1089-step coarse scan at
        # 1080p) only re-derives those seeds 4x over.  Quadrants also
        # inherit the parent's reference (one single_ref tree per 32
        # grid cell in the tile syntax).
        from av1tpu.encoder.kernels import pallas_motion
        pos16_loc = jnp.asarray(motion.block_positions(H, Wd, 16))
        seed16 = jnp.repeat(jnp.repeat(mv_fp.reshape(gh, gw, 2), 2, 0),
                            2, 1).reshape(B16, 2)
        if golden:
            ri16 = jnp.repeat(jnp.repeat(refsel.reshape(gh, gw), 2, 0),
                              2, 1).reshape(B16)
            mv16_r, ssd16_r = pallas_motion.refine_around_seeds2(
                blocks16, refs3_y, ri16, pos16_loc, seed16, 16, 8, PAD)
            c_l = jax.lax.dynamic_slice(ref_pad_y, (PAD, PAD), (H, Wd))
            c_g = jax.lax.dynamic_slice(gld_pad_y, (PAD, PAD), (H, Wd))
            sf = src_y.astype(jnp.float32)
            z_l = motion._block_sum(
                (sf - c_l.astype(jnp.float32)) ** 2, 16).reshape(B16)
            z_g = motion._block_sum(
                (sf - c_g.astype(jnp.float32)) ** 2, 16).reshape(B16)
            ssd16_zero = jnp.where(ri16.astype(bool), z_g, z_l)
        else:
            ri16 = jnp.zeros((B16,), jnp.int32)
            mv16_r, ssd16_r = pallas_motion.refine_around_seeds(
                blocks16, ref_search, pos16_loc, seed16, 16, 8, PAD)
            c0 = jax.lax.dynamic_slice(ref_search, (PAD, PAD), (H, Wd))
            diff0 = src_y.astype(jnp.float32) - c0.astype(jnp.float32)
            ssd16_zero = motion._block_sum(diff0 * diff0,
                                           16).reshape(B16)
        # rate-aware zero bias (same margin as search_v3)
        keep = ssd16_r + ssd16_r / 16.0 < ssd16_zero
        mv16_fp = jnp.where(keep[:, None], mv16_r, 0)
        mv16_fp = jnp.clip(mv16_fp, -_MAX_FP, _MAX_FP)

        def mc_y16(mvc):
            if golden:
                return _mc_blocks2(refs3_y, pos16, mvc, ri16, 16, 0,
                                   bit_depth)
            return _mc_blocks(ref_pad_y, pos16, mvc, 16, 0, bit_depth)

        mv16 = mv16_fp * 8
        if refine:
            mv16, pred16_y = _qpel_refine9(
                blocks16, refs3_y if golden else ref_pad_y, pos16,
                mv16, ri16, 16, bit_depth, golden=golden)
        else:
            pred16_y = mc_y16(mv16)
        if golden:
            pred16_u = _mc_blocks2(refs3_u, cpos16, mv16, ri16, 8, 1,
                                   bit_depth)
            pred16_v = _mc_blocks2(refs3_v, cpos16, mv16, ri16, 8, 1,
                                   bit_depth)
        else:
            pred16_u = _mc_blocks(ref_pad_u, cpos16, mv16, 8, 1,
                                  bit_depth)
            pred16_v = _mc_blocks(ref_pad_v, cpos16, mv16, 8, 1,
                                  bit_depth)
        fm16f = jnp.asarray(_fwd_mat(16))
        fm8 = jnp.asarray(_fwd_mat(8))
        lv16_y, rec16_y = plane_pipe(y, pred16_y, 16, 0, fm16f,
                                     g16h, g16w)
        lv16_u, rec16_u = plane_pipe(u, pred16_u, 8, 0, fm8, g16h, g16w)
        lv16_v, rec16_v = plane_pipe(v, pred16_v, 8, 0, fm8, g16h, g16w)
        u16b = blockify(u, 8, g16h, g16w)
        v16b = blockify(v, 8, g16h, g16w)
        (lv16s, rec16s, d16, nnz16, skip16) = skip_rdo(
            (blocks16, u16b, v16b), (pred16_y, pred16_u, pred16_v),
            (lv16_y, lv16_u, lv16_v), (rec16_y, rec16_u, rec16_v))
        lv16_y, lv16_u, lv16_v = lv16s
        rec16_y, rec16_u, rec16_v = rec16s

        # aggregate the four quadrants onto the 32 grid (z-order)
        def quads(a):
            # (B16,) -> (B, 4) [(0,0),(0,1),(1,0),(1,1)]
            g = a.reshape(gh, 2, gw, 2)
            return jnp.stack([g[:, 0, :, 0], g[:, 0, :, 1],
                              g[:, 1, :, 0], g[:, 1, :, 1]],
                             axis=-1).reshape(B, 4)

        d16_sum = quads(d16).sum(-1)
        nnz16_sum = quads(nnz16).sum(-1)
        # header-bit model: ~8 bits per coded unit (skip+mode+mv
        # residual average), +2 for the extra partition symbol
        HB = 8
        cost32 = d32 + lam * (3 * nnz32.astype(jnp.int64) + HB)
        cost16 = d16_sum + lam * (3 * nnz16_sum.astype(jnp.int64)
                                  + 4 * HB + 2)
        # only blocks fully inside the coded mi grid may split
        mi_rows_t = 2 * ((th + 7) >> 3)
        mi_cols_t = 2 * ((tw + 7) >> 3)
        bi = jnp.arange(B) // gw
        bj = jnp.arange(B) % gw
        if stripe:
            bi = bi + row0 // 32
        inside = ((bi + 1) * 8 <= mi_rows_t) & ((bj + 1) * 8 <= mi_cols_t)
        split = (cost16 < cost32) & inside
        sm = split.reshape(gh, gw)

        def sel_plane(p32, b16, nn16):
            p16 = to_plane(b16, nn16, g16h, g16w)
            m = jnp.repeat(jnp.repeat(sm, 2 * nn16, 0), 2 * nn16, 1)
            return jnp.where(m, p16, p32)

        rec_y_p = sel_plane(rec_y_p, rec16_y, 16)
        rec_u_p = sel_plane(rec_u_p, rec16_u, 8)
        rec_v_p = sel_plane(rec_v_p, rec16_v, 8)
        lv_y_p = sel_plane(lv_y_p, lv16_y, 16)
        lv_u_p = sel_plane(lv_u_p, lv16_u, 8)
        lv_v_p = sel_plane(lv_v_p, lv16_v, 8)
        mv16_z = jnp.stack(
            [mv16.reshape(gh, 2, gw, 2, 2)[:, 0, :, 0],
             mv16.reshape(gh, 2, gw, 2, 2)[:, 0, :, 1],
             mv16.reshape(gh, 2, gw, 2, 2)[:, 1, :, 0],
             mv16.reshape(gh, 2, gw, 2, 2)[:, 1, :, 1]],
            axis=2).reshape(B, 4, 2)
        skip16_z = quads(skip16)
        split = split.astype(jnp.int32)
    else:
        split = jnp.zeros((B,), jnp.int32)
        mv16_z = jnp.zeros((B, 4, 2), jnp.int32)
        skip16_z = jnp.zeros((B, 4), jnp.int32)
    # 16px bottom strip (height % 32 == 16): intra V_PRED 16x16 blocks
    # with coded luma residual, chroma prediction-only — identical to
    # the keyframe strip (strip blocks are intra in every frame)
    nsc = 2 * (Wd // 32)
    if (not stripe) and th % 32 == 16:
        (rec_y_p, rec_u_p, rec_v_p, lv_y_p, lv_u_p, lv_v_p,
         strip_skip) = code_strip(src_y, rec_y_p, rec_u_p, rec_v_p,
                                  lv_y_p, lv_u_p, lv_v_p, th, dcq, acq,
                                  qround, bit_depth)
    else:
        strip_skip = jnp.zeros((nsc,), jnp.int32)
    if deblock and not stripe:
        # in-loop deblocking (stripe mode filters after the gather on
        # the full frame — tile-row edges need both sides); split and
        # strip structure adds masked mid-block edges
        from av1tpu.specav1 import loopfilter as _LF
        rec_y_p, rec_u_p, rec_v_p = _LF.deblock_frame(
            rec_y_p, rec_u_p, rec_v_p, lf_y, lf_uv, lf_uv,
            bit_depth, th, tw,
            split=split.reshape(gh, gw) if do_split else None,
            strip=(th % 32 == 16))
    pre_cdef_y = rec_y_p  # post-deblock: LR stripe-boundary source
    if cdef and not stripe:
        # in-loop CDEF after deblock (spec 7.15 placement); the frame
        # strengths are searched on-device against the source and
        # returned for the host's cdef_params header
        from av1tpu.specav1 import jax_cdef
        skip8 = build_skip8(skip.reshape(gh, gw), strip_skip,
                            th, tw, Wd, split=split, skip16=skip16_z)
        rec_y_p, rec_u_p, rec_v_p, cdefs = jax_cdef.cdef_search_apply(
            rec_y_p, rec_u_p, rec_v_p, y, u, v, skip8, cdef_damping,
            bit_depth=bit_depth, th=th, tw=tw)
    else:
        cdefs = jnp.zeros((4,), jnp.int32)
    if lr and not stripe:
        # in-loop Wiener loop restoration after CDEF (spec 7.17):
        # per-RU preset + solved-tap search on luma, decisions + taps
        # returned for the tile syntax
        from av1tpu.specav1 import jax_lr
        rec_y_p, lr_choice, lr_taps = jax_lr.lr_search_apply(
            rec_y_p, pre_cdef_y, y, bit_depth=bit_depth, th=th, tw=tw)
    else:
        from av1tpu.specav1 import lr as _NL
        nru = (_NL.count_units_in_frame(256, th or rec_y_p.shape[0]) *
               _NL.count_units_in_frame(256, tw or rec_y_p.shape[1]))
        lr_choice = jnp.full((nru,), -1, jnp.int32)
        lr_taps = jnp.zeros((nru, 6), jnp.int32)
    return (mv8, skip, lv_y_p, lv_u_p, lv_v_p,
            rec_y_p, rec_u_p, rec_v_p, strip_skip, cdefs, lr_choice,
            split, mv16_z, skip16_z, refsel, lr_taps)


def build_skip8(skip_blocks, strip_skip, th: int, tw: int, pw: int,
                split=None, skip16=None):
    """(uh, uw) per-8x8-unit coded-skip grid for CDEF from the 32x32
    block skip grid (+ 16x16 strip block skips when th % 32 == 16;
    + per-quadrant skips for 32->16 SPLIT blocks when split/skip16
    given — the decoder's CDEF skip test is per coded block)."""
    fh8 = ((th + 7) >> 3) << 3
    fw8 = ((tw + 7) >> 3) << 3
    sk8 = jnp.repeat(jnp.repeat(skip_blocks.astype(jnp.int32), 4, 0),
                     4, 1)
    if split is not None:
        gh, gw = skip_blocks.shape
        # skip16: (B, 4) z-order -> (2gh, 2gw) -> per-8 repeat
        s16 = skip16.reshape(gh, gw, 2, 2).transpose(0, 2, 1, 3).reshape(
            2 * gh, 2 * gw)
        s16_8 = jnp.repeat(jnp.repeat(s16.astype(jnp.int32), 2, 0), 2, 1)
        m = jnp.repeat(jnp.repeat(
            split.reshape(gh, gw).astype(bool), 4, 0), 4, 1)
        sk8 = jnp.where(m, s16_8, sk8)
    if th % 32 == 16:
        nsc = 2 * (pw // 32)
        srow = (th - 16) // 8
        strip8 = jnp.repeat(strip_skip.astype(jnp.int32)[:nsc], 2)
        sk8 = jax.lax.dynamic_update_slice(
            sk8, jnp.broadcast_to(strip8[None, :], (2, strip8.shape[0])),
            (srow, 0))
    return sk8[:fh8 // 8, :fw8 // 8]


def code_strip(src_y, rec_y_p, rec_u_p, rec_v_p, lv_y_p, lv_u_p,
               lv_v_p, th: int, dcq, acq, qround: float,
               bit_depth: int):
    """Code the 16px bottom strip (th % 32 == 16) onto completed recon
    planes: intra V_PRED 16x16 luma blocks with coded DCT residual,
    chroma prediction-only (all-zero txbs).  Shared by the single-chip
    frame encode and the sharded path (which codes the strip on the
    gathered full-frame recon, where the stripe bodies left garbage
    rows).  src_y: int32 source luma.  Returns the updated planes and
    the (nsc,) strip_skip grid."""
    Wd = rec_y_p.shape[1]
    nsc = 2 * (Wd // 32)
    # V_PRED's mode-derived transform is ADST_DCT (vertical ADST) —
    # the walker signals the derived DTT4 index for intra 16x16
    fm16i = jnp.asarray(_fwd_mat(16))
    fm16ia = jnp.asarray(_fwd_mat_kind("adst", 16))
    deadzone = jnp.float32(1.0 - qround)
    dqm = jnp.full((16, 16), acq, jnp.float32).at[0, 0].set(
        dcq.astype(jnp.float32) if hasattr(dcq, "astype")
        else jnp.float32(dcq))
    y0 = (th // 32) * 32
    pred = jnp.broadcast_to(rec_y_p[y0 - 1][None, :], (16, Wd))
    srows = src_y[y0:y0 + 16, :]
    resid = (srows - pred).astype(jnp.float32)
    rblk = resid.reshape(16, Wd // 16, 16).transpose(1, 0, 2)
    coef = jnp.einsum("ij,bjk,lk->bil", fm16ia, rblk, fm16i)
    mag = jnp.abs(coef) / dqm + deadzone
    lvq = jnp.clip(jnp.floor(mag), 0, 32767).astype(jnp.int32)
    lvs = jnp.where(coef < 0, -lvq, lvq)
    dqi = jnp.full((16, 16), acq, jnp.int32).at[0, 0].set(dcq)
    dmag = (jnp.abs(lvs) * dqi) & 0xFFFFFF
    dqs = jnp.sign(lvs) * dmag
    pblk = pred.reshape(16, Wd // 16, 16).transpose(1, 0, 2)
    rec_blk = inv_tx2d_add(dqs, pblk.astype(jnp.int32), bit_depth,
                           row_kind="dct", col_kind="adst")
    rec_rows = rec_blk.transpose(1, 0, 2).reshape(16, Wd)
    lv_rows = lvs.transpose(1, 0, 2).reshape(16, Wd)
    rec_y_p = jax.lax.dynamic_update_slice(rec_y_p, rec_rows, (y0, 0))
    lv_y_p = jax.lax.dynamic_update_slice(lv_y_p, lv_rows, (y0, 0))
    strip_skip = (lvs == 0).all(axis=(1, 2))[:nsc].astype(jnp.int32)
    cy0 = y0 // 2
    cpred = jnp.broadcast_to(rec_u_p[cy0 - 1][None, :], (8, Wd // 2))
    rec_u_p = jax.lax.dynamic_update_slice(
        rec_u_p, cpred.astype(rec_u_p.dtype), (cy0, 0))
    cpredv = jnp.broadcast_to(rec_v_p[cy0 - 1][None, :], (8, Wd // 2))
    rec_v_p = jax.lax.dynamic_update_slice(
        rec_v_p, cpredv.astype(rec_v_p.dtype), (cy0, 0))
    lv_u_p = jax.lax.dynamic_update_slice(
        lv_u_p, jnp.zeros((8, Wd // 2), lv_u_p.dtype), (cy0, 0))
    lv_v_p = jax.lax.dynamic_update_slice(
        lv_v_p, jnp.zeros((8, Wd // 2), lv_v_p.dtype), (cy0, 0))
    return (rec_y_p, rec_u_p, rec_v_p, lv_y_p, lv_u_p, lv_v_p,
            strip_skip)


def encode_interframe_device(y, u, v, ref_planes, qindex: int,
                             bit_depth: int = 8, true_dims=None,
                             gld_planes=None):
    """Host wrapper: returns (modes, mvs, skips, ylv, ulv, vlv) numpy
    arrays ready for native.encode_inter32_tile plus the device recon
    planes (y, u, v) for the next frame's reference."""
    H, Wd = y.shape
    assert H % 64 == 0 and Wd % 64 == 0
    gh, gw = H // 32, Wd // 32
    th, tw = true_dims if true_dims else (H, Wd)
    gkw = {}
    if gld_planes is not None:
        gkw = dict(golden=True, gld_y=gld_planes[0],
                   gld_u=gld_planes[1], gld_v=gld_planes[2])
    out = _encode_frame(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                        ref_planes[0], ref_planes[1], ref_planes[2],
                        qindex, bit_depth, th=th, tw=tw, **gkw)
    mv8, skip, ylv, ulv, vlv, ry, ru, rv = out[0:8]
    split, mv16, skip16 = out[11], out[12], out[13]
    mvs = np.asarray(mv8).reshape(gh, gw, 2)
    skips = np.asarray(skip).reshape(gh, gw)
    # inter mode grid: 1 = inter/LAST, 4 = inter/GOLDEN
    modes = 1 + 3 * np.asarray(out[14]).reshape(gh, gw)
    split3 = (np.asarray(split).reshape(gh, gw),
              np.asarray(mv16).reshape(gh, gw, 4, 2),
              np.asarray(skip16).reshape(gh, gw, 4))
    return (modes, mvs, skips, np.asarray(ylv), np.asarray(ulv),
            np.asarray(vlv), split3), (ry, ru, rv)
