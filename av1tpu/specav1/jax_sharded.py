"""Multi-chip spec-AV1 encode: tile-row stripes over a 1-D device mesh.

The spec bitstream's tile rows are the unit of chip parallelism: tiles
are fully independent for prediction and entropy state, so each chip
encodes one horizontal stripe of the frame and the host concatenates
the per-stripe tiles into one conformant tile group (the reference
scaled by running parallel ffmpeg/VAAPI jobs,
internal/daemon/daemon.go; we scale one frame across chips over ICI
instead).

Inter frames shard: the previous reconstruction stays ROW-SHARDED on
the chips that produced it, and each chip assembles its local padded
reference window with a ``lax.ppermute`` halo exchange — PAD (=64)
boundary rows from each vertical neighbor, then a local gather that
reproduces the spec's edge-replication clamp at the true frame dims.
Per-frame ICI is therefore O(halo) = 2*PAD*width bytes per neighbor
pair instead of O(frame) replication, while MVs remain unrestricted
across stripe boundaries within the +-(PAD-8) search clamp and the
bitstream is IDENTICAL to the single-chip encode.  Keyframes stay
single-device: they are 1/keyint of the work and the intra wavefront
is ~ms.

Stripes are equal-sized (SPMD): the padded frame height must divide by
n_stripes * 64.  spec_engine only enables sharding when the uniform
tile spacing yields the same superblock rows per tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from av1tpu.specav1 import jax_inter


def make_mesh(n_devices: int = 0) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("stripe",))


def stripe_pad(ph: int, n: int) -> int:
    """Padded height for n equal 32-row-aligned stripes.  Inter stripes
    are a pure compute partition (each chip sees its reference stripe
    plus PAD halo rows; MVs are unrestricted within the +-(PAD-8)
    search clamp; entropy slices tile rows from the full-frame arrays
    on the host), so any 32-aligned split works — rows beyond the coded
    frame encode garbage that the host never reads."""
    unit = 32 * n
    return -(-ph // unit) * unit


def sharding_ok(ph: int, th: int, n: int) -> bool:
    """Sharding pays when every stripe has at least 2 block rows."""
    return n >= 2 and stripe_pad(ph, n) // n >= 64


def replicate(mesh: Mesh, arrs):
    return tuple(jax.device_put(a, NamedSharding(mesh, P(None, None)))
                 for a in arrs)


def shard_rows(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P("stripe", None)))


def key_stripe_plan(th: int, ph: int, n: int, trl2: int):
    """Stripe plan for tile-row-parallel KEYFRAMES, or None.

    AV1 tile rows share no prediction state, so each device can run
    the intra wavefront for a contiguous run of whole tile rows with
    zero halo traffic.  Shardable when the stream's uniform tile
    spacing (trl2 from spec_engine._tile_plan — chip-count-aware;
    writer.tile_row_spans: ths = ceil(sbr / 2^trl2) superblocks per
    tile) yields stripe boundaries on tile starts: n <= 2^trl2 tiles,
    2^trl2 % n == 0.  strip_same_sb geometries (th % 64 == 48) are
    excluded — their zone-3 candidate ban applies only to the frame's
    last main row, which would diverge the SPMD bodies.

    Returns (stripe_h, ph_s, local_brs): stripe pixel height, the
    total sharded height (n * stripe_h >= ph; trailing rows compute
    garbage the host crops), and the tile-start block rows INSIDE a
    stripe (exclusive of 0)."""
    mi_rows = 2 * ((th + 7) >> 3)
    sbr = (mi_rows + 15) >> 4
    T = 1 << trl2
    if n < 2 or T % n or n > T:
        return None
    if th % 32 == 16 and (th // 32 * 32) % 64 == 32:
        return None  # strip_same_sb
    ths = (sbr + T - 1) >> trl2
    tpd = T // n
    stripe_h = tpd * ths * 64
    ph_s = n * stripe_h
    if ph_s < ph:
        return None
    local_brs = tuple(i * ths * 2 for i in range(1, tpd))
    return stripe_h, ph_s, local_brs


@functools.partial(jax.jit, static_argnames=(
    "mesh", "bit_depth", "th", "tw", "stripe_h", "local_brs", "qround",
    "deblock", "cdef", "lr"))
def encode_key_sharded(mesh, y, u, v, qindex, bit_depth: int, th: int,
                       tw: int, stripe_h: int, local_brs: tuple,
                       lf_y=0, lf_uv=0, deblock: bool = False,
                       qround: float = 0.70, cdef: bool = False,
                       cdef_damping=4, lr: bool = False):
    """Tile-row-parallel keyframe encode over the stripe mesh.

    y/u/v: (ph_s, pw) planes row-sharded P("stripe") per
    key_stripe_plan.  Each device runs the full intra wavefront for
    its tiles (its stripe top IS a tile start, so 'no above' at the
    local frame top reproduces the tile boundary exactly); the bottom
    edge-read clamp is passed traced so the last stripe clamps at the
    true frame bottom.  Strip rows + deblock/CDEF/LR run on the
    gathered full-frame recon, exactly like the single-chip encode.
    Returns jax_intra._encode_frame's tuple with full-frame layouts —
    bit-identical to the single-chip keyframe."""
    from jax.experimental.shard_map import shard_map

    from av1tpu.specav1 import jax_intra, recon as _R

    n = mesh.shape["stripe"]
    pw = y.shape[1]
    fh8 = ((th + 7) >> 3) << 3

    def body(ys, us, vs, q):
        row0 = jax.lax.axis_index("stripe") * stripe_h
        fh_local = jnp.clip(fh8 - row0, 0, stripe_h)
        out = jax_intra._encode_frame(
            ys, us, vs, q[0], nbr=stripe_h // 32, nbc=pw // 32,
            bit_depth=bit_depth, th=stripe_h, tw=tw,
            tile_row_starts=local_brs, qround=qround,
            fh_clamp=fh_local)
        return out[0:15]

    sh2 = P("stripe", None)
    sh3 = P("stripe", None, None)
    out = shard_map(
        body, mesh=mesh, in_specs=(sh2, sh2, sh2, P(None)),
        out_specs=(sh2,) * 11 + (sh3,) * 4, check_rep=False)(
        y, u, v, jnp.reshape(jnp.asarray(qindex, jnp.int32), (1,)))
    fy, fu, fv = out[0], out[1], out[2]
    lv_y, lv_u, lv_v = out[3], out[4], out[5]
    nsc = 2 * (pw // 32)
    strip = (th % 32) == 16
    # rows past the coded grid are stripe-pad garbage the single-chip
    # encode never writes; zero their levels so the sparse level pack
    # sees the same density (recon/grid garbage is cropped by the host)
    coded_h = th if strip else 32 * ((th + 31) // 32)
    grids = out[6:15]
    if coded_h < lv_y.shape[0]:
        rows = jnp.arange(lv_y.shape[0])
        lv_y = jnp.where((rows < coded_h)[:, None], lv_y, 0)
        crows = jnp.arange(lv_u.shape[0])
        lv_u = jnp.where((crows < coded_h // 2)[:, None], lv_u, 0)
        lv_v = jnp.where((crows < coded_h // 2)[:, None], lv_v, 0)
        # grid rows past the coded main grid likewise (the strip row's
        # syntax comes from strip_skip, not the 32-grid)
        gmain = th // 32 if strip else -(-th // 32)
        grows = jnp.arange(grids[0].shape[0])
        grids = tuple(
            jnp.where((grows < gmain).reshape(
                (-1,) + (1,) * (g.ndim - 1)), g, 0)
            for g in grids)
    if strip:
        dcq = jnp.asarray(_R.DC_Q[bit_depth], jnp.int32)[
            jnp.asarray(qindex, jnp.int32).reshape(())]
        acq = jnp.asarray(_R.AC_Q[bit_depth], jnp.int32)[
            jnp.asarray(qindex, jnp.int32).reshape(())]
        (fy, fu, fv, lv_y, lv_u, lv_v, strip_skip) = \
            jax_inter.code_strip(y.astype(jnp.int32), fy, fu, fv,
                                 lv_y, lv_u, lv_v, th, dcq, acq,
                                 qround, bit_depth)
    else:
        strip_skip = jnp.zeros((nsc,), jnp.int32)
    if deblock:
        from av1tpu.specav1 import loopfilter as _LF
        fy, fu, fv = _LF.deblock_frame(fy, fu, fv, lf_y, lf_uv, lf_uv,
                                       bit_depth, th, tw,
                                       split=grids[4], strip=strip)
    pre_cdef_y = fy
    if cdef:
        from av1tpu.specav1 import jax_cdef
        skip8 = jax_inter.build_skip8(grids[2], strip_skip, th, tw, pw,
                                      split=grids[4], skip16=grids[8])
        fy, fu, fv, cdefs = jax_cdef.cdef_search_apply(
            fy, fu, fv, y, u, v, skip8, cdef_damping,
            bit_depth=bit_depth, th=th, tw=tw)
    else:
        cdefs = jnp.zeros((4,), jnp.int32)
    if lr:
        from av1tpu.specav1 import jax_lr
        fy, lr_choice, lr_taps = jax_lr.lr_search_apply(
            fy, pre_cdef_y, y, bit_depth=bit_depth, th=th, tw=tw)
    else:
        from av1tpu.specav1 import lr as _NL
        nru = (_NL.count_units_in_frame(256, th) *
               _NL.count_units_in_frame(256, tw))
        lr_choice = jnp.full((nru,), -1, jnp.int32)
        lr_taps = jnp.zeros((nru, 6), jnp.int32)
    return ((fy, fu, fv) + (lv_y, lv_u, lv_v) + tuple(grids) +
            (strip_skip, cdefs, lr_choice, lr_taps))


def _halo_window(ref_l, n: int, pad: int, th_p: int, tw_p: int,
                 row0, sh_p: int):
    """Assemble one plane's local padded reference window inside a
    shard_map body.

    ref_l: (sh_p, pw) — this chip's rows [row0, row0+sh_p) of the
    previous reconstruction.  Exchanges ``pad`` boundary rows with the
    vertical neighbors over ICI (lax.ppermute; frame-edge chips receive
    zeros, which the clamp gather below never reads), then remaps rows
    and columns so window cell (i, j) equals the single-chip
    jax_inter.prep_ref padded reference at (row0 + i, j): row i shows
    true-ref row clamp(row0 - pad + i, 0, th_p - 1), column j shows
    clamp(j - pad, 0, tw_p - 1).  Returns (sh_p + 2*pad, pw + 2*pad).
    """
    axis = "stripe"
    top = jax.lax.ppermute(ref_l[-pad:], axis,
                           [(i, i + 1) for i in range(n - 1)])
    bot = jax.lax.ppermute(ref_l[:pad], axis,
                           [(i + 1, i) for i in range(n - 1)])
    win = jnp.concatenate([top, ref_l, bot], axis=0)
    i = jnp.arange(sh_p + 2 * pad)
    g = row0 - pad + i
    src = jnp.clip(jnp.clip(g, 0, th_p - 1) - (row0 - pad),
                   0, sh_p + 2 * pad - 1)
    win = win[src]
    cols = jnp.clip(jnp.arange(ref_l.shape[1]), 0, tw_p - 1)
    win = win[:, cols]
    return jnp.pad(win, ((0, 0), (pad, pad)), mode="edge")


def _frame_step_sharded(mesh, y, u, v, ref_y, ref_u, ref_v, qindex,
                        bit_depth: int, th: int, tw: int,
                        lf_y=0, lf_uv=0, deblock: bool = False,
                        qround: float = 0.70, cdef: bool = False,
                        cdef_damping=4, lr: bool = False,
                        golden: bool = False, gld_y=None, gld_u=None,
                        gld_v=None):
    """One striped P-frame encode (traceable; callers jit).  y/u/v:
    (ph, pw) planes sharded P("stripe"); refs: full-frame recon planes,
    consumed ROW-SHARDED — each chip keeps its stripe and ppermutes PAD
    halo rows to its neighbors, so per-frame ICI is O(halo), not
    O(frame).  With golden, the GOP-keyframe planes (also row-sharded)
    get the same O(halo) window treatment.  Returns
    jax_inter._encode_frame's tuple, planes laid out full-frame (stripe
    outputs concatenated).  Bit-identical to the single-chip encode of
    the same frame."""
    from jax.experimental.shard_map import shard_map

    n = mesh.shape["stripe"]
    sh = y.shape[0] // n

    def _windows(ry, ru, rv, row0):
        return (_halo_window(ry, n, jax_inter.PAD, th, tw, row0, sh),
                _halo_window(ru, n, jax_inter.PAD // 2, th // 2,
                             tw // 2, row0 // 2, sh // 2),
                _halo_window(rv, n, jax_inter.PAD // 2, th // 2,
                             tw // 2, row0 // 2, sh // 2))

    def body(ys, us, vs, ry, ru, rv, q, *gld):
        row0 = jax.lax.axis_index("stripe") * sh
        ry_w, ru_w, rv_w = _windows(ry, ru, rv, row0)
        gkw = {}
        if golden:
            gy_w, gu_w, gv_w = _windows(gld[0], gld[1], gld[2], row0)
            gkw = dict(golden=True, gld_y=gy_w, gld_u=gu_w, gld_v=gv_w)
        return jax_inter._encode_frame(
            ys, us, vs, ry_w, ru_w, rv_w, q[0], bit_depth, th=th, tw=tw,
            stripe=True, row0=row0, qround=qround, local_ref=True,
            **gkw)

    out_specs = (P("stripe"), P("stripe"), P("stripe", None),
                 P("stripe", None), P("stripe", None),
                 P("stripe", None), P("stripe", None), P("stripe", None),
                 P(None), P(None), P(None),
                 P("stripe"), P("stripe"), P("stripe"), P("stripe"),
                 P(None))
    shard2 = P("stripe", None)
    in_specs = (shard2,) * 6 + (P(None),) + \
        ((shard2,) * 3 if golden else ())
    args = (y, u, v, ref_y, ref_u, ref_v,
            jnp.reshape(jnp.asarray(qindex, jnp.int32), (1,)))
    if golden:
        args = args + (gld_y, gld_u, gld_v)
    out = shard_map(
        body, mesh=mesh, in_specs=in_specs,
        out_specs=out_specs, check_rep=False)(*args)
    # strip rows + deblock + CDEF on the full-frame recon (AV1 filters
    # across tile boundaries, so stripe edges need both sides).  The
    # arrays stay row-sharded: XLA's SPMD partitioner inserts the small
    # boundary halo exchanges the filter taps imply — no gather
    fy, fu, fv = out[5], out[6], out[7]
    lv_y, lv_u, lv_v = out[2], out[3], out[4]
    strip_skip = out[8]
    gh, gw = y.shape[0] // 32, y.shape[1] // 32
    strip = (th % 32) == 16
    if strip:
        # the stripe bodies left garbage in the strip rows (they never
        # compute them); code the 16x16 intra strip on the gathered
        # recon, exactly like the single-chip path
        from av1tpu.specav1 import recon as _R
        dcq = jnp.asarray(_R.DC_Q[bit_depth], jnp.int32)[
            jnp.asarray(qindex, jnp.int32).reshape(())]
        acq = jnp.asarray(_R.AC_Q[bit_depth], jnp.int32)[
            jnp.asarray(qindex, jnp.int32).reshape(())]
        (fy, fu, fv, lv_y, lv_u, lv_v, strip_skip) = \
            jax_inter.code_strip(y.astype(jnp.int32), fy, fu, fv,
                                 lv_y, lv_u, lv_v, th, dcq, acq,
                                 qround, bit_depth)
    if deblock:
        from av1tpu.specav1 import loopfilter as _LF
        fy, fu, fv = _LF.deblock_frame(fy, fu, fv, lf_y, lf_uv,
                                       lf_uv, bit_depth, th, tw,
                                       split=out[11].reshape(gh, gw),
                                       strip=strip)
    cdefs = out[9]
    pre_cdef_y = fy  # post-deblock: LR stripe-boundary source
    if cdef:
        from av1tpu.specav1 import jax_cdef
        skip8 = jax_inter.build_skip8(out[1].reshape(gh, gw), strip_skip,
                                      th, tw, y.shape[1],
                                      split=out[11], skip16=out[13])
        fy, fu, fv, cdefs = jax_cdef.cdef_search_apply(
            fy, fu, fv, y, u, v, skip8, cdef_damping,
            bit_depth=bit_depth, th=th, tw=tw)
    lr_choice = out[10]
    lr_taps = out[15]
    if lr:
        from av1tpu.specav1 import jax_lr
        fy, lr_choice, lr_taps = jax_lr.lr_search_apply(
            fy, pre_cdef_y, y, bit_depth=bit_depth, th=th, tw=tw)
    return out[0:2] + (lv_y, lv_u, lv_v, fy, fu, fv, strip_skip,
                       cdefs, lr_choice,
                       out[11], out[12], out[13], out[14], lr_taps)


encode_inter_sharded = functools.partial(jax.jit, static_argnames=(
    "mesh", "bit_depth", "th", "tw", "deblock", "qround", "cdef",
    "lr", "golden"))(_frame_step_sharded)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "k", "ph", "pw", "bit_depth",
                                    "th", "tw", "cap", "deblock",
                                    "qround", "cdef", "lr", "golden",
                                    "packed_delta"))
def encode_chunk_sharded(mesh, packed, ry, ru, rv, qindexes, lfys,
                         lfuvs, damps, k: int, ph: int, pw: int,
                         bit_depth: int, th: int, tw: int, cap: int,
                         deblock: bool = False, qround: float = 0.70,
                         cdef: bool = False, lr: bool = False,
                         golden: bool = False, gy=None, gu=None,
                         gv=None, packed_delta: bool = False):
    """K consecutive P frames as one lax.scan of striped frame steps:
    chunking (per-dispatch RTT amortization) COMPOSES with multi-chip
    striping.  The scan carry is the row-sharded reconstruction, so
    each step's reference traffic stays O(halo).  Mirrors
    spec_engine._encode_chunk's packed-upload / sparse-output contract,
    including the packed-delta upload (unpack's cumsums are frame- and
    row-axis local, so the row-sharded layout partitions them without
    cross-stripe traffic)."""
    from av1tpu.encoder import io_pack
    from av1tpu.engine_tpu import _unpack_planes_chunk

    if packed_delta:
        ys, us, vs = io_pack.unpack_chunk(*packed, k, ph, pw,
                                          bit_depth=bit_depth)
    else:
        ys, us, vs = _unpack_planes_chunk(packed, k, ph, pw)
    spec3 = NamedSharding(mesh, P(None, "stripe", None))
    ys = jax.lax.with_sharding_constraint(ys, spec3)
    us = jax.lax.with_sharding_constraint(us, spec3)
    vs = jax.lax.with_sharding_constraint(vs, spec3)

    gkw = (dict(golden=True, gld_y=gy, gld_u=gu, gld_v=gv)
           if golden else {})

    def step(carry, xs):
        y, u, v, q, lfy, lfuv, damp = xs
        out = _frame_step_sharded(
            mesh, y, u, v, *carry, q, bit_depth, th=th, tw=tw,
            lf_y=lfy, lf_uv=lfuv, deblock=deblock, qround=qround,
            cdef=cdef, cdef_damping=damp, lr=lr, **gkw)
        return out[5:8], out[0:5] + (out[8], out[9], out[10],
                                      out[11], out[12], out[13],
                                      out[14], out[15])

    carry, outs = jax.lax.scan(step, (ry, ru, rv),
                               (ys, us, vs, qindexes, lfys, lfuvs,
                                damps))
    (mv8s, skips, ylvs, ulvs, vlvs, strips, cdefs, lrcs,
     splits, mv16s, skip16s, refsels, lrtaps) = outs
    flat = jnp.concatenate([ylvs.reshape(k, -1),
                            ulvs.reshape(k, -1),
                            vlvs.reshape(k, -1)], axis=1).reshape(-1)
    mask = flat != 0
    count = mask.sum(dtype=jnp.int32)
    idx = jnp.cumsum(mask.astype(jnp.int32)) - 1
    vals = jnp.zeros((cap,), jnp.int16)
    vals = vals.at[jnp.where(mask, idx, cap)].set(
        jnp.clip(flat, -32768, 32767).astype(jnp.int16), mode="drop")
    grids = jnp.concatenate([mv8s.reshape(-1), skips.reshape(-1),
                             strips.reshape(-1), cdefs.reshape(-1),
                             lrcs.reshape(-1), splits.reshape(-1),
                             mv16s.reshape(-1), skip16s.reshape(-1),
                             refsels.reshape(-1), lrtaps.reshape(-1)])
    return carry, (jnp.packbits(mask), vals, count,
                   grids.astype(jnp.int32)), (ylvs, ulvs, vlvs), \
        (ys[-1], us[-1], vs[-1])
