"""Spec-AV1 TPU engine: the production encoder emitting standard AV1.

Subclasses TpuEngine, inheriting the daemon surface (transcode, stream
copy, spool resume, rate control, scene-cut/flash classification) and
replacing the frame pipeline with the spec-conformant device encoders:

  * keyframes: specav1.jax_intra (wavefront intra, spec-exact recon)
  * inter frames: specav1.jax_inter (batched search/MC/transform)
  * entropy: the native C++ spec tile writer (spec_tile.cc)

Every emitted stream is standard AV1 — decodable by libaom/dav1d/any
player — unlike the round-1 "av1tpu profile".  This is the reference's
core contract (it shipped av1_vaapi spec streams,
internal/ffmpeg/transcode.go:119-123).

Payload framing: MKV low-overhead bitstream — keyframe blocks carry
[sequence header OBU][frame OBU], inter blocks [frame OBU]; no
temporal delimiters.  CodecPrivate is the ISOBMFF av1C record.
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

from av1tpu.engine_tpu import TpuEngine, TpuEncoderConfig, _unpack_planes
from av1tpu.specav1 import native
from av1tpu.specav1 import obu as obu_mod
from av1tpu.specav1 import writer as W

log = logging.getLogger("av1d")

# sparse level transfer: nonzero-coefficient capacity as a fraction of
# the total coefficient count.  Typical q96 frames code 1-3%; on
# overflow _finalize falls back to materializing the full planes.
SPARSE_CAP_FRACTION = 32


def _pack_outputs_jit():
    """The jitted device-side packer (lazy: jax import stays off the
    scan-only daemon path)."""
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("cap",))
    def pack(lv_y, lv_u, lv_v, grids, cap: int):
        flat = jnp.concatenate([lv_y.reshape(-1), lv_u.reshape(-1),
                                lv_v.reshape(-1)])
        mask = flat != 0
        count = mask.sum(dtype=jnp.int32)
        idx = jnp.cumsum(mask.astype(jnp.int32)) - 1
        vals = jnp.zeros((cap,), jnp.int16)
        vals = vals.at[jnp.where(mask, idx, cap)].set(
            jnp.clip(flat, -32768, 32767).astype(jnp.int16), mode="drop")
        return jnp.packbits(mask), vals, count, grids.astype(jnp.int32)

    return pack


_pack = None


def _pack_outputs(lv_y, lv_u, lv_v, grids, cap: int):
    global _pack
    if _pack is None:
        _pack = _pack_outputs_jit()
    return _pack(lv_y, lv_u, lv_v, grids, cap)


def _encode_chunk_jit():
    """K consecutive P frames as one lax.scan dispatch: one packed
    upload, one device program, one sparse D2H for the whole chunk
    (per-dispatch tunnel RTT amortizes over K frames)."""
    import functools

    import jax
    import jax.numpy as jnp

    from av1tpu.encoder import io_pack
    from av1tpu.engine_tpu import _unpack_planes_chunk
    from av1tpu.specav1 import jax_inter

    @functools.partial(jax.jit,
                       static_argnames=("k", "ph", "pw", "bit_depth",
                                        "th", "tw", "cap", "deblock",
                                        "qround", "cdef", "lr",
                                        "golden", "packed_delta"))
    def go(packed, ry, ru, rv, qindexes, lfys, lfuvs, damps, k: int,
           ph: int, pw: int, bit_depth: int, th: int, tw: int, cap: int,
           deblock: bool = False, qround: float = 0.70,
           cdef: bool = False, lr: bool = False, golden: bool = False,
           gy=None, gu=None, gv=None, packed_delta: bool = False):
        if packed_delta:
            # packed: (nib, exc_pos, exc_val, modes, base_y/u/v)
            ys, us, vs = io_pack.unpack_chunk(*packed, k, ph, pw,
                                              bit_depth=bit_depth)
        else:
            ys, us, vs = _unpack_planes_chunk(packed, k, ph, pw)
        gkw = (dict(golden=True, gld_y=gy, gld_u=gu, gld_v=gv)
               if golden else {})

        def step(carry, xs):
            y, u, v, q, lfy, lfuv, damp = xs
            out = jax_inter._encode_frame(y, u, v, *carry, q, bit_depth,
                                          th=th, tw=tw, lf_y=lfy,
                                          lf_uv=lfuv, deblock=deblock,
                                          qround=qround, cdef=cdef,
                                          cdef_damping=damp, lr=lr,
                                          **gkw)
            return out[5:8], out[0:5] + (out[8], out[9], out[10],
                                          out[11], out[12], out[13],
                                          out[14], out[15])

        carry, outs = jax.lax.scan(step, (ry, ru, rv),
                                   (ys, us, vs, qindexes, lfys, lfuvs,
                                    damps))
        (mv8s, skips, ylvs, ulvs, vlvs, strips, cdefs, lrcs,
         splits, mv16s, skip16s, refsels, lrtaps) = outs
        # frame-major y|u|v flattening so per-frame slices are
        # byte-aligned contiguous runs on the host
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
                                 refsels.reshape(-1),
                                 lrtaps.reshape(-1)])
        return carry, (jnp.packbits(mask), vals, count,
                       grids.astype(jnp.int32)), (ylvs, ulvs, vlvs), \
            (ys[-1], us[-1], vs[-1])

    return go


_chunk_go = None


def _encode_chunk(*a, **k):
    global _chunk_go
    if _chunk_go is None:
        _chunk_go = _encode_chunk_jit()
    return _chunk_go(*a, **k)


def _unpack_levels(maskbytes, vals, count, shapes):
    """Host inverse of _pack_outputs.  Returns the level planes or None
    when the nonzero count overflowed the value capacity."""
    total = sum(h * w for h, w in shapes)
    if int(count) > vals.shape[0]:
        return None
    flat = native.densify(np.asarray(maskbytes), np.asarray(vals), total)
    out = []
    off = 0
    for hh, ww in shapes:
        out.append(flat[off:off + hh * ww].reshape(hh, ww))
        off += hh * ww
    return out


def _axis_true_dims_ok(px: int, is_height: bool = False) -> bool:
    """True when an axis can be coded at its true size on the fixed
    32x32 grid: exact multiples, a last-block overhang (rem > 16px),
    or — for the HEIGHT axis — a 16px remainder coded as an edge-SPLIT
    16x16 block strip (720/2160).  Odd or small remainders fall back
    to SB padding + render_size."""
    rem = px % 32
    if px % 2:
        return False
    if rem == 0 or rem > 16:
        return True
    return is_height and rem == 16


class SpecSequenceHeader:
    """Sequence parameters for the spec bitstream (av1C + seq OBU)."""

    def __init__(self, width: int, height: int, bit_depth: int = 8,
                 color_primaries: int = 0, color_transfer: int = 0,
                 color_matrix: int = 0, enable_cdef: bool = False,
                 enable_restoration: bool = False):
        self.width = width
        self.height = height
        self.bit_depth = bit_depth
        self.color_primaries = color_primaries
        self.color_transfer = color_transfer
        self.color_matrix = color_matrix
        self.enable_cdef = enable_cdef
        self.enable_restoration = enable_restoration

    def seq_obu(self) -> bytes:
        cp = self.color_primaries or None
        w, h = self.width, self.height
        if not (_axis_true_dims_ok(w) and _axis_true_dims_ok(h, True)):
            w, h = (w + 63) & ~63, (h + 63) & ~63
        return W.write_sequence_header(
            w, h, bit_depth=self.bit_depth,
            color_primaries=cp,
            transfer=self.color_transfer if cp else None,
            matrix=self.color_matrix if cp else None,
            enable_cdef=self.enable_cdef,
            enable_restoration=self.enable_restoration)

    def av1c(self) -> bytes:
        hbd = 1 if self.bit_depth > 8 else 0
        b1 = 0  # profile 0, level 2.0
        b2 = (0 << 7) | (hbd << 6) | (0 << 5) | (0 << 4) | (1 << 3) | \
            (1 << 2) | 0
        return bytes([0x81, b1, b2, 0x00]) + self.seq_obu()


def noise_floor(y) -> float:
    """Median |horizontal second difference| on a row-subsampled grid:
    a dense-noise floor estimate that ignores sparse edges.  Grainy
    sources measure >= 2; smooth/blocky content <= 1."""
    s = np.asarray(y[::8], np.int32)
    d2 = s[:, 2:] - 2 * s[:, 1:-1] + s[:, :-2]
    return float(np.median(np.abs(d2)))


def lf_levels(qindex: int, bit_depth: int = 8) -> tuple:
    """Deblocking filter level from qindex (libaom's q-based guess:
    av1_pick_filter_level's filt_guess regression, per bit depth)."""
    from av1tpu.specav1 import recon
    q = int(recon.AC_Q[bit_depth][int(qindex)])
    if bit_depth == 8:
        lvl = (q * 20723 + 1015158) >> 18
    elif bit_depth == 10:
        lvl = (q * 20723 + 4060632) >> 20
    else:
        lvl = (q * 20723 + 16242526) >> 22
    lvl = max(0, min(63, lvl))
    return lvl, lvl


def cdef_damping(qindex: int) -> int:
    """CDEF damping from qindex (libaom's pick_cdef heuristic:
    3 + (base_q_idx >> 6), range 3..6)."""
    return min(6, 3 + (int(qindex) >> 6))


def _lr_nru(th: int, tw: int) -> tuple:
    """(unit_rows, unit_cols) of the luma 256px restoration-unit grid."""
    from av1tpu.specav1 import lr as _NL
    return (_NL.count_units_in_frame(256, th),
            _NL.count_units_in_frame(256, tw))


def _lr_taps():
    """Tied (v == h) 6-tap rows for the static presets."""
    from av1tpu.specav1 import jax_lr
    p = np.asarray(jax_lr.PRESETS, np.int32)
    return np.concatenate([p, p], axis=1)


def _lr_table(choice_grid, taps6):
    """(choice_grid', taps_table) for the tile writer: preset rows
    0..P-1 (tied), then one solved (v0,v1,v2,h0,h1,h2) row per RU;
    device choice P (= solved) maps to row P + ru_index."""
    from av1tpu.specav1 import jax_lr
    P = len(jax_lr.PRESETS)
    nru = taps6.shape[0]
    tab = np.concatenate([_lr_taps(), np.asarray(taps6, np.int32)],
                         axis=0)
    idx = np.where(choice_grid == P,
                   P + np.arange(nru, dtype=np.int32).reshape(
                       choice_grid.shape),
                   choice_grid)
    return idx.astype(np.int32), tab


def _tile_plan(th: int, chips: int = 1):
    """(tile_rows_log2, spans, block_row_starts) for a coded height.

    chips > 4 raises the tile-row count so keyframe tile-row sharding
    (jax_sharded.key_stripe_plan needs n <= 2^trl2 dividing it) and
    parallel host entropy keep one-or-more tiles per chip.  Tile rows
    cost a few bits each (per-tile CDF reset), so the bump is
    chip-count-conditioned, not default."""
    from av1tpu.specav1 import writer as _W
    mi_rows = 2 * ((th + 7) >> 3)
    sbr = (mi_rows + 15) >> 4
    trl2 = 2 if sbr >= 8 else 0
    if chips > 4 and sbr >= 8:
        want = (chips - 1).bit_length()
        max_l2 = 0
        while (1 << (max_l2 + 1)) <= min(sbr, 64):
            max_l2 += 1
        trl2 = min(max(trl2, want), max_l2)
    spans = _W.tile_row_spans(th, trl2)
    brs = tuple(mi0 // 8 for mi0, _ in spans[1:])
    return trl2, spans, brs


class SpecTpuEngine(TpuEngine):
    """Standard-AV1 engine (see module docstring)."""

    def __init__(self, cfg: Optional[TpuEncoderConfig] = None):
        super().__init__(cfg)
        self._order_hint = 0
        self._dispatch = None  # ordered upload+dispatch worker (lazy)
        self._mesh = None      # multi-chip stripe mesh (lazy)
        self._gop_deblock = False
        self._qround = float(getattr(self.cfg, "qround", 0.70))
        self._cdef = bool(getattr(self.cfg, "cdef", True))
        self._lr = bool(getattr(self.cfg, "lr", True))
        # per-block LAST/GOLDEN reference selection (slot 1 holds the
        # GOP keyframe; see specav1.jax_inter golden docstring)
        self._golden = bool(getattr(self.cfg, "golden", True))
        self._golden_dev = None
        self._golden_shard = None
        # delta-upload base chain: the previous source frame's padded
        # planes on host (for packing) and on device (for unpacking —
        # chunk outputs carry it forward, so it's never re-uploaded)
        self._delta_upload = bool(getattr(self.cfg, "delta_upload",
                                          True))
        self._src_base_host = None
        self._src_base_dev = None

    def _stripe_mesh(self, ph: int, th: int):
        """The ("stripe",) device mesh when multi-chip striping is on
        (tpu.num_chips; 0 = all visible devices) and the geometry
        shards; None -> single-device path."""
        import jax
        from av1tpu.specav1 import jax_sharded
        devs = jax.devices()
        n = int(getattr(self.cfg, "num_chips", 0))
        if n == 0:
            # 0 = all real chips; the virtual CPU mesh (tests) stripes
            # only when num_chips is set explicitly
            n = len(devs) if devs[0].platform != "cpu" else 1
        n = min(n, len(devs))
        # strip geometries (th%32==16) compose: the stripe bodies skip
        # the bottom strip and jax_sharded codes it on the gathered
        # full-frame recon
        if n < 2 or not jax_sharded.sharding_ok(ph, th, n):
            return None
        if self._mesh is None or self._mesh.shape["stripe"] != n:
            self._mesh = jax_sharded.make_mesh(n)
        return self._mesh

    def start_stream(self) -> None:
        super().start_stream()
        self._order_hint = 0
        self._gop_deblock = False
        self._src_base_host = None
        self._src_base_dev = None

    def _dispatch_pool(self):
        if self._dispatch is None:
            from concurrent.futures import ThreadPoolExecutor
            self._dispatch = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="av1spec-dispatch")
        return self._dispatch

    def _resolve_refs(self):
        """The reference chain may be a thunk onto an in-flight chunk
        dispatch; resolve to device arrays."""
        r = self._ref_dev
        if callable(r):
            r = r()
            self._ref_dev = r
        return r

    def _resolve_golden(self, ph: int, mesh=None):
        """The GOLDEN reference (GOP keyframe recon, slot 1) padded to
        the working height; row-sharded once per GOP when striping
        (golden is constant between keyframes, so the resharding
        device_put never repeats inside a GOP).  None when the golden
        tool is off."""
        if not self._golden or self._golden_dev is None:
            return None
        import jax.numpy as jnp
        g = self._golden_dev
        if g[0].shape[0] != ph:
            dpad = ph - g[0].shape[0]
            g = (jnp.pad(g[0], ((0, dpad), (0, 0))),
                 jnp.pad(g[1], ((0, dpad // 2), (0, 0))),
                 jnp.pad(g[2], ((0, dpad // 2), (0, 0))))
            self._golden_dev = g
        if mesh is not None:
            if (self._golden_shard is None
                    or self._golden_shard[0].shape[0] != ph):
                from av1tpu.specav1 import jax_sharded
                self._golden_shard = tuple(
                    jax_sharded.shard_rows(mesh, p) for p in g)
            return self._golden_shard
        return g

    def _chunk_cap(self, width: int, height: int,
                   bit_depth: int) -> int:
        """K P-frames per lax.scan dispatch, capped so the scan program
        stays inside the validated compile envelope (8 x 1080p).
        Multi-chip striping composes: the scan steps striped frame
        encodes whose carry is the row-sharded reconstruction
        (jax_sharded.encode_chunk_sharded)."""
        budget = 8 * 1920 * 1088
        px = width * height * (2 if bit_depth > 8 else 1)
        return max(1, budget // max(1, px))

    def _block_for(self, frame) -> int:
        return 32  # spec grid is fixed 32x32

    # ---- frame pipeline -------------------------------------------------
    def _submit(self, frame, qindex, force_key: bool = False,
                is_key: Optional[bool] = None, refresh: bool = True):
        import jax.numpy as jnp
        from av1tpu.specav1 import jax_intra, jax_inter
        if is_key is None:
            is_key = self._decide_key(frame, force_key)
        if self._ref_dev is None:
            is_key = True
        h, w = frame.height, frame.width
        bd = frame.bit_depth
        yp, up, vp = self._pad_planes(frame, 64)
        ph, pw = yp.shape
        # true-dims coding: headers carry the real frame size and the
        # last block row/col overhangs (like any conformant encoder);
        # unsupported remainders fall back to render_size padding
        true_ok = _axis_true_dims_ok(w) and _axis_true_dims_ok(h, True)
        th, tw = (h, w) if true_ok else (ph, pw)
        oh = self._order_hint & 127
        self._order_hint += 1
        # one packed H2D upload instead of three round trips
        packed_src = np.concatenate([yp.ravel(), up.ravel(), vp.ravel()])
        yj, uj, vj = _unpack_planes(jnp.asarray(packed_src), ph, pw)
        # delta-upload base chain: this frame's source is the next
        # chunk's prediction base (host copy packs, device copy unpacks)
        self._src_base_host = (yp, up, vp)
        self._src_base_dev = (yj, uj, vj)
        total = ph * pw + 2 * (ph // 2) * (pw // 2)
        cap = total // SPARSE_CAP_FRACTION
        if is_key:
            # deblocking is RD-decided per GOP: it helps smooth/blocky
            # content and hurts grainy sources (smoothing the noise the
            # next frame must re-code).  Strip geometries (th%32==16,
            # e.g. 720/2160) filter their 16px strip edges via the
            # loopfilter's masked passes; the masks assume a 16px-
            # aligned coded width there.
            self._gop_deblock = (noise_floor(frame.y) <= 1.0
                                 and (th % 32 == 0
                                      or (th % 32 == 16
                                          and tw % 16 == 0)))
        lfy, lfuv = lf_levels(qindex, bd) if self._gop_deblock else (0, 0)
        damp = cdef_damping(qindex) if self._cdef else None
        mesh = self._stripe_mesh(ph, th)
        chips = mesh.shape["stripe"] if mesh is not None else 1
        if is_key:
            trl2, _, brs = _tile_plan(th, chips)
            kplan = None
            if mesh is not None:
                from av1tpu.specav1 import jax_sharded
                kplan = jax_sharded.key_stripe_plan(th, ph, chips, trl2)
            if kplan is not None:
                # tile-row-parallel keyframe: each chip wavefronts its
                # own tile rows (tiles share no prediction state), strip
                # + filters compose on the gathered recon
                from av1tpu.specav1 import jax_sharded
                stripe_h, ph_s, local_brs = kplan
                dp = ph_s - yp.shape[0]
                yk = np.pad(yp, ((0, dp), (0, 0)), mode="edge")
                uk = np.pad(up, ((0, dp // 2), (0, 0)), mode="edge")
                vk = np.pad(vp, ((0, dp // 2), (0, 0)), mode="edge")
                out = jax_sharded.encode_key_sharded(
                    mesh, jax_sharded.shard_rows(mesh, yk),
                    jax_sharded.shard_rows(mesh, uk),
                    jax_sharded.shard_rows(mesh, vk),
                    jnp.int32(qindex), bit_depth=bd, th=th, tw=tw,
                    stripe_h=stripe_h, local_brs=local_brs,
                    lf_y=jnp.int32(lfy), lf_uv=jnp.int32(lfuv),
                    deblock=self._gop_deblock, qround=self._qround,
                    cdef=self._cdef, cdef_damping=jnp.int32(damp or 4),
                    lr=self._lr)
                # crop the stripe pad back to the engine's SB-padded
                # height so the GOP reference chain sees (ph, pw)
                out = (out[0][:ph], out[1][:ph // 2], out[2][:ph // 2],
                       out[3][:ph], out[4][:ph // 2], out[5][:ph // 2],
                       ) + tuple(out[i][:ph // 32]
                                 for i in range(6, 15)) + \
                    (out[15], out[16], out[17], out[18])
            else:
                out = jax_intra._encode_frame(
                    yj, uj, vj, jnp.int32(qindex), nbr=ph // 32,
                    nbc=pw // 32, bit_depth=bd, th=th, tw=tw,
                    tile_row_starts=brs, lf_y=jnp.int32(lfy),
                    lf_uv=jnp.int32(lfuv), deblock=self._gop_deblock,
                    qround=self._qround, cdef=self._cdef,
                    cdef_damping=jnp.int32(damp or 4), lr=self._lr)
            self._ref_dev = out[0:3]
            self._golden_dev = out[0:3]
            self._golden_shard = None
            grids = jnp.concatenate([out[i].reshape(-1)
                                     for i in range(6, 19)])
            pk = _pack_outputs(out[3], out[4], out[5], grids, cap)
            return ("key", qindex, w, h, th, tw, ph, pw, bd, oh,
                    refresh, out, pk, cap, lfy, lfuv, damp, self._lr,
                    self._golden, chips)
        refs = self._resolve_refs()
        if mesh is not None:
            from av1tpu.specav1 import jax_sharded
            n = mesh.shape["stripe"]
            ph_s = jax_sharded.stripe_pad(ph, n)
            if ph_s != ph:
                yp2 = np.pad(yp, ((0, ph_s - ph), (0, 0)), mode="edge")
                up2 = np.pad(up, ((0, (ph_s - ph) // 2), (0, 0)),
                             mode="edge")
                vp2 = np.pad(vp, ((0, (ph_s - ph) // 2), (0, 0)),
                             mode="edge")
            else:
                yp2, up2, vp2 = yp, up, vp
            ys = jax_sharded.shard_rows(mesh, yp2)
            us = jax_sharded.shard_rows(mesh, up2)
            vs = jax_sharded.shard_rows(mesh, vp2)
            # refs are consumed row-sharded (halo exchange inside):
            # keyframe recon is ph tall, stripe rows need ph_s — pad
            # once per GOP (rows beyond the coded frame are remapped
            # away by the halo clamp gather, so the fill is never read)
            if refs[0].shape[0] != ph_s:
                dpad = ph_s - refs[0].shape[0]
                refs = (jnp.pad(refs[0], ((0, dpad), (0, 0))),
                        jnp.pad(refs[1], ((0, dpad // 2), (0, 0))),
                        jnp.pad(refs[2], ((0, dpad // 2), (0, 0))))
            gld = self._resolve_golden(ph_s, mesh)
            out = jax_sharded.encode_inter_sharded(
                mesh, ys, us, vs, refs[0], refs[1], refs[2], qindex,
                bit_depth=bd, th=th, tw=tw, lf_y=jnp.int32(lfy),
                lf_uv=jnp.int32(lfuv), deblock=self._gop_deblock,
                qround=self._qround, cdef=self._cdef,
                cdef_damping=jnp.int32(damp or 4), lr=self._lr,
                golden=gld is not None,
                gld_y=gld[0] if gld else None,
                gld_u=gld[1] if gld else None,
                gld_v=gld[2] if gld else None)
            # recon/levels beyond the coded padded height are garbage
            # rows of the stripe pad; the ref slots keep them (cropped
            # at true dims by the next frame's prep_ref)
            ph = ph_s
        else:
            gld = self._resolve_golden(ph)
            gkw = (dict(golden=True, gld_y=gld[0], gld_u=gld[1],
                        gld_v=gld[2]) if gld is not None else {})
            out = jax_inter._encode_frame(
                yj, uj, vj, refs[0], refs[1], refs[2],
                qindex, bd, th=th, tw=tw, lf_y=jnp.int32(lfy),
                lf_uv=jnp.int32(lfuv), deblock=self._gop_deblock,
                qround=self._qround, cdef=self._cdef,
                cdef_damping=jnp.int32(damp or 4), lr=self._lr, **gkw)
        if refresh:
            self._ref_dev = out[5:8]
        grids = jnp.concatenate([out[0].reshape(-1),
                                 out[1].reshape(-1),
                                 out[8].reshape(-1),
                                 out[9].reshape(-1),
                                 out[10].reshape(-1),
                                 out[11].reshape(-1),
                                 out[12].reshape(-1),
                                 out[13].reshape(-1),
                                 out[14].reshape(-1),
                                 out[15].reshape(-1)])
        pk = _pack_outputs(out[2], out[3], out[4], grids, cap)
        return ("inter", qindex, w, h, th, tw, ph, pw, bd, oh,
                refresh, out, pk, cap, lfy, lfuv, damp, self._lr,
                self._golden, chips)

    def _submit_chunk(self, frames, qindexes):
        """Upload + dispatch run on an ordered worker thread: the 25MB
        packed H2D of chunk N+1 overlaps chunk N's host entropy coding
        (the blocking host->device copy is the tunnel's long pole)."""
        import jax.numpy as jnp
        f0 = frames[0]
        w, h, bd = f0.width, f0.height, f0.bit_depth
        planes = [self._pad_planes(fr, 64) for fr in frames]
        ph, pw = planes[0][0].shape
        true_ok = _axis_true_dims_ok(w) and _axis_true_dims_ok(h, True)
        th, tw = (h, w) if true_ok else (ph, pw)
        k = len(frames)
        ohs = [(self._order_hint + i) & 127 for i in range(k)]
        self._order_hint += k
        mesh = self._stripe_mesh(ph, th)
        if mesh is not None:
            # chunk x stripe composition: pad each frame to the stripe
            # height; the sharded scan carries the row-sharded recon
            from av1tpu.specav1 import jax_sharded
            n = mesh.shape["stripe"]
            ph_s = jax_sharded.stripe_pad(ph, n)
            if ph_s != ph:
                planes = [
                    (np.pad(y_, ((0, ph_s - ph), (0, 0)), mode="edge"),
                     np.pad(u_, ((0, (ph_s - ph) // 2), (0, 0)),
                            mode="edge"),
                     np.pad(v_, ((0, (ph_s - ph) // 2), (0, 0)),
                            mode="edge"))
                    for (y_, u_, v_) in planes]
                ph = ph_s
        total = ph * pw + 2 * (ph // 2) * (pw // 2)
        cap = k * (total // SPARSE_CAP_FRACTION)
        ref_prev = self._ref_dev
        # golden resolves on the submit thread (the keyframe that owns
        # it was submitted synchronously before this chunk; resolving
        # inside the worker could race a NEXT GOP's keyframe update)
        gld = self._resolve_golden(ph, mesh)
        qi = list(qindexes)

        dbl = self._gop_deblock
        lf = [lf_levels(q, bd) if dbl else (0, 0) for q in qi]
        damps = [cdef_damping(q) if self._cdef else None for q in qi]
        use_cdef = self._cdef
        use_lr = self._lr

        # delta-upload: snapshot the base chain synchronously (ordered
        # with other submits) and advance the host side to this chunk's
        # last frame; the device side advances through the chunk
        # program's src_last output (never re-uploaded)
        base_host, base_dev = self._src_base_host, self._src_base_dev
        # packed delta upload runs at every bit depth and under
        # striping (round-5: unpack's cumsums are frame-/row-local, so
        # the row-sharded layout partitions them; VERDICT r4 item 6) —
        # only a missing/misshapen base chain falls back to raw
        use_pack = (self._delta_upload
                    and base_host is not None and base_dev is not None)
        self._src_base_host = planes[-1]

        def _grow(tri, xp):
            """Edge-pad a base plane triple to (ph, pw) rows, or None
            when the widths disagree (host and device pads must match
            exactly for the mod-2^bd delta chain)."""
            if tri[0].shape == (ph, pw):
                return tri
            if tri[0].shape[1] != pw or tri[0].shape[0] > ph:
                return None
            d = ph - tri[0].shape[0]
            return (xp.pad(tri[0], ((0, d), (0, 0)), mode="edge"),
                    xp.pad(tri[1], ((0, d // 2), (0, 0)), mode="edge"),
                    xp.pad(tri[2], ((0, d // 2), (0, 0)), mode="edge"))

        def worker():
            from av1tpu.encoder import io_pack
            refs = ref_prev() if callable(ref_prev) else ref_prev
            if refs[0].shape[0] != ph:
                dpad = ph - refs[0].shape[0]
                refs = (jnp.pad(refs[0], ((0, dpad), (0, 0))),
                        jnp.pad(refs[1], ((0, dpad // 2), (0, 0))),
                        jnp.pad(refs[2], ((0, dpad // 2), (0, 0))))
            src = None
            packed_delta = False
            if use_pack:
                bh = _grow(base_host, np)
                pk = (io_pack.pack_chunk(planes, bh, bit_depth=bd)
                      if bh is not None else None)
                if pk is not None:
                    bdev = base_dev() if callable(base_dev) else base_dev
                    bdev = _grow(tuple(bdev), jnp)
                if pk is not None and bdev is not None:
                    nib, ep, ev, modes = pk
                    src = (jnp.asarray(nib), jnp.asarray(ep),
                           jnp.asarray(ev), jnp.asarray(modes), *bdev)
                    packed_delta = True
            if src is None:
                src = jnp.asarray(np.concatenate(
                    [np.stack([p[0] for p in planes]).ravel(),
                     np.stack([p[1] for p in planes]).ravel(),
                     np.stack([p[2] for p in planes]).ravel()]))
            args = (src, *refs,
                    jnp.asarray(qi, jnp.int32),
                    jnp.asarray([a for a, _ in lf], jnp.int32),
                    jnp.asarray([b for _, b in lf], jnp.int32),
                    jnp.asarray([d or 4 for d in damps], jnp.int32))
            kw = dict(k=k, ph=ph, pw=pw, bit_depth=bd, th=th, tw=tw,
                      cap=cap, deblock=dbl, qround=self._qround,
                      cdef=use_cdef, lr=use_lr,
                      golden=gld is not None,
                      gy=gld[0] if gld else None,
                      gu=gld[1] if gld else None,
                      gv=gld[2] if gld else None)
            if mesh is not None:
                from av1tpu.specav1 import jax_sharded as _js
                return _js.encode_chunk_sharded(
                    mesh, *args, packed_delta=packed_delta, **kw)
            return _encode_chunk(*args, packed_delta=packed_delta, **kw)

        fut = self._dispatch_pool().submit(worker)
        self._ref_dev = lambda: fut.result()[0]
        # device base = this chunk's last source (stays on device;
        # the sharded program returns it row-sharded)
        self._src_base_dev = lambda: fut.result()[3]
        chips = mesh.shape["stripe"] if mesh is not None else 1
        return (qi, w, h, th, tw, ph, pw, bd, ohs, k, fut, lf, damps,
                use_lr, self._golden, chips)

    @staticmethod
    def _finalize_chunk(pending) -> list:
        import jax as _jax
        (qindexes, w, h, th, tw, ph, pw, bd, ohs, k, fut, lfs,
         damps, lr_on, golden_on, chips) = pending
        _, pk, full = fut.result()[:3]
        rs = (w, h) if (tw, th) != (w, h) else None
        mi_cols, mi_rows = 2 * ((tw + 7) >> 3), 2 * ((th + 7) >> 3)
        gh_t, gw_t = (mi_rows + 7) // 8, (mi_cols + 7) // 8
        gh, gw = ph // 32, pw // 32
        B = gh * gw
        ntot = ph * pw + 2 * (ph // 2) * (pw // 2)
        trl2, spans, _ = _tile_plan(th, chips)
        maskbytes, vals, count, grids = _jax.device_get(pk)
        overflow = int(count) > vals.shape[0]
        if not overflow:
            flat = native.densify(np.asarray(maskbytes),
                                  np.asarray(vals), k * ntot)
        strip = (th % 32) == 16
        nsc = 2 * gw
        grids = np.asarray(grids)
        mv8s = grids[:k * 2 * B].reshape(k, B, 2)
        skips = grids[k * 2 * B:k * 3 * B].reshape(k, B)
        stripss = grids[k * 3 * B:k * (3 * B + nsc)].reshape(k, nsc)
        cdefss = grids[k * (3 * B + nsc):
                       k * (3 * B + nsc + 4)].reshape(k, 4)
        urows, ucols = _lr_nru(th, tw)
        nru = urows * ucols
        p0 = k * (3 * B + nsc + 4)
        lrcs = grids[p0:p0 + k * nru].reshape(k, nru)
        p0 += k * nru
        splitss = grids[p0:p0 + k * B].reshape(k, B)
        mv16ss = grids[p0 + k * B:p0 + k * 9 * B].reshape(k, B, 4, 2)
        skip16ss = grids[p0 + k * 9 * B:
                         p0 + k * 13 * B].reshape(k, B, 4)
        refselss = grids[p0 + k * 13 * B:
                         p0 + k * 14 * B].reshape(k, B)
        p1 = p0 + k * 14 * B
        lrtapss = grids[p1:p1 + k * nru * 6].reshape(k, nru, 6)

        def one(i):
            if overflow:
                ylv, ulv, vlv = (np.asarray(a) for a in _jax.device_get(
                    (full[0][i], full[1][i], full[2][i])))
            else:
                fl = flat[i * ntot:(i + 1) * ntot]
                ylv = fl[:ph * pw].reshape(ph, pw)
                ulv = fl[ph * pw:ph * pw + (ph // 2) * (pw // 2)] \
                    .reshape(ph // 2, pw // 2)
                vlv = fl[ph * pw + (ph // 2) * (pw // 2):] \
                    .reshape(ph // 2, pw // 2)
            modes = (1 + 3 * refselss[i].reshape(gh, gw)[:gh_t, :gw_t]
                     ).astype(np.int32)
            tiles = native.encode_tile_rows(
                "inter", qindexes[i], mi_cols, mi_rows, spans,
                (modes, mv8s[i].reshape(gh, gw, 2)[:gh_t, :gw_t],
                 skips[i].reshape(gh, gw)[:gh_t, :gw_t]),
                ylv, ulv, vlv,
                strip_skip=stripss[i] if strip else None,
                lr=((256,) + _lr_table(lrcs[i].reshape(urows, ucols),
                                       lrtapss[i]))
                if lr_on else None,
                split3=(splitss[i].reshape(gh, gw)[:gh_t, :gw_t],
                        mv16ss[i].reshape(gh, gw, 4, 2)[:gh_t, :gw_t],
                        skip16ss[i].reshape(gh, gw, 4)[:gh_t, :gw_t]))
            ch = None
            if damps[i] is not None:
                ch = (damps[i],) + tuple(int(x) for x in cdefss[i])
            hdr = W.write_inter_frame_header(
                tw, th, qindexes[i], order_hint=ohs[i],
                ref_slots=(0, 0, 0, 1, 0, 0, 0) if golden_on
                else (0,) * 7,
                render_size=rs, tile_rows_log2=trl2,
                lf_level=lfs[i][0], lf_level_uv=lfs[i][1], cdef=ch,
                lr_types=(1, 0, 0) if lr_on else None)
            hdr.byte_align()
            return obu_mod.make_obu(
                obu_mod.OBU_FRAME,
                hdr.tobytes() + W.assemble_tile_group(tiles)), False

        # frames in parallel on the entropy pool; each frame's tiles
        # fan out further on the native tile pool (distinct pools, so
        # no nested-submit deadlock)
        from av1tpu.engine_tpu import _entropy_pool
        return list(_entropy_pool().map(one, range(k)))

    @staticmethod
    def _finalize(pending) -> tuple[bytes, bool]:
        import jax as _jax
        (kind, qindex, w, h, th, tw, ph, pw, bd, oh, refresh, out,
         pk, cap, lfy, lfuv, cdamp, lr_on, golden_on, chips) = pending
        # true dims: headers carry (tw, th); render_size only for the
        # padded fallback where the coded frame exceeds the display area
        rs = (w, h) if (tw, th) != (w, h) else None
        mi_cols, mi_rows = 2 * ((tw + 7) >> 3), 2 * ((th + 7) >> 3)
        # the device computes the full padded grid; the coded grid may
        # be smaller (e.g. a 96-tall frame pads to 128: 3 coded block
        # rows of 4)
        gh_t, gw_t = (mi_rows + 7) // 8, (mi_cols + 7) // 8
        gh, gw = ph // 32, pw // 32
        shapes = [(ph, pw), (ph // 2, pw // 2), (ph // 2, pw // 2)]
        # multi-tile rows: parallel native entropy coding, and the unit
        # of multi-chip sharding (one chip's stripe = N tile rows)
        trl2, spans, _ = _tile_plan(th, chips)
        # sparse level transfer (one small D2H); full-plane fallback on
        # capacity overflow
        maskbytes, vals, count, grids = _jax.device_get(pk)
        lvs = _unpack_levels(maskbytes, vals, count, shapes)
        strip = (th % 32) == 16
        nsc = 2 * gw
        B = gh * gw
        urows, ucols = _lr_nru(th, tw)
        nru = urows * ucols
        # layouts -- key:   [mode B][uv B][skip B][angle B][split B]
        #                   [m16 4B][uv16 4B][a16 4B][s16 4B]
        #                   [strip nsc][cdefs 4][lr nru]
        #            inter: [mv8 2B][skip B][strip nsc][cdefs 4][lr nru]
        #                   [split B][mv16 8B][skip16 4B]
        if kind == "key":
            cdef_off = 21 * B + nsc
        else:
            cdef_off = 3 * B + nsc
        lr_choice = grids[cdef_off + 4:cdef_off + 4 + nru].reshape(
            urows, ucols)
        lr_kw = {}
        lr_arg = None
        if lr_on:
            taps6 = grids[-6 * nru:].reshape(nru, 6)
            lr_arg = (256,) + _lr_table(lr_choice, taps6)
            lr_kw["lr_types"] = (1, 0, 0)
        cdef_hdr = None
        if cdamp is not None:
            cs = [int(x) for x in grids[cdef_off:cdef_off + 4]]
            cdef_hdr = (cdamp, cs[0], cs[1], cs[2], cs[3])
        if kind == "key":
            if lvs is None:
                lv_y, lv_u, lv_v = (np.asarray(a)
                                    for a in _jax.device_get(out[3:6]))
            else:
                lv_y, lv_u, lv_v = lvs
            ng = gh * gw
            g_mode = grids[:ng].reshape(gh, gw)
            g_uv = grids[ng:2 * ng].reshape(gh, gw)
            g_skip = grids[2 * ng:3 * ng].reshape(gh, gw)
            g_angle = grids[3 * ng:4 * ng].reshape(gh, gw)
            g_split = grids[4 * ng:5 * ng].reshape(gh, gw)
            g_m16 = grids[5 * ng:9 * ng].reshape(gh, gw, 4)
            g_uv16 = grids[9 * ng:13 * ng].reshape(gh, gw, 4)
            g_a16 = grids[13 * ng:17 * ng].reshape(gh, gw, 4)
            g_s16 = grids[17 * ng:21 * ng].reshape(gh, gw, 4)
            strip_skip = grids[21 * ng:21 * ng + nsc] if strip else None
            tiles = native.encode_tile_rows(
                "key", qindex, mi_cols, mi_rows, spans,
                (g_mode[:gh_t, :gw_t], g_uv[:gh_t, :gw_t],
                 g_skip[:gh_t, :gw_t]), lv_y, lv_u, lv_v,
                strip_skip=strip_skip, lr=lr_arg,
                angles=g_angle[:gh_t, :gw_t],
                key_split5=(g_split[:gh_t, :gw_t],
                            g_m16[:gh_t, :gw_t],
                            g_uv16[:gh_t, :gw_t],
                            g_a16[:gh_t, :gw_t],
                            g_s16[:gh_t, :gw_t]))
            hdr = W.write_key_frame_header(tw, th, qindex,
                                           order_hint=oh, render_size=rs,
                                           tile_rows_log2=trl2,
                                           lf_level=lfy, lf_level_uv=lfuv,
                                           cdef=cdef_hdr, **lr_kw)
            hdr.byte_align()
            seq = SpecSequenceHeader(
                w, h, bd, enable_cdef=cdamp is not None,
                enable_restoration=lr_on).seq_obu()
            payload = seq + obu_mod.make_obu(
                obu_mod.OBU_FRAME,
                hdr.tobytes() + W.assemble_tile_group(tiles))
            return payload, True
        if lvs is None:
            ylv, ulv, vlv = (np.asarray(a)
                             for a in _jax.device_get(out[2:5]))
        else:
            ylv, ulv, vlv = lvs
        mv8 = grids[:2 * B].reshape(B, 2)
        skip = grids[2 * B:3 * B]
        strip_skip = grids[3 * B:3 * B + nsc] if strip else None
        tail = cdef_off + 4 + nru
        splits = grids[tail:tail + B].reshape(gh, gw)
        mvs16 = grids[tail + B:tail + 9 * B].reshape(gh, gw, 4, 2)
        skips16 = grids[tail + 9 * B:tail + 13 * B].reshape(gh, gw, 4)
        refsel = grids[tail + 13 * B:tail + 14 * B].reshape(gh, gw)
        # inter mode grid: 1 = inter/LAST, 4 = inter/GOLDEN (slot 1)
        modes = (1 + 3 * refsel[:gh_t, :gw_t]).astype(np.int32)
        tiles = native.encode_tile_rows(
            "inter", qindex, mi_cols, mi_rows, spans,
            (modes, np.asarray(mv8).reshape(gh, gw, 2)[:gh_t, :gw_t],
             np.asarray(skip).reshape(gh, gw)[:gh_t, :gw_t]),
            ylv, ulv, vlv, strip_skip=strip_skip, lr=lr_arg,
            split3=(splits[:gh_t, :gw_t], mvs16[:gh_t, :gw_t],
                    skips16[:gh_t, :gw_t]))
        hdr = W.write_inter_frame_header(
            tw, th, qindex, order_hint=oh,
            refresh_frame_flags=0x01 if refresh else 0x00,
            ref_slots=(0, 0, 0, 1, 0, 0, 0) if golden_on else (0,) * 7,
            render_size=rs, tile_rows_log2=trl2,
            lf_level=lfy, lf_level_uv=lfuv, cdef=cdef_hdr, **lr_kw)
        hdr.byte_align()
        payload = obu_mod.make_obu(
            obu_mod.OBU_FRAME,
            hdr.tobytes() + W.assemble_tile_group(tiles))
        return payload, False

    # ---- daemon surface -------------------------------------------------
    def sequence_header(self, width: int, height: int,
                        bit_depth: int = 8,
                        source_stream=None) -> SpecSequenceHeader:
        sh = SpecSequenceHeader(width, height, bit_depth,
                                enable_cdef=self._cdef,
                                enable_restoration=self._lr)
        if source_stream is not None:
            sh.color_primaries = getattr(source_stream,
                                         "color_primaries_code", 0)
            sh.color_transfer = getattr(source_stream,
                                        "color_transfer_code", 0)
            sh.color_matrix = getattr(source_stream,
                                      "color_matrix_code", 0)
        return sh

    def codec_private(self, sh) -> bytes:
        return sh.av1c()

    def _prewarm(self, width: int, height: int, bit_depth: int = 8):
        """Compile the spec program shapes before frames flow, with the
        same (th, tw) statics _submit will use (a mismatch would
        recompile both 1080p programs inside the timed path).

        The three programs (intra wavefront, single inter, chunked
        inter) are independent XLA compiles, so they run on parallel
        threads — distinct programs compile concurrently on this
        platform (measured 99 s sequential vs 18 s threaded for two
        fresh shapes).  With the persistent compile cache hot the whole
        prewarm is ~20 s at 1080p including transfers."""
        import threading

        import jax as _jax
        import jax.numpy as jnp
        from av1tpu.specav1 import jax_intra, jax_inter
        ph, pw = (height + 63) & ~63, (width + 63) & ~63
        true_ok = _axis_true_dims_ok(width) and _axis_true_dims_ok(height)
        th, tw = (height, width) if true_ok else (ph, pw)
        dt = np.uint8 if bit_depth == 8 else np.uint16
        y = jnp.zeros((ph, pw), dt)
        u = jnp.zeros((ph // 2, pw // 2), dt)
        v = jnp.zeros((ph // 2, pw // 2), dt)
        # inter/chunk reference planes: int32 recon (what intra emits)
        ry = jnp.zeros((ph, pw), jnp.int32)
        ru = jnp.zeros((ph // 2, pw // 2), jnp.int32)
        rv = jnp.zeros((ph // 2, pw // 2), jnp.int32)
        m = self._stripe_mesh(ph, th)
        _, _, brs = _tile_plan(th, m.shape["stripe"] if m else 1)
        total = ph * pw + 2 * (ph // 2) * (pw // 2)
        cap = total // SPARSE_CAP_FRACTION
        k = min(max(1, int(getattr(self.cfg, "chunk", 1))),
                self._chunk_cap(width, height, bit_depth))

        def warm_intra():
            kout = jax_intra._encode_frame(y, u, v, jnp.int32(96),
                                           nbr=ph // 32, nbc=pw // 32,
                                           bit_depth=bit_depth, th=th,
                                           tw=tw, tile_row_starts=brs,
                                           lf_y=jnp.int32(0),
                                           lf_uv=jnp.int32(0),
                                           qround=self._qround,
                                           cdef=self._cdef,
                                           cdef_damping=jnp.int32(4),
                                           lr=self._lr)
            # the exact packer shape _submit uses (13-part grid concat)
            gk = jnp.concatenate([kout[i].reshape(-1)
                                  for i in range(6, 19)])
            _jax.device_get(
                _pack_outputs(kout[3], kout[4], kout[5], gk, cap))

        gkw = (dict(golden=True, gld_y=ry, gld_u=ru, gld_v=rv)
               if self._golden else {})

        def warm_inter():
            iout = jax_inter._encode_frame(y, u, v, ry, ru, rv, 96,
                                           bit_depth, th=th, tw=tw,
                                           lf_y=jnp.int32(0),
                                           lf_uv=jnp.int32(0),
                                           qround=self._qround,
                                           cdef=self._cdef,
                                           cdef_damping=jnp.int32(4),
                                           lr=self._lr, **gkw)
            gi = jnp.concatenate([iout[0].reshape(-1),
                                  iout[1].reshape(-1),
                                  iout[8].reshape(-1),
                                  iout[9].reshape(-1),
                                  iout[10].reshape(-1),
                                  iout[11].reshape(-1),
                                  iout[12].reshape(-1),
                                  iout[13].reshape(-1),
                                  iout[14].reshape(-1),
                                  iout[15].reshape(-1)])
            _jax.device_get(
                _pack_outputs(iout[2], iout[3], iout[4], gi, cap))

        def warm_chunk():
            packed = jnp.zeros((k * total,), dt)
            _encode_chunk(packed, ry, ru, rv,
                          jnp.full((k,), 96, jnp.int32),
                          jnp.full((k,), 10, jnp.int32),
                          jnp.full((k,), 10, jnp.int32),
                          jnp.full((k,), 4, jnp.int32), k=k, ph=ph,
                          pw=pw, bit_depth=bit_depth, th=th, tw=tw,
                          cap=k * cap, qround=self._qround,
                          cdef=self._cdef, lr=self._lr,
                          golden=self._golden,
                          gy=ry if self._golden else None,
                          gu=ru if self._golden else None,
                          gv=rv if self._golden else None,
                          )[1][0].block_until_ready()

        def warm_chunk_packed():
            from av1tpu.encoder import io_pack
            total_ = k * total
            evdt = jnp.uint8 if bit_depth == 8 else jnp.uint16
            src = (jnp.zeros((total_ // 2,), jnp.uint8),
                   jnp.full((io_pack.CAP_PER_FRAME * k,), total_,
                            jnp.int32),
                   jnp.zeros((io_pack.CAP_PER_FRAME * k,), evdt),
                   jnp.zeros((3,), jnp.int32), y, u, v)
            _encode_chunk(src, ry, ru, rv,
                          jnp.full((k,), 96, jnp.int32),
                          jnp.full((k,), 10, jnp.int32),
                          jnp.full((k,), 10, jnp.int32),
                          jnp.full((k,), 4, jnp.int32), k=k, ph=ph,
                          pw=pw, bit_depth=bit_depth, th=th, tw=tw,
                          cap=k * cap, qround=self._qround,
                          cdef=self._cdef, lr=self._lr,
                          golden=self._golden,
                          gy=ry if self._golden else None,
                          gu=ru if self._golden else None,
                          gv=rv if self._golden else None,
                          packed_delta=True)[1][0].block_until_ready()

        def warm_sharded():
            # multi-chip deployment: compile the sharded key / inter /
            # chunk programs at the exact _submit avals so the first
            # sharded dispatch does not compile in the hot path
            # (VERDICT r4 item 6)
            from av1tpu.specav1 import jax_sharded as _js
            n = m.shape["stripe"]
            trl2, _, _ = _tile_plan(th, n)
            damp0 = jnp.int32(4)
            kplan = _js.key_stripe_plan(th, ph, n, trl2)
            if kplan is not None:
                stripe_h, ph_s_k, local_brs = kplan
                out = _js.encode_key_sharded(
                    m, _js.shard_rows(m, jnp.zeros((ph_s_k, pw), dt)),
                    _js.shard_rows(m, jnp.zeros((ph_s_k // 2, pw // 2),
                                                dt)),
                    _js.shard_rows(m, jnp.zeros((ph_s_k // 2, pw // 2),
                                                dt)),
                    jnp.int32(96), bit_depth=bit_depth, th=th, tw=tw,
                    stripe_h=stripe_h, local_brs=local_brs,
                    lf_y=jnp.int32(0), lf_uv=jnp.int32(0),
                    deblock=False, qround=self._qround,
                    cdef=self._cdef, cdef_damping=damp0, lr=self._lr)
                _jax.device_get(out[6][0, 0])
            ph_s = _js.stripe_pad(ph, n)
            zy = _js.shard_rows(m, jnp.zeros((ph_s, pw), dt))
            zu = _js.shard_rows(m, jnp.zeros((ph_s // 2, pw // 2), dt))
            zv = _js.shard_rows(m, jnp.zeros((ph_s // 2, pw // 2), dt))
            rz = _js.shard_rows(m, jnp.zeros((ph_s, pw), jnp.int32))
            rzu = _js.shard_rows(m, jnp.zeros((ph_s // 2, pw // 2),
                                              jnp.int32))
            rzv = _js.shard_rows(m, jnp.zeros((ph_s // 2, pw // 2),
                                              jnp.int32))
            skw = (dict(golden=True, gld_y=rz, gld_u=rzu, gld_v=rzv)
                   if self._golden else {})
            out = _js.encode_inter_sharded(
                m, zy, zu, zv, rz, rzu, rzv, 96, bit_depth=bit_depth,
                th=th, tw=tw, lf_y=jnp.int32(0), lf_uv=jnp.int32(0),
                deblock=False, qround=self._qround, cdef=self._cdef,
                cdef_damping=damp0, lr=self._lr, **skw)
            _jax.device_get(out[0][0])
            if k > 1:
                total_s = ph_s * pw + 2 * (ph_s // 2) * (pw // 2)
                packed = jnp.zeros((k * total_s,), dt)
                _js.encode_chunk_sharded(
                    m, packed, rz, rzu, rzv,
                    jnp.full((k,), 96, jnp.int32),
                    jnp.full((k,), 10, jnp.int32),
                    jnp.full((k,), 10, jnp.int32),
                    jnp.full((k,), 4, jnp.int32), k=k, ph=ph_s, pw=pw,
                    bit_depth=bit_depth, th=th, tw=tw,
                    cap=k * (total_s // SPARSE_CAP_FRACTION),
                    qround=self._qround, cdef=self._cdef, lr=self._lr,
                    golden=self._golden,
                    gy=rz if self._golden else None,
                    gu=rzu if self._golden else None,
                    gv=rzv if self._golden else None,
                )[1][0].block_until_ready()

        jobs = [warm_intra, warm_inter] + ([warm_chunk] if k > 1 else [])
        if k > 1 and self._delta_upload:
            jobs.append(warm_chunk_packed)
        if m is not None:
            jobs = [warm_sharded]  # sharded deployment compiles these

        # the XLA CPU client is not compile-thread-safe when the
        # persistent cache serializes an executable on one thread while
        # another compiles (observed segfault in
        # compilation_cache.put_executable_and_time under pytest's
        # JAX_PLATFORMS=cpu); parallel prewarm is a TPU cold-start
        # feature — run sequentially everywhere else
        if _jax.default_backend() != "tpu":
            for fn in jobs:
                fn()
            return
        errs = []

        def run(fn):
            try:
                fn()
            except Exception as e:  # surface the first failure
                errs.append(e)

        ts = [threading.Thread(target=run, args=(f,)) for f in jobs]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        if errs:
            raise errs[0]
