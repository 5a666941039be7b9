"""Tile-row sharding over a device mesh (SURVEY.md §2 parallelism design).

The TPU-native analog of the reference's (nonexistent) distributed story,
as specified by the north star: shard superblock tile **rows** across
chips over ICI.  Each device owns a horizontal stripe of the frame:

* intra stripes are independent AV1-style tiles — no cross-tile
  prediction, so no halo and per-stripe entropy coders (bitstream-legal
  tile independence);
* inter stripes reference the previous frame's recon, so each device
  needs ``motion.PAD`` halo rows of the reference from its vertical
  neighbors — exchanged with ``lax.ppermute`` (ICI neighbor traffic, no
  all-to-all), with frame-edge devices edge-replicating instead.

The sharded inter path reproduces the single-chip reference padding
exactly (interior halos are real neighbor rows, frame edges replicate),
so recon is bit-identical to the single-chip encoder for MV ranges within
±motion.MAX_MV < PAD.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from av1tpu.legacy.core import inter_frame
from av1tpu.encoder.kernels import motion

AXIS = "rows"


def make_mesh(n_devices: int = 0) -> Mesh:
    devices = jax.devices()
    if n_devices <= 0:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, "
                         f"have {len(devices)}")
    return Mesh(np.array(devices[:n_devices]), (AXIS,))


def _exchange_ref_halos(ref_local: jnp.ndarray, n_dev: int,
                        pad: int) -> jnp.ndarray:
    """Build the locally padded reference: ``pad`` rows from vertical
    neighbors via ppermute (frame edges replicate), ``pad`` cols edge-pad."""
    idx = jax.lax.axis_index(AXIS)

    # bottom slice of the device above → our top halo
    down = [(i, i + 1) for i in range(n_dev - 1)]
    top_recv = jax.lax.ppermute(ref_local[-pad:], AXIS, down)
    # top slice of the device below → our bottom halo
    up = [(i + 1, i) for i in range(n_dev - 1)]
    bot_recv = jax.lax.ppermute(ref_local[:pad], AXIS, up)

    # frame-edge devices: replicate their own edge rows (normative pad)
    top_edge = jnp.broadcast_to(ref_local[0:1], (pad,) + ref_local.shape[1:])
    bot_edge = jnp.broadcast_to(ref_local[-1:], (pad,) + ref_local.shape[1:])
    top = jnp.where(idx == 0, top_edge, top_recv)
    bot = jnp.where(idx == n_dev - 1, bot_edge, bot_recv)

    ext = jnp.concatenate([top, ref_local, bot], axis=0)
    return jnp.pad(ext, ((0, 0), (pad, pad)), mode="edge")


@functools.partial(jax.jit,
                   static_argnames=("block", "mesh_holder"))
def _encode_inter_sharded_impl(y, u, v, ref_y, ref_u, ref_v, dc_step,
                               ac_step, block: int, mesh_holder):
    mesh = mesh_holder.mesh
    n_dev = mesh.devices.size

    def step(y_l, u_l, v_l, ry_l, ru_l, rv_l):
        ry_p = _exchange_ref_halos(ry_l, n_dev, motion.PAD)
        ru_p = _exchange_ref_halos(ru_l, n_dev, motion.CHROMA_PAD)
        rv_p = _exchange_ref_halos(rv_l, n_dev, motion.CHROMA_PAD)
        out = inter_frame.encode_inter_frame(
            y_l, u_l, v_l, ry_p, ru_p, rv_p, dc_step, ac_step, block)
        mvs, lv_y, lv_u, lv_v, rec_y, rec_u, rec_v = out
        # ICI reduction: total coded coefficients (bitrate proxy telemetry)
        nz = jax.lax.psum((lv_y != 0).sum() + (lv_u != 0).sum()
                          + (lv_v != 0).sum(), AXIS)
        return mvs, lv_y, lv_u, lv_v, rec_y, rec_u, rec_v, nz

    spec_plane = P(AXIS, None)
    spec_blocks = P(AXIS, None)
    fn = shard_map(
        step, mesh=mesh,
        in_specs=(spec_plane,) * 6,
        out_specs=(spec_blocks, spec_blocks, spec_blocks, spec_blocks,
                   spec_plane, spec_plane, spec_plane, P()),
    )
    return fn(y, u, v, ref_y, ref_u, ref_v)


class _MeshHolder:
    """Hashable wrapper so a Mesh can ride a static jit arg."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def __hash__(self):
        return hash(tuple(d.id for d in self.mesh.devices.flat))

    def __eq__(self, other):
        return (isinstance(other, _MeshHolder)
                and self.mesh.devices.shape == other.mesh.devices.shape
                and all(a.id == b.id for a, b in
                        zip(self.mesh.devices.flat, other.mesh.devices.flat)))


def encode_inter_frame_sharded(y, u, v, ref_y, ref_u, ref_v, dc_step,
                               ac_step, block: int, mesh: Mesh):
    """Sharded P-frame encode over row stripes.

    Inputs are global (unpadded-reference) planes; luma height must be
    divisible by n_devices*block and each stripe must span at least
    motion.PAD rows (the halo depth comes from one neighbor).  Returns
    per-stripe-raster levels/mvs (device-major order — each stripe is an
    independent tile), assembled recon planes, and the psum'd
    nonzero-coefficient count.
    """
    n_dev = mesh.devices.size
    h = y.shape[0]
    if h % (n_dev * block):
        raise ValueError(f"luma height {h} not divisible by "
                         f"n_devices*block = {n_dev * block}")
    stripe = h // n_dev
    if stripe < motion.PAD:
        raise ValueError(
            f"stripe height {stripe} < halo depth {motion.PAD}; "
            f"use fewer devices or taller frames")
    if (h // 2) % n_dev or (h // 2 // n_dev) < motion.CHROMA_PAD:
        raise ValueError("chroma stripes too short for halo exchange")
    return _encode_inter_sharded_impl(y, u, v, ref_y, ref_u, ref_v,
                                      dc_step, ac_step, block,
                                      _MeshHolder(mesh))


# ---------------------------------------------------------------------------
# v2 sharded pipeline: full-featured stripes (= tiles)

@functools.partial(jax.jit, static_argnames=("block", "bit_depth",
                                             "mesh_holder"))
def _encode_v2_sharded_impl(y, u, v, ref_y, ref_u, ref_v, dc_step, ac_step,
                            qindex, block: int, bit_depth: int,
                            mesh_holder):
    from av1tpu.legacy.core import inter_frame as IF
    from av1tpu.encoder.kernels import cdef as cdef_mod
    from av1tpu.encoder.kernels import deblock as db_mod
    from av1tpu.encoder.kernels import mc as mc_mod
    from av1tpu.encoder.kernels import restoration as lr_mod

    mesh = mesh_holder.mesh
    n_dev = mesh.devices.size
    n = block
    cn = n // 2
    maxval = (1 << bit_depth) - 1

    def step(y_l, u_l, v_l, ry_l, ru_l, rv_l):
        y_i = y_l.astype(jnp.int32)
        u_i = u_l.astype(jnp.int32)
        v_i = v_l.astype(jnp.int32)
        ry_p = _exchange_ref_halos(ry_l.astype(jnp.int32), n_dev, motion.PAD)
        ru_p = _exchange_ref_halos(ru_l.astype(jnp.int32), n_dev,
                                   motion.CHROMA_PAD)
        rv_p = _exchange_ref_halos(rv_l.astype(jnp.int32), n_dev,
                                   motion.CHROMA_PAD)
        hp, wp = y_i.shape
        hc, wc = u_i.shape

        pos_y = jnp.asarray(motion.block_positions(hp, wp, n))
        y_blocks = IF._to_blocks(y_i, n)
        mv_full = motion.search_v3(y_i, ry_p, n)
        mvs = motion.subpel_refine(y_blocks, ry_p, pos_y, mv_full, n,
                                   maxval=maxval)
        pred_y = mc_mod.predict_subpel_luma(ry_p, pos_y, mvs, n,
                                            motion.PAD, maxval)
        lv_y, rec_y, tx_syms = IF._code_plane_txsel(
            y_blocks, pred_y, dc_step, ac_step, maxval,
            IF.tx_lambda(ac_step))
        pos_c = jnp.asarray(motion.block_positions(hc, wc, cn))
        pred_u = mc_mod.predict_subpel_chroma(ru_p, pos_c, mvs, cn,
                                              motion.CHROMA_PAD, maxval)
        pred_v = mc_mod.predict_subpel_chroma(rv_p, pos_c, mvs, cn,
                                              motion.CHROMA_PAD, maxval)
        lv_u, rec_u = IF._code_plane(IF._to_blocks(u_i, cn), pred_u,
                                     dc_step, ac_step, maxval)
        lv_v, rec_v = IF._code_plane(IF._to_blocks(v_i, cn), pred_v,
                                     dc_step, ac_step, maxval)

        out_y = db_mod.deblock_plane(IF._from_blocks(rec_y, hp, wp, n), n,
                                     qindex, bit_depth)
        out_u = db_mod.deblock_plane(IF._from_blocks(rec_u, hc, wc, cn),
                                     cn, qindex, bit_depth)
        out_v = db_mod.deblock_plane(IF._from_blocks(rec_v, hc, wc, cn),
                                     cn, qindex, bit_depth)
        cdef_y = cdef_mod.cdef_plane(out_y, qindex, bit_depth)
        cdef_u = cdef_mod.cdef_plane(out_u, qindex, bit_depth,
                                     is_chroma=True)
        cdef_v = cdef_mod.cdef_plane(out_v, qindex, bit_depth,
                                     is_chroma=True)

        # frame-global gates via ICI psum of per-stripe partial SSEs,
        # on the same 4x4-subsampled grid as the single-chip metric
        # (stripe heights are multiples of 16, so each device's local
        # [::4] rows ARE the global [::4] rows of its stripe — the psum
        # reproduces the single-chip value bit-exactly)
        yf = y_i[::4, ::4].astype(jnp.float32)
        e_off = jax.lax.psum(jnp.sum(
            (out_y[::4, ::4].astype(jnp.float32) - yf) ** 2), AXIS)
        e_on = jax.lax.psum(jnp.sum(
            (cdef_y[::4, ::4].astype(jnp.float32) - yf) ** 2), AXIS)
        cdef_on = e_on < e_off
        out_y = cdef_mod.select(cdef_on, cdef_y, out_y)
        out_u = cdef_mod.select(cdef_on, cdef_u, out_u)
        out_v = cdef_mod.select(cdef_on, cdef_v, out_v)

        lr_costs = []
        for m in range(lr_mod.N_MODES):
            cand = lr_mod.apply_restoration(out_y[::4, ::4], m, maxval)
            lr_costs.append(jax.lax.psum(jnp.sum(
                (cand.astype(jnp.float32) - yf) ** 2), AXIS))
        lr_mode = jnp.argmin(jnp.stack(lr_costs)).astype(jnp.int32)
        out_y = lr_mod.apply_restoration_dynamic(out_y, lr_mode, maxval)
        out_u = lr_mod.apply_restoration_dynamic(out_u, lr_mode, maxval)
        out_v = lr_mod.apply_restoration_dynamic(out_v, lr_mode, maxval)

        skips = ((lv_y.reshape(lv_y.shape[0], -1) == 0).all(1)
                 & (lv_u.reshape(lv_u.shape[0], -1) == 0).all(1)
                 & (lv_v.reshape(lv_v.shape[0], -1) == 0).all(1))
        out_dtype = jnp.uint8 if bit_depth == 8 else jnp.uint16
        return (mvs.astype(jnp.int16),
                lv_y.reshape(lv_y.shape[0], -1).astype(jnp.int16),
                lv_u.reshape(lv_u.shape[0], -1).astype(jnp.int16),
                lv_v.reshape(lv_v.shape[0], -1).astype(jnp.int16),
                skips,
                out_y.astype(out_dtype), out_u.astype(out_dtype),
                out_v.astype(out_dtype), lr_mode, cdef_on, tx_syms)

    sp = P(AXIS, None)
    sb = P(AXIS, None)
    fn = shard_map(
        step, mesh=mesh,
        in_specs=(sp,) * 6,
        out_specs=(sb, sb, sb, sb, P(AXIS), sp, sp, sp, P(), P(),
                   P(AXIS)),
        # the Pallas search kernel's out_shape has no vma annotation;
        # varying-ness is fully described by the out_specs above
        check_vma=False,
    )
    return fn(y, u, v, ref_y, ref_u, ref_v)


def encode_inter_frame_sharded_v2(y_u8, u_u8, v_u8, ref_y_u8, ref_u_u8,
                                  ref_v_u8, dc_step, ac_step, qindex,
                                  block: int, mesh: Mesh,
                                  bit_depth: int = 8):
    """Full-featured sharded P-frame encode: each device stripe is one
    bitstream tile (subpel MC, deblock, gated CDEF, restoration; gates are
    frame-global via psum).  Same output layout as encode_inter_frame_v2
    minus the sparse pack (stripe-major == raster order)."""
    n_dev = mesh.devices.size
    h = y_u8.shape[0]
    if h % (n_dev * block):
        raise ValueError(f"luma height {h} not divisible by "
                         f"n_devices*block = {n_dev * block}")
    if h // n_dev < motion.PAD or (h // 2 // n_dev) < motion.CHROMA_PAD:
        raise ValueError("stripes too short for halo exchange")
    return _encode_v2_sharded_impl(y_u8, u_u8, v_u8, ref_y_u8, ref_u_u8,
                                   ref_v_u8, dc_step, ac_step, qindex,
                                   block, bit_depth, _MeshHolder(mesh))


# ---------------------------------------------------------------------------
# v2 sharded KEYFRAME pipeline: per-device stripe wavefronts (keyframes
# have no cross-stripe dependencies at all — intra prediction never
# crosses tile rows — so no halo exchange is needed; only the filter
# gates are frame-global, via psum, exactly like the inter path)

@functools.partial(jax.jit, static_argnames=("block", "bit_depth",
                                             "mesh_holder"))
def _encode_key_sharded_impl(y, u, v, dc_step, ac_step, qindex,
                             block: int, bit_depth: int, mesh_holder):
    from av1tpu.legacy.core import intra_frame as KF
    from av1tpu.encoder.kernels import cdef as cdef_mod
    from av1tpu.encoder.kernels import deblock as db_mod
    from av1tpu.encoder.kernels import restoration as lr_mod

    mesh = mesh_holder.mesh
    n = block
    cn = n // 2
    maxval = (1 << bit_depth) - 1

    def step(y_l, u_l, v_l):
        y_i = y_l.astype(jnp.int32)
        u_i = u_l.astype(jnp.int32)
        v_i = v_l.astype(jnp.int32)
        modes = KF.decide_modes(y_i, n, bit_depth)
        uv_modes = KF.decide_uv_modes(u_i, v_i, cn, bit_depth)
        dummy = jnp.zeros((1, 1), jnp.int32)
        lv_y, rec_y = KF._commit(y_i, dummy, modes, dc_step, ac_step, n,
                                 decode=False, bit_depth=bit_depth)
        lv_u, rec_u = KF._commit(u_i, dummy, uv_modes, dc_step, ac_step,
                                 cn, decode=False, bit_depth=bit_depth)
        lv_v, rec_v = KF._commit(v_i, dummy, uv_modes, dc_step, ac_step,
                                 cn, decode=False, bit_depth=bit_depth)

        out_y = db_mod.deblock_plane(rec_y, n, qindex, bit_depth)
        out_u = db_mod.deblock_plane(rec_u, cn, qindex, bit_depth)
        out_v = db_mod.deblock_plane(rec_v, cn, qindex, bit_depth)
        cdef_y = cdef_mod.cdef_plane(out_y, qindex, bit_depth)
        cdef_u = cdef_mod.cdef_plane(out_u, qindex, bit_depth,
                                     is_chroma=True)
        cdef_v = cdef_mod.cdef_plane(out_v, qindex, bit_depth,
                                     is_chroma=True)
        # frame-global gates on the shared 4x4-subsampled metric grid
        yf = y_i[::4, ::4].astype(jnp.float32)
        e_off = jax.lax.psum(jnp.sum(
            (out_y[::4, ::4].astype(jnp.float32) - yf) ** 2), AXIS)
        e_on = jax.lax.psum(jnp.sum(
            (cdef_y[::4, ::4].astype(jnp.float32) - yf) ** 2), AXIS)
        cdef_on = e_on < e_off
        out_y = cdef_mod.select(cdef_on, cdef_y, out_y)
        out_u = cdef_mod.select(cdef_on, cdef_u, out_u)
        out_v = cdef_mod.select(cdef_on, cdef_v, out_v)
        lr_costs = []
        for m in range(lr_mod.N_MODES):
            cand = lr_mod.apply_restoration(out_y[::4, ::4], m, maxval)
            lr_costs.append(jax.lax.psum(jnp.sum(
                (cand.astype(jnp.float32) - yf) ** 2), AXIS))
        lr_mode = jnp.argmin(jnp.stack(lr_costs)).astype(jnp.int32)
        out_y = lr_mod.apply_restoration_dynamic(out_y, lr_mode, maxval)
        out_u = lr_mod.apply_restoration_dynamic(out_u, lr_mode, maxval)
        out_v = lr_mod.apply_restoration_dynamic(out_v, lr_mode, maxval)

        skips = ((lv_y == 0).all(1) & (lv_u == 0).all(1)
                 & (lv_v == 0).all(1))
        out_dtype = jnp.uint8 if bit_depth == 8 else jnp.uint16
        return (modes.astype(jnp.uint8),
                lv_y.astype(jnp.int16), lv_u.astype(jnp.int16),
                lv_v.astype(jnp.int16), skips,
                out_y.astype(out_dtype), out_u.astype(out_dtype),
                out_v.astype(out_dtype), lr_mode, cdef_on,
                uv_modes.astype(jnp.uint8))

    sp = P(AXIS, None)
    sb = P(AXIS, None)
    fn = shard_map(
        step, mesh=mesh,
        in_specs=(sp,) * 3,
        out_specs=(P(AXIS), sb, sb, sb, P(AXIS), sp, sp, sp, P(), P(),
                   P(AXIS)),
        check_vma=False,
    )
    return fn(y, u, v)


def encode_key_frame_sharded_v2(y_u8, u_u8, v_u8, dc_step, ac_step,
                                qindex, block: int, mesh: Mesh,
                                bit_depth: int = 8):
    """Full-featured sharded keyframe encode: each device stripe runs an
    independent intra wavefront (= one bitstream tile) with per-stripe
    deblock/CDEF/restoration and psum'd frame-global gates.  Output is
    bit-identical to encode_key_frame_v2 with tile_rows = n_devices
    (same layout minus the sparse pack; stripe-major == raster)."""
    n_dev = mesh.devices.size
    h = y_u8.shape[0]
    if h % (n_dev * block):
        raise ValueError(f"luma height {h} not divisible by "
                         f"n_devices*block = {n_dev * block}")
    return _encode_key_sharded_impl(y_u8, u_u8, v_u8, dc_step, ac_step,
                                    qindex, block, bit_depth,
                                    _MeshHolder(mesh))
