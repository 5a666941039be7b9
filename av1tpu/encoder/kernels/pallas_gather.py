"""Pallas per-block window gather: aligned DMA + one-hot MXU extract.

The inter encoder gathers a (W, W) window at an arbitrary per-block
position from a padded reference plane 4-7 times per frame (qpel
windows, chroma MC taps, refinement regions, full-pel SSD probes).
XLA lowers ``vmap(dynamic_slice)`` to a serial gather that costs
~11-14 ms per call at the 1080p 16-grid (B=8160) on TPU v5e — ~75 ms
of a ~128 ms frame.  This kernel does the same data movement in
~1-1.5 ms: one HBM->VMEM DMA per block over a tile-aligned covering
region (rows aligned to the (8, 128) f32 tiling), then the (W, W)
sub-window is extracted at its residual offset with two one-hot
matmuls on the MXU (exact in float32 for pixel-valued data).

Mosaic constraints honored (measured, not guessed):
 * HBM slice shapes must be multiples of the (8, 128) tiling, and
   offsets must be *provably* aligned — so offsets cross the kernel
   boundary in tile units and are multiplied back inside.
 * uint8 HBM sources are not supported (32-row tiles + no u8->f32
   cast in Mosaic); callers pass float32 planes (pixels are exact).

Replaces the gather half of the reference's fixed-function MC
(internal/ffmpeg/transcode.go:119-123 — the av1_vaapi encoder's
motion pipeline).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_G = 8  # blocks per kernel program (DMAs in flight per program)


def _use_kernel() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _gather_kernel(oya_ref, oxa_ref, ry_ref, rx_ref, src_ref, out_ref,
                   buf, sem, *, RH: int, RW: int, W: int, G: int):
    i = pl.program_id(0)
    cps = []
    for g in range(G):
        b = i * G + g
        cp = pltpu.make_async_copy(
            src_ref.at[pl.ds(oya_ref[b] * 8, RH),
                       pl.ds(oxa_ref[b] * 128, RW)],
            buf.at[g], sem.at[g])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()
    rows = jax.lax.broadcasted_iota(jnp.int32, (W, RH), 1)
    wr = jax.lax.broadcasted_iota(jnp.int32, (W, RH), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (RW, W), 0)
    wc = jax.lax.broadcasted_iota(jnp.int32, (RW, W), 1)
    # Precision.HIGHEST: default f32 dots truncate inputs to bf16,
    # which is exact for 8-bit pixels but NOT for 10/12-bit values
    # (>= 2^8 needs more than bf16's 8 mantissa bits)
    hp = jax.lax.Precision.HIGHEST
    for g in range(G):
        b = i * G + g
        rsel = (rows == wr + ry_ref[b]).astype(jnp.float32)   # (W, RH)
        csel = (cols == wc + rx_ref[b]).astype(jnp.float32)   # (RW, W)
        x = jnp.dot(rsel, buf[g], preferred_element_type=jnp.float32,
                    precision=hp)
        out_ref[g] = jnp.dot(x, csel, preferred_element_type=jnp.float32,
                             precision=hp)


@functools.partial(jax.jit, static_argnames=("W",))
def _gather_fallback(plane, oy, ox, W: int):
    def one(y0, x0):
        return jax.lax.dynamic_slice(plane, (y0, x0), (W, W))
    return jax.vmap(one)(oy, ox).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("W",))
def _gather_tpu(plane, oy, ox, W: int):
    Hp, Wp = plane.shape
    B = oy.shape[0]
    RH = -(-(W + 7) // 8) * 8
    RW = -(-(W + 127) // 128) * 128
    # room for the aligned covering region: zero-pad (never selected —
    # windows stay inside the caller's clamped [0, Hp-W] x [0, Wp-W])
    Hp8 = max(-(-Hp // 8) * 8, RH)
    Wp128 = max(-(-Wp // 128) * 128, RW)
    if (Hp8, Wp128) != (Hp, Wp):
        plane = jnp.pad(plane, ((0, Hp8 - Hp), (0, Wp128 - Wp)))
    plane = plane.astype(jnp.float32)
    Bp = -(-B // _G) * _G
    if Bp != B:
        oy = jnp.pad(oy, (0, Bp - B))
        ox = jnp.pad(ox, (0, Bp - B))
    oya = jnp.minimum(oy // 8, (Hp8 - RH) // 8)
    oxa = jnp.minimum(ox // 128, (Wp128 - RW) // 128)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, RH=RH, RW=RW, W=W, G=_G),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(Bp // _G,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((_G, W, W), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((_G, RH, RW), jnp.float32),
                            pltpu.SemaphoreType.DMA((_G,))],
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, W, W), jnp.float32),
    )(oya, oxa, oy - oya * 8, ox - oxa * 128, plane)
    return out[:B]


def gather_windows(plane, oy, ox, W: int) -> jnp.ndarray:
    """Gather (B, W, W) float32 windows at rows oy / cols ox.

    plane: 2D reference (any real dtype; values must be exact in
    float32, true for 8..12-bit pixels).  oy/ox: (B,) int32 window
    origins, already clamped to [0, Hp-W] x [0, Wp-W].  Bit-exact the
    same values as vmap(dynamic_slice) — pure data movement.
    """
    if not _use_kernel():
        return _gather_fallback(plane, oy, ox, W)
    return _gather_tpu(plane, oy, ox, W)


def make_wide2(p0, p1):
    """One column-concat f32 copy of a (LAST, GOLDEN) plane pair for
    per-block reference selection: build ONCE per frame and share it
    across every 2-ref gather (round-5 device trace: per-call
    conversion/concat copies of the ref planes were ~10 ms/frame of
    the golden delta — XLA did not CSE them across the pallas custom
    calls).  Returns (wide (Hp, 2*Wp128) float32, Wp128 offset)."""
    Hp, Wp = p0.shape
    Wp128 = -(-Wp // 128) * 128
    if Wp128 != Wp:
        p0 = jnp.pad(p0, ((0, 0), (0, Wp128 - Wp)))
        p1 = jnp.pad(p1, ((0, 0), (0, Wp128 - Wp)))
    return (jnp.concatenate([p0, p1], axis=1).astype(jnp.float32),
            Wp128)


def gather_windows_wide(wide, off: int, ri, oy, ox, W: int):
    """Per-block 2-ref window gather over a prebuilt make_wide2 plane.
    ox must already be clamped to [0, Wp-W] of a SINGLE plane; windows
    never cross the half boundary (W <= Wp128 - (Wp - W))."""
    if not _use_kernel():
        def one(r, y0, x0):
            return jax.lax.dynamic_slice(wide, (y0, x0 + r * off),
                                         (W, W))
        return jax.vmap(one)(ri, oy, ox).astype(jnp.float32)
    return _gather_tpu(wide, oy, ox + ri * off, W)


def gather_windows_ref2(planes2, ri, oy, ox, W: int) -> jnp.ndarray:
    """gather_windows with a per-block reference-plane selector.

    planes2: (2, Hp, Wp) stacked padded planes (LAST, GOLDEN); ri (B,)
    int32 selects per block.  Implemented as a column-concat of the two
    planes + an ox offset, so the kernel stays 2D.  Hot callers build
    the concat once via make_wide2 + gather_windows_wide instead.
    """
    _, Hp, Wp = planes2.shape
    if not _use_kernel():
        def one(r, y0, x0):
            return jax.lax.dynamic_slice(planes2, (r, y0, x0),
                                         (1, W, W))[0]
        return jax.vmap(one)(ri, oy, ox).astype(jnp.float32)
    wide, off = make_wide2(planes2[0], planes2[1])
    return _gather_tpu(wide, oy, ox + ri * off, W)
