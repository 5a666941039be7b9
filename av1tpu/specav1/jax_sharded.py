"""Multi-chip spec-AV1 encode: tile-row stripes over a 1-D device mesh.

The spec bitstream's tile rows are the unit of chip parallelism: tiles
are fully independent for prediction and entropy state, so each chip
encodes one horizontal stripe of the frame and the host concatenates
the per-stripe tiles into one conformant tile group (the reference
scaled by running parallel ffmpeg/VAAPI jobs,
internal/daemon/daemon.go; we scale one frame across chips over ICI
instead).

Inter frames shard: the previous reconstruction is replicated (XLA
all-gathers it over ICI when the producing computation was sharded)
and each chip searches/compensates its stripe against the full frame,
so motion is unrestricted across stripe boundaries and the bitstream
is IDENTICAL to the single-chip encode.  Keyframes stay single-device:
they are 1/keyint of the work and the intra wavefront is ~ms.

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
    are a pure compute partition (reference is replicated; MVs are
    unrestricted; entropy slices tile rows from the full-frame arrays
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


@functools.partial(jax.jit,
                   static_argnames=("mesh", "bit_depth", "th", "tw",
                                    "deblock", "qround", "cdef", "lr"))
def encode_inter_sharded(mesh, y, u, v, ref_y, ref_u, ref_v, qindex,
                         bit_depth: int, th: int, tw: int,
                         lf_y=0, lf_uv=0, deblock: bool = False,
                         qround: float = 0.70, cdef: bool = False,
                         cdef_damping=4, lr: bool = False):
    """y/u/v: (ph, pw) planes sharded P("stripe"); refs: full-frame
    recon planes (replicated).  Returns jax_inter._encode_frame's
    tuple, planes laid out full-frame (stripe outputs concatenated).
    Bit-identical to the single-chip encode of the same frame."""
    from jax.experimental.shard_map import shard_map

    n = mesh.shape["stripe"]
    sh = y.shape[0] // n

    def body(ys, us, vs, ry, ru, rv, q):
        row0 = jax.lax.axis_index("stripe") * sh
        return jax_inter._encode_frame(
            ys, us, vs, ry, ru, rv, q[0], bit_depth, th=th, tw=tw,
            stripe=True, row0=row0, qround=qround)

    out_specs = (P("stripe"), P("stripe"), P("stripe", None),
                 P("stripe", None), P("stripe", None),
                 P("stripe", None), P("stripe", None), P("stripe", None),
                 P(None), P(None), P(None))
    out = shard_map(
        body, mesh=mesh,
        in_specs=(P("stripe", None), P("stripe", None), P("stripe", None),
                  P(None, None), P(None, None), P(None, None), P(None)),
        out_specs=out_specs, check_rep=False)(
            y, u, v, ref_y, ref_u, ref_v,
            jnp.reshape(jnp.asarray(qindex, jnp.int32), (1,)))
    # deblock + CDEF on the gathered full-frame recon (AV1 filters
    # across tile boundaries, so stripe edges need both sides; XLA
    # inserts the ICI halo exchange the boundary taps imply)
    fy, fu, fv = out[5], out[6], out[7]
    if deblock:
        from av1tpu.specav1 import loopfilter as _LF
        fy, fu, fv = _LF.deblock_frame(fy, fu, fv, lf_y, lf_uv,
                                       lf_uv, bit_depth, th, tw)
    cdefs = out[9]
    pre_cdef_y = fy  # post-deblock: LR stripe-boundary source
    if cdef:
        from av1tpu.specav1 import jax_cdef
        gh, gw = y.shape[0] // 32, y.shape[1] // 32
        skip8 = jax_inter.build_skip8(out[1].reshape(gh, gw), out[8],
                                      th, tw, y.shape[1])
        fy, fu, fv, cdefs = jax_cdef.cdef_search_apply(
            fy, fu, fv, y, u, v, skip8, cdef_damping,
            bit_depth=bit_depth, th=th, tw=tw)
    lr_choice = out[10]
    if lr:
        from av1tpu.specav1 import jax_lr
        fy, lr_choice = jax_lr.lr_search_apply(
            fy, pre_cdef_y, y, bit_depth=bit_depth, th=th, tw=tw)
    return out[0:5] + (fy, fu, fv, out[8], cdefs, lr_choice)
