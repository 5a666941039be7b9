"""Subpel motion-compensated prediction (NORMATIVE).

Quarter-pel luma / eighth-pel chroma interpolation with separable integer
filters, shared bit-exactly by encoder recon and decoder.  The reference
outsourced this to ffmpeg's MC (SURVEY.md §2 #16); here it is a dense
stacked-shift formulation: for an 8-tap filter, the filtered block is a
sum of 8 statically-shifted views scaled by per-block coefficients — pure
VPU work, no per-pixel gathers.

Filter definition (this codec's normative tables): cosine-windowed sinc,
8-tap luma at 4 phases, 4-tap chroma at 8 phases, integer coefficients
summing to 128 (center-tap corrected).  Interpolation arithmetic:
  tmp  = Σ_t region[.., x+t] * fh[t]          (no intermediate rounding)
  out  = clip( rs( Σ_t tmp[.., y+t] * fv[t], 14 ), 0, 255 )
All intermediates fit int32 (tmp ≤ 2^18, second pass ≤ 2^28).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LUMA_TAPS = 8
CHROMA_TAPS = 4
MV_PREC = 2            # quarter-pel: mv units are 1/4 luma pel
FILTER_SUM_LOG2 = 7    # coefficients sum to 128
FINAL_SHIFT = 2 * FILTER_SUM_LOG2


@functools.lru_cache(maxsize=None)
def luma_filters() -> np.ndarray:
    """(4, 8) int32: phases 0, 1/4, 2/4, 3/4."""
    return _make_filters(4, LUMA_TAPS)


@functools.lru_cache(maxsize=None)
def chroma_filters() -> np.ndarray:
    """(8, 4) int32: phases k/8."""
    return _make_filters(8, CHROMA_TAPS)


def _make_filters(n_phases: int, taps: int) -> np.ndarray:
    center = taps // 2 - 1
    out = np.zeros((n_phases, taps), np.int64)
    for p in range(n_phases):
        frac = p / n_phases
        if p == 0:
            out[0, center] = 1 << FILTER_SUM_LOG2
            continue
        t = np.arange(taps, dtype=np.float64) - center - frac
        sinc = np.sinc(t)
        window = np.cos(np.pi * t / taps) ** 2
        f = sinc * window
        f = f / f.sum() * (1 << FILTER_SUM_LOG2)
        fi = np.round(f).astype(np.int64)
        # force exact DC gain by correcting the dominant tap
        fi[np.argmax(np.abs(fi))] += (1 << FILTER_SUM_LOG2) - fi.sum()
        out[p] = fi
    return out.astype(np.int32)


def _hfilter(region: jnp.ndarray, coeffs: jnp.ndarray, n: int,
             taps: int) -> jnp.ndarray:
    """Horizontal pass: region (B, H, n+taps-1+…) × coeffs (B, taps) or
    (taps,) → (B, H, n).  Stacked static shifts."""
    per_block = coeffs.ndim == 2
    acc = None
    for t in range(taps):
        sl = region[:, :, t:t + n]
        c = coeffs[:, t][:, None, None] if per_block else coeffs[t]
        term = sl * c
        acc = term if acc is None else acc + term
    return acc


def _vfilter(tmp: jnp.ndarray, coeffs: jnp.ndarray, n: int,
             taps: int) -> jnp.ndarray:
    per_block = coeffs.ndim == 2
    acc = None
    for t in range(taps):
        sl = tmp[:, t:t + n, :]
        c = coeffs[:, t][:, None, None] if per_block else coeffs[t]
        term = sl * c
        acc = term if acc is None else acc + term
    return acc


def interp_block(region: jnp.ndarray, phase_y, phase_x, n: int,
                 filters: np.ndarray, maxval: int = 255) -> jnp.ndarray:
    """NORMATIVE subpel interpolation.

    region: (B, n+taps-1, n+taps-1) int32, origin at sample−(taps/2−1);
    phase_y/phase_x: (B,) int per-block phases (or python ints for the
    static-phase search path).  Returns (B, n, n) int32 in [0, maxval].
    """
    taps = filters.shape[1]
    ftab = jnp.asarray(filters)
    if isinstance(phase_x, int):
        fh = ftab[phase_x]          # (taps,)
        fv = ftab[phase_y]
    else:
        fh = ftab[phase_x]          # (B, taps)
        fv = ftab[phase_y]
    tmp = _hfilter(region.astype(jnp.int32), fh, n, taps)
    out = _vfilter(tmp, fv, n, taps)
    out = (out + (1 << (FINAL_SHIFT - 1))) >> FINAL_SHIFT
    return jnp.clip(out, 0, maxval)


def gather_regions(ref_pad: jnp.ndarray, pos: jnp.ndarray,
                   full_mv: jnp.ndarray, n: int, taps: int,
                   pad: int) -> jnp.ndarray:
    """Gather (B, n+taps-1, n+taps-1) regions at pos+full_mv−(taps/2−1)."""
    R = n + taps - 1
    off = taps // 2 - 1
    hp2, wp2 = ref_pad.shape
    r = jnp.clip(pos[:, 0] + pad + full_mv[:, 0] - off, 0, hp2 - R)
    c = jnp.clip(pos[:, 1] + pad + full_mv[:, 1] - off, 0, wp2 - R)

    def one(ri, ci):
        return jax.lax.dynamic_slice(ref_pad, (ri, ci), (R, R))

    return jax.vmap(one)(r, c)


def predict_subpel_luma(ref_pad: jnp.ndarray, pos: jnp.ndarray,
                        mv_q: jnp.ndarray, n: int, pad: int,
                        maxval: int = 255) -> jnp.ndarray:
    """Quarter-pel luma MC: mv_q in q4 units.  (B, n, n) int32."""
    full = mv_q >> MV_PREC
    phase = (mv_q & 3).astype(jnp.int32)
    regions = gather_regions(ref_pad, pos, full, n, LUMA_TAPS, pad)
    return interp_block(regions, phase[:, 0], phase[:, 1], n, luma_filters(),
                        maxval)


def predict_subpel_chroma(ref_pad: jnp.ndarray, pos: jnp.ndarray,
                          mv_q: jnp.ndarray, n: int, pad: int,
                          maxval: int = 255) -> jnp.ndarray:
    """Eighth-pel chroma MC from luma q4 MVs: chroma offset = mv/2 chroma
    pels = mv_q/8 → full = mv_q>>3, phase = mv_q & 7 (8 phases)."""
    full = mv_q >> 3
    phase = (mv_q & 7).astype(jnp.int32)
    regions = gather_regions(ref_pad, pos, full, n, CHROMA_TAPS, pad)
    return interp_block(regions, phase[:, 0], phase[:, 1], n,
                        chroma_filters(), maxval)
