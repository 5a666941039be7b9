"""Forward/inverse 2-D transforms (DCT / ADST / identity), TPU-first.

Two paths, mirroring how a TPU encoder must split work (SURVEY.md §7 hard
part #2):

* **Forward (search side)** — float32 orthonormal matmuls on the MXU.
  Feeds quantization and RD; needs no bit-exactness because only the
  quantized levels are transmitted.

* **Inverse (commit side, NORMATIVE)** — the codec's reconstruction
  transform, shared bit-exactly by the encoder's recon loop and the
  decoder.  Implemented as integer matrix multiplies with one rounding per
  pass.  Bit-exactness across TPU/XLA and CPU/NumPy is guaranteed by
  keeping every intermediate product and partial sum below 2^24 so float32
  matmul arithmetic is exact integer arithmetic regardless of accumulation
  order (the ``exact_matmul`` 3-way byte-split below).  This replaces the
  reference's in-ffmpeg fixed-point butterflies (SURVEY.md §2 #16) with a
  matmul formulation that the MXU executes natively.

Scaling contract (our codec's normative definition):
  basis  B_N = round(1024 * C_N)  (C_N orthonormal rows)   — |B| ≤ 1024
  fwd    coeff = round(4 * C x C^T)                        — gain G = 4
  inv    x = rs( B^T @ rs(Y @ B, 11) , 11 )  with rs = round_shift
         (total 2^22 = 1024^2 * G)
  Y (dequantized coeffs) clamped to ±2^15; pass-1 output clamped to ±2^18.

Exactness budget: limbs are ≤ 2^8, basis row L1 norms ≤ 2^12.8 (N=64), so
per-limb float32 sums stay ≤ 2^20.8 < 2^24; recombined int32 results stay
≤ 2^30.8 < 2^31.

Transform types: DCT_DCT, ADST_ADST, ADST_DCT, DCT_ADST, IDTX.  Sizes
4..64 (64 keeps only the low 32x32 coefficient quadrant, like AV1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SIZES = (4, 8, 16, 32, 64)
BASIS_BITS = 10          # basis scale 2^10
PASS_SHIFT = 11          # per-pass rounding of the inverse
FWD_GAIN = 4.0
COEF_CLAMP = 1 << 15     # dequantized-coefficient clamp
INTER_CLAMP = 1 << 18    # pass-1 clamp

# transform type enum (bitstream order fixed by our syntax)
DCT_DCT = 0
ADST_ADST = 1
ADST_DCT = 2     # ADST rows (vertical), DCT cols
DCT_ADST = 3
IDTX = 4
N_TX_TYPES = 5


def dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II: rows are basis functions."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m[0] /= np.sqrt(2.0)
    return m


def adst_matrix(n: int) -> np.ndarray:
    """Orthonormal DST (ADST flavor): rows are basis functions."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    return (2.0 / np.sqrt(2 * n + 1)
            * np.sin(np.pi * (2 * i + 1) * (k + 1) / (2 * n + 1)))


def identity_matrix(n: int) -> np.ndarray:
    return np.eye(n)


@functools.lru_cache(maxsize=None)
def _float_basis(n: int, kind: str) -> np.ndarray:
    if kind == "dct":
        return dct_matrix(n)
    if kind == "adst":
        return adst_matrix(n)
    return identity_matrix(n)


@functools.lru_cache(maxsize=None)
def _int_basis(n: int, kind: str) -> np.ndarray:
    """Normative integer basis: round(1024 * C)."""
    b = np.round(_float_basis(n, kind) * (1 << BASIS_BITS))
    assert np.abs(b).max() <= (1 << BASIS_BITS)
    return b.astype(np.float32)  # float32 holding exact small ints


def _kinds(tx_type: int) -> tuple[str, str]:
    """(row_kind, col_kind): row = vertical basis, col = horizontal."""
    return {
        DCT_DCT: ("dct", "dct"),
        ADST_ADST: ("adst", "adst"),
        ADST_DCT: ("adst", "dct"),
        DCT_ADST: ("dct", "adst"),
        IDTX: ("id", "id"),
    }[tx_type]


# ---------------------------------------------------------------------------
# exact integer matmul via float32 (order-independent, TPU==CPU bit-exact)

def round_shift(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """(x + 2^(s-1)) >> s with arithmetic shift (int32)."""
    return (x + (1 << (s - 1))) >> s


def exact_matmul(m: jnp.ndarray, x: jnp.ndarray,
                 transpose_m: bool = False) -> jnp.ndarray:
    """Exact int result of m @ x (or m.T @ x); |x| < 2^23, row L1(m) < 2^15.

    x is int32; m is float32 holding exact small integers.  x is split into
    three 8-bit limbs so each partial matmul's sums (≤ limb_max × L1 ≤ 2^23)
    stay below 2^24, where float32 arithmetic is exact integer arithmetic
    regardless of accumulation order.  Limb results recombine in int32.
    """
    mm = m.T if transpose_m else m
    xs = x.astype(jnp.int32)
    lo = (xs & 0xFF).astype(jnp.float32)
    mid = ((xs >> 8) & 0xFF).astype(jnp.float32)
    hi = (xs >> 16).astype(jnp.float32)  # arithmetic: carries the sign
    # Precision.HIGHEST: on TPU the default f32 matmul rounds inputs to
    # bf16 (8 mantissa bits), which breaks the exact-integer contract for
    # the 10-bit basis.  HIGHEST uses full-f32 emulation — exact here.
    hp = jax.lax.Precision.HIGHEST
    plo = jnp.matmul(mm, lo, precision=hp)
    pmid = jnp.matmul(mm, mid, precision=hp)
    phi = jnp.matmul(mm, hi, precision=hp)
    return (plo.astype(jnp.int32) + (pmid.astype(jnp.int32) << 8)
            + (phi.astype(jnp.int32) << 16))


def exact_matmul_right(x: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Exact x @ m with the same contracts (x int32, m small-int float32)."""
    xs = x.astype(jnp.int32)
    lo = (xs & 0xFF).astype(jnp.float32)
    mid = ((xs >> 8) & 0xFF).astype(jnp.float32)
    hi = (xs >> 16).astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    plo = jnp.matmul(lo, m, precision=hp)
    pmid = jnp.matmul(mid, m, precision=hp)
    phi = jnp.matmul(hi, m, precision=hp)
    return (plo.astype(jnp.int32) + (pmid.astype(jnp.int32) << 8)
            + (phi.astype(jnp.int32) << 16))


# ---------------------------------------------------------------------------
# forward (float, search side)

def fwd_txfm(blocks: jnp.ndarray, tx_type: int = DCT_DCT) -> jnp.ndarray:
    """Forward transform of residual blocks (B, N, N) float/int → float32.

    coeff = G * C_row @ x @ C_col^T.  For 64x64 only the low 32x32 quadrant
    is meaningful downstream (the rest is zeroed by the caller/quantizer).
    """
    n = blocks.shape[-1]
    rk, ck = _kinds(tx_type)
    cr = jnp.asarray(_float_basis(n, rk), jnp.float32)
    cc = jnp.asarray(_float_basis(n, ck), jnp.float32)
    x = blocks.astype(jnp.float32)
    y = jnp.einsum("ij,bjk,lk->bil", cr, x, cc,
                   preferred_element_type=jnp.float32)
    return FWD_GAIN * y


# ---------------------------------------------------------------------------
# inverse (normative, exact)

def inv_txfm(coeffs: jnp.ndarray, tx_type: int = DCT_DCT) -> jnp.ndarray:
    """NORMATIVE inverse transform: int32 coeffs (B, N, N) → int32 residual.

    x = rs(B_row^T @ rs(clamp(Y) @ B_col, 7), 7), every step exact integer.
    """
    n = coeffs.shape[-1]
    rk, ck = _kinds(tx_type)
    br = jnp.asarray(_int_basis(n, rk), jnp.float32)
    bc = jnp.asarray(_int_basis(n, ck), jnp.float32)
    y = jnp.clip(coeffs.astype(jnp.int32), -COEF_CLAMP, COEF_CLAMP - 1)
    # pass 1 (horizontal): T = rs(Y @ B_col, 7)
    t = round_shift(exact_matmul_right(y, bc), PASS_SHIFT)
    t = jnp.clip(t, -INTER_CLAMP, INTER_CLAMP - 1)
    # pass 2 (vertical): X = rs(B_row^T @ T, 7)
    x = round_shift(
        jax.vmap(lambda tb: exact_matmul(br, tb, transpose_m=True))(t),
        PASS_SHIFT)
    return x


def inv_txfm_numpy(coeffs: np.ndarray, tx_type: int = DCT_DCT) -> np.ndarray:
    """Independent int64 NumPy reference of the normative inverse (tests)."""
    n = coeffs.shape[-1]
    rk, ck = _kinds(tx_type)
    br = _int_basis(n, rk).astype(np.int64)
    bc = _int_basis(n, ck).astype(np.int64)
    y = np.clip(coeffs.astype(np.int64), -COEF_CLAMP, COEF_CLAMP - 1)
    t = y @ bc
    t = (t + (1 << (PASS_SHIFT - 1))) >> PASS_SHIFT
    t = np.clip(t, -INTER_CLAMP, INTER_CLAMP - 1)
    x = np.einsum("ij,bjk->bik", br.T, t)
    x = (x + (1 << (PASS_SHIFT - 1))) >> PASS_SHIFT
    return x.astype(np.int32)
