"""Quantization: qindex → step tables, quantize/dequantize.

The qindex space is AV1-shaped (base_q_idx 0..255 coded in the frame
header) but the step tables are this codec's own normative definition,
generated from a smooth exponential matching the AV1 8-bit table's span
(ac: 4 → ~1828 across 0..255; the reference's quality ladder 23/24/25 maps
onto this space via av1tpu.encoder.ratectrl.quality_to_qindex).

Steps apply to the transform scale of av1tpu.encoder.kernels.transforms
(orthonormal coefficients × gain 4).  Dequantization is integer (level ×
step) and is part of the normative reconstruction path.
"""

from __future__ import annotations

import functools

import numpy as np

QINDEX_RANGE = 256


@functools.lru_cache(maxsize=None)
def ac_quant_table(bit_depth: int = 8) -> np.ndarray:
    """Normative AC step per qindex.  Smooth exponential, 4..~1828 (8-bit)."""
    q = np.arange(QINDEX_RANGE, dtype=np.float64)
    steps = np.round(4.0 * np.exp2(q / 28.8)).astype(np.int32)
    if bit_depth == 10:
        steps = steps * 4  # coefficients carry 2 extra bits
    return steps


@functools.lru_cache(maxsize=None)
def dc_quant_table(bit_depth: int = 8) -> np.ndarray:
    """Normative DC step: ~88% of AC (DC quantized a little finer)."""
    ac = ac_quant_table(bit_depth)
    return np.maximum(4, np.round(ac * 0.88)).astype(np.int32)


def ac_q(qindex: int, bit_depth: int = 8) -> int:
    return int(ac_quant_table(bit_depth)[qindex])


def dc_q(qindex: int, bit_depth: int = 8) -> int:
    return int(dc_quant_table(bit_depth)[qindex])


def quantize_block(coeffs, dc_step: int, ac_step: int, deadzone: float = 0.6):
    """coeff (…, N, N) float/int → integer levels with a deadzone.

    level = sign * floor(|c| / step + (1 - deadzone))  — deadzone 0.5 is
    round-to-nearest; larger biases toward zero (cheaper rate).  Runs under
    jnp or numpy (pure ufuncs).
    """
    import jax.numpy as jnp
    c = coeffs
    n = c.shape[-1]
    steps = jnp.full((n, n), ac_step, dtype=jnp.float32)
    steps = steps.at[..., 0, 0].set(dc_step)
    mag = jnp.abs(c.astype(jnp.float32))
    lvl = jnp.floor(mag / steps + (1.0 - deadzone)).astype(jnp.int32)
    return jnp.where(c < 0, -lvl, lvl)


def dequantize_block(levels, dc_step: int, ac_step: int):
    """Integer dequantization (normative): dq = level * step, int32."""
    import jax.numpy as jnp
    lv = levels.astype(jnp.int32)
    n = lv.shape[-1]
    steps = jnp.full((n, n), ac_step, dtype=jnp.int32)
    steps = steps.at[0, 0].set(dc_step)
    return lv * steps
