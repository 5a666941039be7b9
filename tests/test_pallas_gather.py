"""Tests for the Pallas window-gather primitive.

On CPU (the default test platform) gather_windows takes the
vmap(dynamic_slice) fallback, so these tests pin the *contract*
(values + clamping) that the TPU kernel was A/B-verified against on
hardware (see pallas_gather.py module docstring for the measured
Mosaic constraints).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from av1tpu.encoder.kernels import pallas_gather as pg


def _ref(plane, oy, ox, W):
    out = np.zeros((len(oy), W, W), np.float32)
    p = np.asarray(plane)
    for b, (y0, x0) in enumerate(zip(np.asarray(oy), np.asarray(ox))):
        out[b] = p[y0:y0 + W, x0:x0 + W]
    return out


@pytest.mark.parametrize("shape,W,B", [((96, 160), 23, 24),
                                       ((200, 264), 15, 17),
                                       ((64, 64), 41, 5)])
def test_gather_windows_matches_slices(shape, W, B):
    rng = np.random.default_rng(0)
    Hp, Wp = shape
    plane = jnp.asarray(rng.integers(0, 256, (Hp, Wp)).astype(np.uint8))
    oy = rng.integers(0, Hp - W + 1, (B,)).astype(np.int32)
    ox = rng.integers(0, Wp - W + 1, (B,)).astype(np.int32)
    oy[0], ox[0] = 0, 0
    oy[-1], ox[-1] = Hp - W, Wp - W
    got = np.asarray(pg.gather_windows(plane, jnp.asarray(oy),
                                       jnp.asarray(ox), W))
    np.testing.assert_array_equal(got, _ref(plane, oy, ox, W))
    assert got.dtype == np.float32


def test_gather_windows_ref2_selects_plane():
    rng = np.random.default_rng(1)
    Hp, Wp, W, B = 96, 160, 23, 16
    p2 = jnp.asarray(rng.integers(0, 256, (2, Hp, Wp)).astype(np.float32))
    oy = jnp.asarray(rng.integers(0, Hp - W + 1, (B,)).astype(np.int32))
    ox = jnp.asarray(rng.integers(0, Wp - W + 1, (B,)).astype(np.int32))
    ri = jnp.asarray((np.arange(B) % 2).astype(np.int32))
    got = np.asarray(pg.gather_windows_ref2(p2, ri, oy, ox, W))
    for b in range(B):
        exp = np.asarray(p2)[int(ri[b]),
                             int(oy[b]):int(oy[b]) + W,
                             int(ox[b]):int(ox[b]) + W]
        np.testing.assert_array_equal(got[b], exp)


def test_kernel_vs_fallback_on_tpu():
    """A/B the real Mosaic kernel against the fallback (TPU only)."""
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("needs a TPU")
    rng = np.random.default_rng(3)
    Hp, Wp, W, B = 368, 448, 25, 96
    plane = jnp.asarray(rng.integers(0, 256, (Hp, Wp)).astype(np.uint8))
    oy = rng.integers(0, Hp - W + 1, (B,)).astype(np.int32)
    ox = rng.integers(0, Wp - W + 1, (B,)).astype(np.int32)
    ox[:2] = [127, 126]  # lane-tile straddle
    a = np.asarray(pg._gather_tpu(plane, jnp.asarray(oy),
                                  jnp.asarray(ox), W))
    b = np.asarray(pg._gather_fallback(plane, jnp.asarray(oy),
                                       jnp.asarray(ox), W))
    np.testing.assert_array_equal(a, b)
