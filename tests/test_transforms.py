"""Transform/quant kernel tests: orthonormality, exactness, round-trips."""

import numpy as np
import pytest

from av1tpu.encoder import quant
from av1tpu.encoder.kernels import transforms as tx


@pytest.mark.parametrize("n", tx.SIZES)
def test_dct_orthonormal(n):
    c = tx.dct_matrix(n)
    np.testing.assert_allclose(c @ c.T, np.eye(n), atol=1e-10)


@pytest.mark.parametrize("n", (4, 8, 16))
def test_adst_orthonormal(n):
    s = tx.adst_matrix(n)
    np.testing.assert_allclose(s @ s.T, np.eye(n), atol=1e-10)


@pytest.mark.parametrize("n", (4, 8, 16, 32))
@pytest.mark.parametrize("tx_type", (tx.DCT_DCT, tx.ADST_ADST, tx.ADST_DCT,
                                     tx.DCT_ADST, tx.IDTX))
def test_inverse_exact_vs_numpy(n, tx_type):
    """jnp inverse (float32 trick) == int64 NumPy reference, bit-exact."""
    rng = np.random.default_rng(n * 10 + tx_type)
    # adversarial coefficient ranges incl. the clamp boundary
    coeffs = rng.integers(-(1 << 16), 1 << 16, (8, n, n), dtype=np.int32)
    coeffs[0] = 0
    coeffs[1] = (1 << 15) - 1
    coeffs[2] = -(1 << 15)
    got = np.asarray(tx.inv_txfm(coeffs, tx_type))
    ref = tx.inv_txfm_numpy(coeffs, tx_type)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("n", (4, 8, 16, 32))
def test_fwd_inv_roundtrip(n):
    """inv(fwd(x)) ≈ x within integer-basis rounding error (no quant)."""
    rng = np.random.default_rng(1)
    x = rng.integers(-255, 256, (4, n, n), dtype=np.int32)
    coeffs = np.round(np.asarray(tx.fwd_txfm(x))).astype(np.int32)
    back = np.asarray(tx.inv_txfm(coeffs))
    err = np.abs(back - x).max()
    assert err <= 2, err


def test_exact_matmul_extremes():
    rng = np.random.default_rng(3)
    m = np.round(rng.uniform(-127, 127, (32, 32))).astype(np.float32)
    x = rng.integers(-(1 << 22), 1 << 22, (32, 8), dtype=np.int32)
    x[:, 0] = (1 << 22) - 1
    x[:, 1] = -(1 << 22)
    got = np.asarray(tx.exact_matmul(m, x))
    ref = (m.astype(np.int64) @ x.astype(np.int64))
    np.testing.assert_array_equal(got, ref.astype(np.int32))


def test_round_shift_negative():
    import jax.numpy as jnp
    x = jnp.array([-129, -128, -127, 127, 128, 129], jnp.int32)
    got = np.asarray(tx.round_shift(x, 8))
    # (x + 128) >> 8, floor semantics
    ref = np.floor((x + 128) / 256).astype(np.int32)
    np.testing.assert_array_equal(got, ref)


def test_idtx_is_scaled_identity():
    x = np.arange(16, dtype=np.int32).reshape(1, 4, 4) - 8
    coeffs = np.round(np.asarray(tx.fwd_txfm(x, tx.IDTX))).astype(np.int32)
    np.testing.assert_array_equal(coeffs[0], 4 * x[0])
    back = np.asarray(tx.inv_txfm(coeffs, tx.IDTX))
    np.testing.assert_array_equal(back, x)


# --- quantization ---------------------------------------------------------

def test_quant_tables_monotonic():
    ac = quant.ac_quant_table(8)
    dc = quant.dc_quant_table(8)
    assert ac[0] == 4
    assert 1700 < ac[255] < 2000
    assert np.all(np.diff(ac.astype(np.int64)) >= 0)
    assert np.all(dc <= ac)
    assert np.all(dc >= 4)
    ac10 = quant.ac_quant_table(10)
    assert ac10[100] == ac[100] * 4


def test_quant_dequant_roundtrip():
    rng = np.random.default_rng(5)
    coeffs = rng.integers(-4000, 4000, (2, 8, 8)).astype(np.float32)
    dcs, acs = 20, 24
    lv = np.asarray(quant.quantize_block(coeffs, dcs, acs, deadzone=0.5))
    dq = np.asarray(quant.dequantize_block(lv, dcs, acs))
    # reconstruction error bounded by ~step/2 (+1 for the dc/ac split)
    assert np.abs(dq[..., 0, 0] - coeffs[..., 0, 0]).max() <= dcs / 2 + 1
    mask = np.ones((8, 8), bool)
    mask[0, 0] = False
    assert np.abs((dq - coeffs)[..., mask]).max() <= acs / 2 + 1


def test_quant_deadzone_zeros_more():
    rng = np.random.default_rng(6)
    coeffs = rng.normal(0, 30, (4, 16, 16)).astype(np.float32)
    lv_nodz = np.asarray(quant.quantize_block(coeffs, 24, 24, deadzone=0.5))
    lv_dz = np.asarray(quant.quantize_block(coeffs, 24, 24, deadzone=0.8))
    assert (lv_dz == 0).sum() > (lv_nodz == 0).sum()
