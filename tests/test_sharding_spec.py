"""Spec-path multi-chip sharding on the virtual CPU mesh: the striped
inter encode must be BIT-IDENTICAL to the single-chip encode (tile rows
= chip stripes; replicated reference)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def mesh4():
    from av1tpu.specav1 import jax_sharded
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    return jax_sharded.make_mesh(4)


def test_spec_inter_sharded_bitidentical(mesh4):
    from av1tpu.specav1 import jax_inter, jax_intra, jax_sharded

    PH = PW = 256  # 4 stripes x 64 rows
    TH, TW = 256, 256
    rng = np.random.default_rng(11)
    base = rng.integers(16, 240, (PH * 2, PW * 2)).astype(np.uint8)
    y0, y1 = base[:PH, :PW], base[5:5 + PH, 3:3 + PW]
    u0 = np.full((PH // 2, PW // 2), 120, np.uint8)
    v0 = np.full((PH // 2, PW // 2), 136, np.uint8)

    kout = jax_intra._encode_frame(jnp.asarray(y0), jnp.asarray(u0),
                                   jnp.asarray(v0), jnp.int32(80),
                                   nbr=PH // 32, nbc=PW // 32,
                                   bit_depth=8)
    refs = tuple(np.asarray(p) for p in kout[0:3])

    # single-chip
    single = jax_inter._encode_frame(
        jnp.asarray(y1), jnp.asarray(u0), jnp.asarray(v0),
        jnp.asarray(refs[0]), jnp.asarray(refs[1]), jnp.asarray(refs[2]),
        80, 8, th=TH, tw=TW)
    single = [np.asarray(a) for a in single]

    # sharded: 4 stripes
    assert jax_sharded.sharding_ok(PH, TH, 4)
    ys = jax_sharded.shard_rows(mesh4, np.asarray(y1))
    us = jax_sharded.shard_rows(mesh4, u0)
    vs = jax_sharded.shard_rows(mesh4, v0)
    ry, ru, rv = jax_sharded.replicate(mesh4, refs)
    sh_out = jax_sharded.encode_inter_sharded(
        mesh4, ys, us, vs, ry, ru, rv, 80, bit_depth=8, th=TH, tw=TW)
    sh_out = [np.asarray(a) for a in sh_out]

    names = ["mv8", "skip", "lv_y", "lv_u", "lv_v",
             "rec_y", "rec_u", "rec_v"]
    for nm, a, b in zip(names, single, sh_out):
        assert a.shape == b.shape, (nm, a.shape, b.shape)
        assert np.array_equal(a, b), \
            f"{nm}: {np.argwhere(a != b)[:4].tolist()}"


def test_sharding_ok_gate():
    from av1tpu.specav1 import jax_sharded
    assert jax_sharded.sharding_ok(256, 256, 4)
    # non-dividing counts stripe-pad (compute-only rows)
    assert jax_sharded.stripe_pad(256, 3) == 288
    assert jax_sharded.sharding_ok(256, 256, 3)
    assert jax_sharded.stripe_pad(1088, 4) == 1152  # 1080p over 4 chips
    assert jax_sharded.sharding_ok(1088, 1080, 4)
    assert jax_sharded.sharding_ok(2176, 2160, 8)
    # degenerate: stripes thinner than 2 block rows don't pay
    assert not jax_sharded.sharding_ok(128, 128, 4)
    assert not jax_sharded.sharding_ok(256, 256, 1)


def test_spec_engine_sharded_e2e():
    """SpecTpuEngine with tpu.num_chips=4 on the virtual mesh: the
    striped stream must decode bit-exactly in libaom."""
    from av1tpu.conformance import aomcodec
    if not aomcodec.available():
        pytest.skip("libaom unavailable")
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from av1tpu.spec_engine import SpecTpuEngine
    from av1tpu.utils.testsrc import testsrc2

    eng = SpecTpuEngine()
    eng.cfg.keyint = 8
    eng.cfg.num_chips = 4
    eng.start_stream()
    frames = [testsrc2(192, 160, i) for i in range(5)]
    payloads = []
    recons = []
    for fr in frames:
        pend = eng._submit(fr, 90)
        recons.append(tuple(np.asarray(p)[:160 >> (0 if pl == 0 else 1),
                                          :192 >> (0 if pl == 0 else 1)]
                            for pl, p in enumerate(
                                jax.device_get(eng._resolve_refs()))))
        payloads.append(eng._finalize(pend))

    dec = aomcodec.Decoder()
    idx = 0
    for p, k in payloads:
        for f in dec.decode(bytes(p)):
            for pl in range(3):
                assert np.array_equal(np.asarray(f[pl], np.int64),
                                      np.asarray(recons[idx][pl],
                                                 np.int64)), \
                    f"frame {idx} plane {pl}"
            idx += 1
    assert idx == len(frames)


def test_distributed_noop_without_env(monkeypatch):
    from av1tpu.encoder.mesh import distributed
    monkeypatch.delenv("AV1TPU_COORDINATOR", raising=False)
    assert distributed.maybe_initialize() is False
