"""Spec-path multi-chip sharding on the virtual CPU mesh: the striped
inter encode must be BIT-IDENTICAL to the single-chip encode (tile rows
= chip stripes; ROW-SHARDED reference with ppermute halo exchange —
O(halo) ICI per frame, not O(frame) replication)."""

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


@pytest.mark.heavy
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
    # refs enter ROW-SHARDED — the production layout (the previous
    # frame's striped outputs stay on their chips)
    ry, ru, rv = (jax_sharded.shard_rows(mesh4, r) for r in refs)
    sh_out = jax_sharded.encode_inter_sharded(
        mesh4, ys, us, vs, ry, ru, rv, 80, bit_depth=8, th=TH, tw=TW)
    sh_out = [np.asarray(a) for a in sh_out]

    names = ["mv8", "skip", "lv_y", "lv_u", "lv_v",
             "rec_y", "rec_u", "rec_v"]
    for nm, a, b in zip(names, single, sh_out):
        assert a.shape == b.shape, (nm, a.shape, b.shape)
        assert np.array_equal(a, b), \
            f"{nm}: {np.argwhere(a != b)[:4].tolist()}"


def test_spec_sharded_ref_traffic_is_halo(mesh4):
    """The reference rows must move over the mesh as ppermute halos
    (collective-permute), NOT as a full-frame all-gather: lower the
    striped encode and inspect the stable HLO (SURVEY §2/§5 ICI design;
    VERDICT r2 weak #3)."""
    from av1tpu.specav1 import jax_sharded

    PH = PW = 256
    ys = jax_sharded.shard_rows(mesh4, np.zeros((PH, PW), np.uint8))
    us = jax_sharded.shard_rows(mesh4,
                                np.zeros((PH // 2, PW // 2), np.uint8))
    vs = jax_sharded.shard_rows(mesh4,
                                np.zeros((PH // 2, PW // 2), np.uint8))
    ry = jax_sharded.shard_rows(mesh4, np.zeros((PH, PW), np.int32))
    ru = jax_sharded.shard_rows(mesh4,
                                np.zeros((PH // 2, PW // 2), np.int32))
    rv = jax_sharded.shard_rows(mesh4,
                                np.zeros((PH // 2, PW // 2), np.int32))
    lowered = jax_sharded.encode_inter_sharded.lower(
        mesh4, ys, us, vs, ry, ru, rv, 80, bit_depth=8, th=PH, tw=PW)
    hlo = lowered.compile().as_text()
    assert "collective-permute" in hlo, "halo exchange missing"
    # the reference planes (int32, PH x PW and halves) must not be
    # all-gathered: no all-gather result as large as a full ref plane
    import re
    for m in re.finditer(r"all-gather\(", hlo):
        line = hlo[hlo.rfind("\n", 0, m.start()) + 1:
                   hlo.find("\n", m.end())]
        shapes = re.findall(r"(?:s32|u8|s8)\[(\d+),(\d+)\]", line)
        for a, b in shapes:
            assert int(a) * int(b) < PH * PW, \
                f"full-frame all-gather in lowered HLO: {line[:160]}"


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


@pytest.mark.heavy
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


def test_spec_chunk_sharded_bitidentical(mesh4):
    """chunk x stripe composition: a K=3 sharded lax.scan chunk must
    produce the same levels/mvs/recon as three sequential single-chip
    frame encodes (VERDICT r2 weak #3: the two headline scale features
    must compose)."""
    from av1tpu.engine_tpu import _unpack_planes_chunk  # noqa: F401
    from av1tpu.specav1 import jax_inter, jax_intra, jax_sharded

    PH = PW = 256
    TH = TW = 256
    K = 3
    rng = np.random.default_rng(7)
    base = rng.integers(16, 240, (PH * 2, PW * 2)).astype(np.uint8)
    srcs = [base[3 * i:3 * i + PH, 2 * i:2 * i + PW] for i in range(K + 1)]
    u0 = np.full((PH // 2, PW // 2), 120, np.uint8)
    v0 = np.full((PH // 2, PW // 2), 136, np.uint8)

    kout = jax_intra._encode_frame(jnp.asarray(srcs[0]), jnp.asarray(u0),
                                   jnp.asarray(v0), jnp.int32(80),
                                   nbr=PH // 32, nbc=PW // 32,
                                   bit_depth=8)
    refs = tuple(np.asarray(p) for p in kout[0:3])

    # single-chip sequential
    singles = []
    carry = tuple(jnp.asarray(r) for r in refs)
    for i in range(1, K + 1):
        out = jax_inter._encode_frame(
            jnp.asarray(srcs[i]), jnp.asarray(u0), jnp.asarray(v0),
            *carry, 80, 8, th=TH, tw=TW)
        carry = out[5:8]
        singles.append([np.asarray(a) for a in out])

    # sharded chunk
    packed = np.concatenate(
        [np.stack(srcs[1:]).ravel(),
         np.stack([u0] * K).ravel(), np.stack([v0] * K).ravel()])
    total = PH * PW + 2 * (PH // 2) * (PW // 2)
    cap = K * total // 16
    ry, ru, rv = (jax_sharded.shard_rows(mesh4, r) for r in refs)
    carry_s, pk, full, _src_last = jax_sharded.encode_chunk_sharded(
        mesh4, jnp.asarray(packed), ry, ru, rv,
        jnp.full((K,), 80, jnp.int32), jnp.zeros((K,), jnp.int32),
        jnp.zeros((K,), jnp.int32), jnp.full((K,), 4, jnp.int32),
        k=K, ph=PH, pw=PW, bit_depth=8, th=TH, tw=TW, cap=cap)
    ylvs, ulvs, vlvs = (np.asarray(a) for a in full)
    for i in range(K):
        assert np.array_equal(ylvs[i], singles[i][2]), f"frame {i} lv_y"
        assert np.array_equal(ulvs[i], singles[i][3]), f"frame {i} lv_u"
        assert np.array_equal(vlvs[i], singles[i][4]), f"frame {i} lv_v"
    for p in range(3):
        assert np.array_equal(np.asarray(carry_s[p]),
                              singles[-1][5 + p]), f"final recon {p}"


def test_distributed_noop_without_env(monkeypatch):
    from av1tpu.encoder.mesh import distributed
    monkeypatch.delenv("AV1TPU_COORDINATOR", raising=False)
    assert distributed.maybe_initialize() is False
