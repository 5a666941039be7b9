"""Config schema tests (ref: internal/config/config.go)."""

import json

from av1tpu import config as config_mod


def test_defaults():
    cfg = config_mod.default_config()
    assert cfg.min_bytes == 2 * 1024 * 1024 * 1024
    assert cfg.max_size_ratio == 0.90
    assert cfg.scan_interval_sec == 60
    assert cfg.library_roots == []
    assert cfg.encoder == "tpu"
    assert "av1qsvd" in cfg.job_state_dir  # same data dir as reference


def test_load_reference_shaped_config(tmp_path):
    """A config file written for the reference daemon loads unchanged."""
    ref = {
        "ffmpeg_url": "https://example/ffmpeg.tar.xz",
        "ffmpeg_install_dir": "/opt/ff",
        "library_roots": ["/media/tv", "/media/movies"],
        "min_bytes": 2147483648,
        "max_size_ratio": 0.90,
        "job_state_dir": "/var/lib/av1qsvd/jobs",
        "scan_interval_sec": 60,
    }
    p = tmp_path / "config.json"
    p.write_text(json.dumps(ref))
    cfg = config_mod.load_config(str(p))
    assert cfg.library_roots == ["/media/tv", "/media/movies"]
    assert cfg.min_bytes == 2147483648
    assert cfg.job_state_dir == "/var/lib/av1qsvd/jobs"
    assert cfg.encoder == "tpu"  # additive default


def test_load_with_tpu_keys(tmp_path):
    p = tmp_path / "config.json"
    p.write_text(json.dumps({
        "library_roots": ["/m"],
        "encoder": "tpu",
        "tpu": {"keyint": 60, "num_chips": 4, "unknown_key": 1},
    }))
    cfg = config_mod.load_config(str(p))
    assert cfg.tpu.keyint == 60
    assert cfg.tpu.num_chips == 4


def test_load_missing_falls_back():
    cfg = config_mod.load_config_or_default("/nonexistent/config.json")
    assert cfg.max_size_ratio == 0.90


def test_sidecar_classification_format(tmp_path):
    from av1tpu import sidecars
    from av1tpu.classify import WebSourceDecision, SOURCE_WEB_LIKE
    f = tmp_path / "a.mkv"
    f.write_bytes(b"x")
    d = WebSourceDecision(SOURCE_WEB_LIKE, 7.5,
                          ["filename: contains 'web-dl'", "extension: .mp4 (web container)"])
    sidecars.write_classification_info(str(f), d)
    text = (tmp_path / "a.av1qsvd-classification.txt").read_text()
    assert text == ("Source Classification: WebLike\n"
                    "Score: 7.5\n"
                    "\n"
                    "Reasons:\n"
                    "  - filename: contains 'web-dl'\n"
                    "  - extension: .mp4 (web container)")


def test_qround_config_reaches_engine(tmp_path):
    """tpu.qround is the quantizer deadzone knob: normative for emitted
    bits, so it must come from config (not an env var) and differ the
    coded levels when changed."""
    import json

    import numpy as np

    p = tmp_path / "config.json"
    p.write_text(json.dumps({"tpu": {"qround": 0.45}}))
    cfg = config_mod.load_config(str(p))
    assert cfg.tpu.qround == 0.45

    from av1tpu.spec_engine import SpecTpuEngine
    eng = SpecTpuEngine(cfg.tpu)
    assert eng._qround == 0.45

    # bit-level effect: a lower qround means a larger rounding offset
    # (floor(|c|/q + 1 - qround)), so MORE nonzero levels get coded
    import jax.numpy as jnp

    from av1tpu.specav1 import jax_intra
    rng = np.random.default_rng(7)
    y = rng.integers(0, 255, (64, 64)).astype(np.uint8)
    u = rng.integers(0, 255, (32, 32)).astype(np.uint8)
    v = rng.integers(0, 255, (32, 32)).astype(np.uint8)
    outs = {}
    for q in (0.70, 0.20):
        o = jax_intra._encode_frame(jnp.asarray(y), jnp.asarray(u),
                                    jnp.asarray(v), jnp.int32(96),
                                    nbr=2, nbc=2, bit_depth=8, qround=q)
        outs[q] = int((np.asarray(o[3]) != 0).sum())
    assert outs[0.20] > outs[0.70]
