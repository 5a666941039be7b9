"""Regenerate the golden bitstream fixtures + manifest.

Run on CPU from the repo root whenever normative behavior changes
INTENTIONALLY (and say so in the commit message):

    python tests/golden/regen.py

Everything is deterministic: testsrc2 sources, fixed qindex/keyint,
explicit block size per fixture.
"""

import hashlib
import json
import os
import sys

GOLDEN = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(GOLDEN)))  # repo root

import jax

jax.config.update("jax_platforms", "cpu")

CONFIGS = {
    # name: (width, height, bit_depth, frames, block_log2, qindex)
    "g8_16": (160, 96, 8, 4, 4, 96),
    "g8_32": (192, 128, 8, 3, 5, 96),
    "g10_16": (160, 96, 10, 3, 4, 96),
}


def main():
    from av1tpu.legacy import decoder as dec_mod
    from av1tpu.engine_tpu import TpuEngine
    from av1tpu.media import ivf
    from av1tpu.media import obu as obu_mod
    from av1tpu.utils.testsrc import testsrc2

    manifest = {}
    for name, (w, h, bd, nframes, blog2, qindex) in CONFIGS.items():
        engine = TpuEngine()
        engine.cfg.keyint = 120
        engine.cfg.block_log2 = blog2
        frames = [testsrc2(w, h, i, bit_depth=bd) for i in range(nframes)]
        path = os.path.join(GOLDEN, f"{name}.ivf")
        sh = engine.sequence_header(w, h, bit_depth=bd)
        with open(path, "wb") as f:
            ivf.write_header(f, w, h, 24, 1, nframes)
            engine.start_stream()
            for i, (data, _is_key) in enumerate(
                    engine.encode_stream(frames, qindex)):
                unit = obu_mod.write_obu(obu_mod.OBU_TEMPORAL_DELIMITER, b"")
                if i == 0:
                    unit += obu_mod.write_obu(obu_mod.OBU_SEQUENCE_HEADER,
                                              sh.write())
                ivf.write_frame(f, unit + data, i)
        recons = dec_mod.decode_ivf(path)
        assert len(recons) == nframes
        shas = []
        for fr in recons:
            shas.append(hashlib.sha256(
                fr.y.tobytes() + fr.u.tobytes() + fr.v.tobytes()
            ).hexdigest())
        manifest[name] = {
            "width": w, "height": h, "bit_depth": bd, "frames": nframes,
            "block_log2": blog2, "qindex": qindex,
            "recon_sha256": shas,
            "stream_bytes": os.path.getsize(path),
        }
        print(f"{name}: {os.path.getsize(path)} bytes")
    with open(os.path.join(GOLDEN, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print("manifest written")


if __name__ == "__main__":
    main()
