"""GOP checkpoint/resume tests (SURVEY §5c — mid-file resume)."""

import os

import numpy as np
import pytest

from av1tpu.legacy import decoder as dec_mod
from av1tpu.daemon.core import TranscodeError
from av1tpu.engine_tpu import TpuEngine
from av1tpu.media import mkv
from av1tpu.media.probe import probe_file
from av1tpu.utils import spool
from av1tpu.utils.testsrc import testsrc2 as make_testsrc


def test_spool_roundtrip(tmp_path):
    p = str(tmp_path / "x.spool")
    sig = {"bytes": 123, "mtime_ns": 456}
    w = spool.SpoolWriter(p, sig, 96, 320, 240)
    w.append(b"frame-0", True)
    w.append(b"frame-1", False)
    w.flush()
    w.close()
    got = spool.read_spool(p, sig, 96, 320, 240)
    assert got == [(b"frame-0", True), (b"frame-1", False)]
    # appender continues
    a = spool.SpoolAppender(p)
    a.append(b"frame-2", False)
    a.close()
    got = spool.read_spool(p, sig, 96, 320, 240)
    assert len(got) == 3
    # mismatched signature rejected
    assert spool.read_spool(p, {"bytes": 1, "mtime_ns": 2}, 96, 320, 240) is None
    assert spool.read_spool(p, sig, 80, 320, 240) is None


def test_spool_truncated_tail_dropped(tmp_path):
    p = str(tmp_path / "x.spool")
    sig = {"bytes": 1, "mtime_ns": 1}
    w = spool.SpoolWriter(p, sig, 96, 64, 64)
    w.append(b"complete", True)
    w.flush()
    w.close()
    with open(p, "ab") as f:
        f.write(b"\x50\x00\x00\x00\x01partial")  # claims 80 bytes, has 7
    got = spool.read_spool(p, sig, 96, 64, 64)
    assert got == [(b"complete", True)]


class InterruptingEngine(TpuEngine):
    """Raises after N encoded frames on the first transcode attempt."""

    def __init__(self, fail_after: int):
        super().__init__()
        self.fail_after = fail_after
        self.attempt = 0

    def encode_stream(self, frames, qindex):
        self.attempt += 1
        count = 0
        for out in super().encode_stream(frames, qindex):
            yield out
            count += 1
            if self.attempt == 1 and count >= self.fail_after:
                raise TranscodeError("synthetic interrupt")


@pytest.fixture()
def cv2_source(tmp_path):
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24.0,
                        (160, 96))
    for i in range(10):
        fr = make_testsrc(160, 96, i)
        w.write(np.stack([fr.y] * 3, axis=-1))
    w.release()
    return path


def test_transcode_resumes_from_spool(cv2_source, tmp_path):
    pr = probe_file(cv2_source)
    out_path = str(tmp_path / "out.mkv")
    eng = InterruptingEngine(fail_after=4)
    eng.cfg.keyint = 100

    with pytest.raises(TranscodeError):
        eng.transcode(cv2_source, out_path, pr, True)
    spool_path = out_path + ".spool"
    assert os.path.exists(spool_path)        # checkpoint survived
    assert not os.path.exists(out_path)      # no partial mkv claim

    # second attempt resumes and completes
    eng.transcode(cv2_source, out_path, pr, True)
    assert eng.last_job_stats["resumed_frames"] >= 4
    assert eng.last_job_stats["encoded_frames"] == 10
    assert not os.path.exists(spool_path)    # deleted after mux

    # the resumed output decodes end to end: 10 frames, 2+ keyframes
    with open(out_path, "rb") as f:
        m = mkv.parse(f)
        v = [t for t in m.tracks if t.codec_id == "V_AV1"][0]
        state = dec_mod.DecoderState()
        dec_mod.decode_frame_payload(v.codec_private[4:], state)
        frames = []
        keys = 0
        for pkt in mkv.iter_packets(f, m):
            if pkt.track_number == v.number:
                keys += pkt.keyframe
                frames.append(dec_mod.decode_frame_payload(pkt.data, state))
    assert len(frames) == 10
    assert keys >= 2  # original GOP start + resume-point keyframe
    src = list(TpuEngine.iter_source_frames(cv2_source))
    for i in (0, 5, 9):
        err = frames[i].y.astype(np.float64) - src[i].y.astype(np.float64)
        psnr = 10 * np.log10(255 ** 2 / (err ** 2).mean())
        assert psnr > 30, (i, psnr)
