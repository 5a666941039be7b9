"""The TPU encode engine: the box that replaces the exec'd ffmpeg child.

This is the reference's PROCESS+DEVICE boundary (SURVEY.md §3.2: "this box
is what becomes the JAX/Pallas engine"): demux → decode source frames →
AV1-encode on TPU → mux Matroska with copied audio/subtitle streams.

Pipeline: GOP structure (keyint + scene-cut keyframes) with gate-aware
rate control; fused per-frame jits (intra wavefront / inter subpel
search+MC) with device-resident references and sparse level transfer;
host C++ entropy coding overlapped with the next frame's device work;
multi-tile bitstreams; 8/10-bit; GOP-granular checkpoint/resume.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Iterator, Optional

import numpy as np

from av1tpu.config import TpuEncoderConfig
from av1tpu.daemon.core import TranscodeError
from av1tpu.encoder import quant, ratectrl
from av1tpu.legacy.core import inter_frame, intra_frame
from av1tpu.legacy import entropy_tile as tile_codec
from av1tpu.encoder.kernels import motion
from av1tpu.media import mkv, mkv_mux, mp4, obu as obu_mod
from av1tpu.media.mkv import Packet, Track
from av1tpu.media.streamcopy import output_tracks, plan_streams
from av1tpu.utils import spool as spool_mod
from av1tpu.utils.testsrc import Frame

log = logging.getLogger("av1tpu.engine")


def _unpack_planes(packed, hp: int, wp: int):
    """Split one packed upload back into y/u/v device views (slicing on
    device; one H2D transfer instead of three round trips)."""
    import functools

    import jax

    @functools.partial(jax.jit, static_argnames=("hp", "wp"))
    def _go(p, hp: int, wp: int):
        ny = hp * wp
        nc = (hp // 2) * (wp // 2)
        return (p[:ny].reshape(hp, wp),
                p[ny:ny + nc].reshape(hp // 2, wp // 2),
                p[ny + nc:ny + 2 * nc].reshape(hp // 2, wp // 2))

    return _go(packed, hp, wp)


def _unpack_planes_chunk(packed, k: int, hp: int, wp: int):
    """Chunk variant: one H2D upload of K frames → (K,hp,wp) + 2×(K,hc,wc)
    device stacks.  Layout: all Y frames, then all U, then all V."""
    import functools

    import jax

    @functools.partial(jax.jit, static_argnames=("k", "hp", "wp"))
    def _go(p, k: int, hp: int, wp: int):
        ny = k * hp * wp
        nc = k * (hp // 2) * (wp // 2)
        return (p[:ny].reshape(k, hp, wp),
                p[ny:ny + nc].reshape(k, hp // 2, wp // 2),
                p[ny + nc:ny + 2 * nc].reshape(k, hp // 2, wp // 2))

    return _go(packed, k, hp, wp)

_pool = None


def _entropy_pool():
    """Shared worker pool for per-frame host entropy coding (the C++
    range coder releases the GIL; frames carry no shared entropy
    state)."""
    global _pool
    if _pool is None:
        from concurrent.futures import ThreadPoolExecutor
        _pool = ThreadPoolExecutor(max_workers=4,
                                   thread_name_prefix="av1tpu-ec")
    return _pool


BLOCK = 16  # default luma block/tx size (auto mode upgrades to 32 at HD+)

_cache_enabled = False


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: the daemon is restarted by its
    service manager after every pass (SURVEY.md §1 control-flow), so
    first-compile costs must not recur on every restart."""
    global _cache_enabled
    if _cache_enabled:
        return
    if os.environ.get("AV1TPU_NO_COMPILE_CACHE") == "1":
        # test processes opt out: executable.serialize() segfaults in
        # long-lived processes with hundreds of live programs (see
        # tests/conftest.py); short-lived daemon/bench processes keep
        # the cache
        _cache_enabled = True
        return
    try:
        import jax
        cache_dir = os.path.expanduser("~/.cache/av1tpu/jax")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _make_cache_writes_atomic()
    except Exception as e:  # cache is an optimization, never fatal
        log.warning("compilation cache unavailable: %s", e)
    _cache_enabled = True


def _make_cache_writes_atomic() -> None:
    """jax's file cache writes entries with a bare write_bytes
    (lru_cache.LRUCache.put): a reader in another process (daemon +
    bench, or parallel test runs) can observe a TRUNCATED executable,
    and XLA's deserializer aborts the whole process on garbage
    (observed SIGABRT in get_executable_and_time).  Write to a
    tmp name in the same directory and rename into place — rename is
    atomic on POSIX, so readers only ever see complete entries."""
    try:
        from jax._src import lru_cache as _lru
    except Exception:
        return
    if getattr(_lru.LRUCache, "_av1tpu_atomic", False):
        return
    orig_put = _lru.LRUCache.put

    def put(self, key, val):
        # write the entry atomically FIRST; the original put then sees
        # it existing and no-ops the data write while still running its
        # bookkeeping (eviction lock / atime) when enabled
        if key:
            cache_path = self.path / f"{key}{_lru._CACHE_SUFFIX}"
            tmp = cache_path.with_name(
                cache_path.name + f".tmp{os.getpid()}")
            try:
                tmp.write_bytes(val)
                os.replace(tmp, cache_path)
            except OSError:
                return
        return orig_put(self, key, val)

    _lru.LRUCache.put = put
    _lru.LRUCache._av1tpu_atomic = True


@dataclasses.dataclass
class EncodeStats:
    frames: int = 0
    bytes: int = 0
    encode_seconds: float = 0.0

    @property
    def fps(self) -> float:
        return self.frames / self.encode_seconds if self.encode_seconds else 0.0


class TpuEngine:
    """Transcoder implementation (av1tpu.daemon.core.Transcoder protocol)."""

    def __init__(self, cfg: Optional[TpuEncoderConfig] = None):
        self.cfg = cfg or TpuEncoderConfig()
        self.stats = EncodeStats()
        self._ref_dev = None      # (y, u, v) uint8 recon planes ON DEVICE
        self._frame_idx = 0
        self._prev_thumb = None   # scene-cut detector state
        self._golden_thumb = None  # GOP-keyframe thumb (golden-aware cut)
        _enable_compilation_cache()

    @property
    def _ref(self):
        """Reference recon planes materialized to host int32 (tests/tools).
        The hot path never calls this — recons stay device-resident."""
        if self._ref_dev is None:
            return None
        return tuple(np.asarray(p).astype(np.int32) for p in self._ref_dev)

    def start_stream(self) -> None:
        """Reset GOP state (call once per input video)."""
        self._ref_dev = None
        self._golden_dev = None
        self._frame_idx = 0
        self._prev_thumb = None
        self._golden_thumb = None

    # Speed ladder (the reference's `compression_level 2` analog,
    # transcode.go:119-123): lower = slower/better.
    #   <=4: two references (last + GOP keyframe)
    #   <=5: per-block transform selection (DCT/ADST/IDTX)
    #   <=6: full pipeline (subpel, CDEF+restoration eval)  [default 6]
    #    7 : subpel off
    #   >=8: subpel off, CDEF/restoration eval off
    @property
    def _use_subpel(self) -> bool:
        return self.cfg.speed <= 6

    @property
    def _use_aux_filters(self) -> bool:
        return self.cfg.speed <= 7

    @property
    def _use_two_refs(self) -> bool:
        return self.cfg.speed <= 4

    @property
    def _use_tx_select(self) -> bool:
        return self.cfg.speed <= 5

    def _scene_cut(self, frame: Frame) -> bool:
        """Host-side scene-cut detector: mean abs diff of 16x-decimated
        luma vs the previous source frame.  A cut forces a keyframe so
        the post-cut P-frame doesn't burn bits predicting across it."""
        thumb = frame.y[::16, ::16].astype(np.int32)
        prev = self._prev_thumb
        self._prev_thumb = thumb
        if prev is None or prev.shape != thumb.shape:
            return False
        mad = np.abs(thumb - prev).mean()
        scale = 1 << (frame.bit_depth - 8)
        return mad > 28.0 * scale

    def encode_next(self, frame: Frame, qindex: int) -> tuple[bytes, bool]:
        """GOP-aware encode: keyframe every cfg.keyint frames, else inter.
        Returns (frame OBU payload, is_keyframe)."""
        return self._finalize(self._submit(frame, qindex))

    # ------------------------------------------------------------------
    # pipelined encode: device compute of frame N+1 overlaps host entropy
    # coding of frame N (jax dispatch is async; we defer materialization)

    def _block_for(self, frame: Frame) -> int:
        """Luma block/transform size for this stream.

        tpu.block_log2: 4 → 16, 5 → 32, 0 (auto) → 32 when the frame is
        720p-class or larger (big transforms code smooth HD content far
        cheaper) and both plane dims divide evenly, else 16.
        """
        want = int(getattr(self.cfg, "block_log2", 0))
        if want in (4, 5):
            n = 1 << want
        else:
            n = 32 if min(frame.height, frame.width) >= 640 else 16
        return n

    def _tile_rows_for(self, hp: int, block: int) -> int:
        """Largest legal power-of-two tile-row count ≤ the configured one
        (stripes must be whole block rows; cfg: tpu.tile_rows_log2)."""
        want = 1 << max(0, int(getattr(self.cfg, "tile_rows_log2", 0)))
        rows = hp // block
        t = want
        while t > 1 and (rows % t or (hp // t) % 16 or rows // t < 1):
            t //= 2
        return max(1, t)

    def _decide_key(self, frame: Frame, force_key: bool = False) -> bool:
        """Host-side keyframe decision (keyint + scene cut); advances
        per-stream GOP state.  Split from _submit so encode_stream can
        plan multi-frame chunks before dispatching anything."""
        keyint = max(1, self.cfg.keyint)
        cut = self._scene_cut(frame)  # always runs: updates detector state
        is_key = (force_key or self._ref_dev is None
                  or (self._frame_idx % keyint == 0) or cut)
        self._frame_idx += 1
        return is_key

    @staticmethod
    def _gop_predictable(frame: Frame, next_frame) -> bool:
        """Lookahead-1 GOP predictability for keyframe bit allocation.

        Estimates the global translation between the key and the next
        frame from 1-D row/column projection correlation (exact for
        pans, ~free on host), then compares the motion-compensated SAD
        on a subsampled grid against the frame's own 1px-misprediction
        SAD scale.  << 1 means the GOP's P frames will ride the
        keyframe recon at near-zero cost (exact-motion content), so
        the key deserves a much deeper q boost — its bits amortize
        over keyint frames while every P frame inherits its quality
        ceiling.  This closes most of the measured moving-clip gap
        (BASELINE.md round 4: −12 dB traced to GOP bit allocation —
        keyframe intra itself measures AT libaom cpu-used-7 efficiency
        at matched bits; the reference's encoder gets the same effect
        from av1_vaapi's own kf boost, transcode.go:119-123)."""
        y0 = np.asarray(frame.y)
        y1 = np.asarray(next_frame.y)
        if y0.shape != y1.shape:
            return False
        h, w = y0.shape
        if h < 64 or w < 64:
            return False
        a = y0.astype(np.float64)
        b = y1.astype(np.float64)
        R = 24  # +-24 px global-shift search via projections
        py0, py1 = a.mean(axis=1), b.mean(axis=1)
        px0, px1 = a.mean(axis=0), b.mean(axis=0)

        def best_shift(p0, p1):
            n = p0.shape[0]
            lo = min(R, n // 4)
            cand = range(-lo, lo + 1)
            best, bs = None, 0
            for s in cand:
                # p1 shifted by s aligns with p0
                if s >= 0:
                    d = np.abs(p0[s:] - p1[:n - s]) if s else \
                        np.abs(p0 - p1)
                else:
                    d = np.abs(p0[:n + s] - p1[-s:])
                m = d.mean()
                if best is None or m < best:
                    best, bs = m, s
            return bs

        dy = best_shift(py0, py1)
        dx = best_shift(px0, px1)
        # subsampled full-res SAD at the (dy, dx) alignment and at 0
        sub = 4

        def sad_at(sy, sx):
            y0a = a[max(sy, 0):h + min(sy, 0), max(sx, 0):w + min(sx, 0)]
            y1a = b[max(-sy, 0):h - max(sy, 0),
                    max(-sx, 0):w - max(sx, 0)]
            return np.abs(y0a[::sub, ::sub] - y1a[::sub, ::sub]).mean()

        sad = min(sad_at(dy, dx), sad_at(0, 0))
        # 1px-misprediction SAD scale of this content
        act = np.abs(a[::sub, 1:] - a[::sub, :-1]).mean()
        scale = float(1 << (frame.bit_depth - 8))
        return bool(sad < 0.6 * act + 0.25 * scale)

    def _classify_frame(self, frame: Frame, next_frame) -> str:
        """Lookahead-1 frame classification: 'key' | 'inter' | 'flash'.

        A flash is a one-frame scene (scene cut whose NEXT frame matches
        the pre-cut scene): coded as a NON-REFERENCE inter frame
        (refresh=0) so the following frame predicts from the pre-flash
        reference — replacing the two consecutive keyframes the plain
        detector would emit (strobes, lightning, photo flashes).

        Golden-aware cuts: a cut whose content matches the GOP keyframe
        (cut BACK to the scene the GOP opened on — strobes longer than
        one frame, cross-cut dialogue, flash photography runs) codes as
        a regular inter frame instead of a new key: the per-block
        LAST/GOLDEN selection predicts it from the keyframe at P-frame
        cost.  Only when the engine codes multi-reference streams
        (spec engine with cfg.golden)."""
        keyint = max(1, self.cfg.keyint)
        thumb = frame.y[::16, ::16].astype(np.int32)
        prev = self._prev_thumb
        scale = 1 << (frame.bit_depth - 8)
        thr = 28.0 * scale
        cut = (prev is not None and prev.shape == thumb.shape
               and np.abs(thumb - prev).mean() > thr)
        forced = (self._ref_dev is None
                  or (self._frame_idx % keyint == 0))
        self._frame_idx += 1
        if cut and not forced and next_frame is not None:
            nt = next_frame.y[::16, ::16].astype(np.int32)
            if (nt.shape == thumb.shape
                    and np.abs(nt - thumb).mean() > thr
                    and np.abs(nt - prev).mean() <= thr):
                # detector state stays at the pre-flash frame: the next
                # frame is compared (and predicted) against it
                return "flash"
        self._prev_thumb = thumb
        if cut and not forced:
            gt = self._golden_thumb
            if (getattr(self, "_golden", False) and gt is not None
                    and gt.shape == thumb.shape
                    and np.abs(thumb - gt).mean() <= thr):
                return "inter"
        if forced or cut:
            self._golden_thumb = thumb
            return "key"
        return "inter"

    def _submit(self, frame: Frame, qindex, force_key: bool = False,
                is_key: Optional[bool] = None, refresh: bool = True):
        """Dispatch one frame to the device; returns an un-materialized
        pending record.  Updates GOP state immediately (recons are device
        arrays produced by the async computation).  refresh=False codes
        a non-reference frame (flash): the GOP reference is untouched."""
        import jax.numpy as jnp
        if is_key is None:
            is_key = self._decide_key(frame, force_key)
        h, w = frame.height, frame.width
        bd = frame.bit_depth
        block = self._block_for(frame)
        yp, up, vp = self._pad_planes(frame, block)
        tiles = self._tile_rows_for(yp.shape[0], block)
        dc, ac = quant.dc_q(qindex, bd), quant.ac_q(qindex, bd)
        hp, wp = yp.shape
        packed = np.concatenate([yp.ravel(), up.ravel(), vp.ravel()])
        yj, uj, vj = _unpack_planes(jnp.asarray(packed), hp, wp)
        if is_key:
            out = intra_frame.encode_key_frame_v2(
                yj, uj, vj, dc, ac, qindex, block, bd, tiles)
            self._ref_dev = out[5:8]
            self._golden_dev = out[5:8]  # GOP keyframe = golden ref
            two = False
        else:
            two = self._use_two_refs and self._golden_dev is not None
            out = inter_frame.encode_inter_frame_v2(
                yj, uj, vj, *self._ref_dev, dc, ac, qindex, block, bd,
                tiles, self._use_subpel, self._use_aux_filters,
                *(self._golden_dev if two else (None, None, None)),
                use_two_refs=two, use_tx_select=self._use_tx_select)
            if refresh:
                self._ref_dev = out[5:8]
        return (is_key, qindex, w, h, out, tiles, block, two, refresh)

    @staticmethod
    def _finalize(pending) -> tuple[bytes, bool]:
        """Materialize a pending frame's outputs and entropy-code them."""
        is_key, qindex, w, h, out, tiles, block, two, refresh = pending
        fh = obu_mod.FrameHeader(
            frame_type=obu_mod.KEY_FRAME if is_key else obu_mod.INTER_FRAME,
            base_q_idx=qindex, width=w, height=h,
            luma_block_log2=block.bit_length() - 1,
            tile_rows_log2=tiles.bit_length() - 1, two_ref=two,
            refresh=refresh)
        # one batched D2H for every small output (each separate
        # materialization costs a full ~25 ms tunnel round trip)
        import jax as _jax
        small = [out[0], out[4], out[8], out[9], out[10], out[11], out[12]]
        small.append(out[13] if is_key else out[14])  # uv_modes | txs
        if two:
            small.append(out[13])                     # refs (inter only)
        got = _jax.device_get(tuple(small))
        (first, skips, lr_mode_a, cdef_on_a, sp_mask, sp_vals,
         sp_count) = got[:7]
        uv_modes = got[7] if is_key else None
        txs = got[7] if not is_key else None
        refs = got[-1] if two else None
        fh.lr_mode = int(lr_mode_a)
        fh.cdef_on = bool(cdef_on_a)
        from av1tpu.legacy.core.inter_frame import sparse_unpack_levels
        shapes = [tuple(out[1].shape), tuple(out[2].shape),
                  tuple(out[3].shape)]
        lvs = sparse_unpack_levels(sp_mask, sp_vals, sp_count, shapes)
        if lvs is None:
            lv_y, lv_u, lv_v = (np.asarray(out[1]), np.asarray(out[2]),
                                np.asarray(out[3]))
        else:
            lv_y, lv_u, lv_v = lvs
        B = len(skips)
        bpt = B // tiles  # stripes are contiguous block-row ranges
        payloads = []
        for t in range(tiles):
            sl = slice(t * bpt, (t + 1) * bpt)
            if is_key:
                payloads.append(tile_codec.encode_tile_intra(
                    skips[sl].astype(np.uint8), first[sl], uv_modes[sl],
                    lv_y[sl], lv_u[sl], lv_v[sl], block, block // 2))
            else:
                payloads.append(tile_codec.encode_tile_inter(
                    skips[sl].astype(np.uint8),
                    first[sl].astype(np.int32),
                    lv_y[sl], lv_u[sl], lv_v[sl], block, block // 2,
                    refs=refs[sl] if two else None, txs=txs[sl]))
        return obu_mod.write_frame_obu(fh, payloads), is_key

    def _submit_chunk(self, frames, qindexes):
        """Dispatch K consecutive P frames as ONE lax.scan chunk: one
        packed H2D upload, one device dispatch, one D2H batch at
        finalize.  Per-dispatch tunnel RTT amortizes over K frames."""
        import jax.numpy as jnp
        f0 = frames[0]
        w, h, bd = f0.width, f0.height, f0.bit_depth
        block = self._block_for(f0)
        planes = [self._pad_planes(fr, block) for fr in frames]
        hp, wp = planes[0][0].shape
        tiles = self._tile_rows_for(hp, block)
        k = len(frames)
        packed = np.concatenate(
            [np.stack([p[0] for p in planes]).ravel(),
             np.stack([p[1] for p in planes]).ravel(),
             np.stack([p[2] for p in planes]).ravel()])
        ys, us, vs = _unpack_planes_chunk(jnp.asarray(packed), k, hp, wp)
        dcs = jnp.asarray([quant.dc_q(q, bd) for q in qindexes],
                          dtype=jnp.int32)
        acs = jnp.asarray([quant.ac_q(q, bd) for q in qindexes],
                          dtype=jnp.int32)
        two = self._use_two_refs and self._golden_dev is not None
        out = inter_frame.encode_inter_chunk_v2(
            ys, us, vs, *self._ref_dev, dcs, acs,
            jnp.asarray(list(qindexes), dtype=jnp.int32), block, bd,
            tiles, self._use_subpel, self._use_aux_filters,
            *(self._golden_dev if two else (None, None, None)),
            use_two_refs=two, use_tx_select=self._use_tx_select)
        self._ref_dev = (out[5][-1], out[6][-1], out[7][-1])
        return (list(qindexes), w, h, out, tiles, block, k, two)

    @staticmethod
    def _finalize_chunk(pending) -> list[tuple[bytes, bool]]:
        """Materialize a chunk's outputs (one D2H batch) and entropy-code
        each frame; returns the K (payload, is_key=False) results.

        The K frames' symbol coding runs in a thread pool: each frame's
        tile starts from fresh CDFs (no cross-frame entropy state), the
        C++ coder keeps no mutable globals, and ctypes releases the GIL
        for the duration of the call — so host entropy time per chunk
        divides by the worker count."""
        qindexes, w, h, out, tiles, block, k, two = pending
        import jax as _jax
        small = [out[0], out[4], out[8], out[9], out[10], out[11],
                 out[12], out[14]]
        if two:
            small.append(out[13])
        got = _jax.device_get(tuple(small))
        (mvs, skips, lr_modes, cdef_ons, sp_masks, sp_valss,
         sp_counts, txs_k) = got[:8]
        refs_k = got[8] if two else None
        from av1tpu.legacy.core.inter_frame import sparse_unpack_levels
        shapes = [tuple(out[1].shape[1:]), tuple(out[2].shape[1:]),
                  tuple(out[3].shape[1:])]

        def encode_one(i: int) -> tuple[bytes, bool]:
            fh = obu_mod.FrameHeader(
                frame_type=obu_mod.INTER_FRAME, base_q_idx=qindexes[i],
                width=w, height=h,
                luma_block_log2=block.bit_length() - 1,
                tile_rows_log2=tiles.bit_length() - 1, two_ref=two)
            fh.lr_mode = int(lr_modes[i])
            fh.cdef_on = bool(cdef_ons[i])
            lvs = sparse_unpack_levels(sp_masks[i], sp_valss[i],
                                       sp_counts[i], shapes)
            if lvs is None:  # rare dense frame: fetch its full levels
                lv_y, lv_u, lv_v = map(np.asarray, _jax.device_get(
                    (out[1][i], out[2][i], out[3][i])))
            else:
                lv_y, lv_u, lv_v = lvs
            sk, first = skips[i], mvs[i]
            bpt = len(sk) // tiles
            payloads = []
            for t in range(tiles):
                sl = slice(t * bpt, (t + 1) * bpt)
                payloads.append(tile_codec.encode_tile_inter(
                    sk[sl].astype(np.uint8), first[sl].astype(np.int32),
                    lv_y[sl], lv_u[sl], lv_v[sl], block, block // 2,
                    refs=refs_k[i][sl] if two else None,
                    txs=txs_k[i][sl]))
            return obu_mod.write_frame_obu(fh, payloads), False

        return list(_entropy_pool().map(encode_one, range(k)))

    def encode_stream(self, frames, qindex):
        """Pipelined GOP encode over an iterable of Frames.

        ``qindex`` is an int (constant quality) or a
        ratectrl.GateRateController (adaptive, quality-floored).  Yields
        (payload, is_keyframe) in order; while one dispatch's symbols are
        entropy-coded on the host, the next is already running on the
        TPU.  Runs of cfg.chunk consecutive P frames are batched into a
        single lax.scan dispatch (keyframes and sub-chunk remainders go
        through the single-frame path so only two program shapes
        compile)."""
        from collections import deque
        rate = qindex if hasattr(qindex, "qindex_for") else None
        K = max(1, int(getattr(self.cfg, "chunk", 1)))
        frames = iter(frames)
        first = next(frames, None)
        if first is None:
            return
        K = min(K, self._chunk_cap(first.width, first.height,
                                   first.bit_depth))
        import itertools
        frames = itertools.chain([first], frames)
        pending = deque()  # entries: ("single", rec) | ("chunk", rec)
        depth = 2  # dispatches in flight: hides host bursts + tunnel RTT
        # (measured: 2 beats 3 — 9.88 vs 7.83 fps at 1080p; a deeper
        # queue delays finalize past the point the tunnel can refill)
        idx = 0
        buf = []  # buffered (frame, q) awaiting a full chunk

        def flush_buf():
            if not buf:
                return
            if len(buf) == K and K > 1:
                pending.append(("chunk", self._submit_chunk(
                    [f for f, _ in buf], [q for _, q in buf])))
            else:
                for f, q in buf:
                    pending.append(("single",
                                    self._submit(f, q, is_key=False)))
            buf.clear()

        def finalize_one():
            kind, rec = pending.popleft()
            if kind == "single":
                return [self._finalize(rec)]
            return self._finalize_chunk(rec)

        # L-frame lookahead window: win[0] drives flash classification
        # (the old 1-frame lookahead) and the window's complexity stats
        # feed the LookaheadRateController so q leads content changes
        # instead of trailing them by an adapt interval.  L adapts to
        # the frame footprint (bounded host buffering at 4K 10-bit).
        fbytes = max(1, first.width * first.height *
                     (2 if first.bit_depth > 8 else 1) * 3 // 2)
        L = max(2, min(int(getattr(self.cfg, "lookahead", 16)),
                       max(2, 256_000_000 // fbytes)))
        win = deque()
        wcs = deque()
        _ds = [None]

        def _refill():
            while len(win) < L:
                f = next(frames, None)
                if f is None:
                    break
                cst, _ds[0] = ratectrl.LookaheadRateController.\
                    frame_complexity(f.y, _ds[0])
                win.append(f)
                wcs.append(cst)

        _refill()
        while win:
            frame = win.popleft()
            cur_c = wcs.popleft()
            _refill()
            nxt = win[0] if win else None
            if rate is not None:
                try:
                    q = rate.qindex_for(idx, c=cur_c, window=list(wcs))
                except TypeError:  # non-lookahead controller
                    q = rate.qindex_for(idx)
            else:
                q = qindex
            idx += 1
            kind = self._classify_frame(frame, nxt)
            if kind != "key" and getattr(self, "_deep_gop", False):
                # predictable GOP: P frames ride the deep-boosted key
                # recon — their own residual is mostly interpolation
                # noise, so shift their bits to the key (the +16 costs
                # <0.1 dB GOP-average, measured on textured pans)
                q = min(255, q + 16)
            if kind == "key":
                flush_buf()  # preserve order: buffered P frames first
                # keyframe quality boost: the key is every GOP frame's
                # (direct or golden) reference, so spending qindex on
                # it lifts the whole GOP for a cost amortized over
                # keyint frames.  Deeper boost measured on textured
                # 1080p content: q//3 (q96 -> key q64) gained ~+1 dB
                # GOP-average at +7% of one GOP's bits vs the old -8
                # (BASELINE.md round 4; libaom's kf boost is similar).
                # Motion-predictable GOPs (lookahead-1 projection SAD)
                # boost twice as deep: their P frames ride the key
                # recon at near-skip cost, so the key's quality IS the
                # GOP's — measured +4 dB at ~matched clip bits on
                # textured pans (BASELINE.md round 5).
                self._deep_gop = (nxt is not None
                                  and self._gop_predictable(frame, nxt))
                if self._deep_gop:
                    kq = max(0, q - min(88, max(8, (3 * q) // 4)))
                else:
                    kq = max(0, q - min(48, max(8, q // 3)))
                pending.append(("single",
                                self._submit(frame, kq, is_key=True)))
            elif kind == "flash":
                flush_buf()
                pending.append(("single",
                                self._submit(frame, q, is_key=False,
                                             refresh=False)))
            elif K > 1:
                buf.append((frame, q))
                if len(buf) == K:
                    flush_buf()
            else:
                pending.append(("single",
                                self._submit(frame, q, is_key=False)))
            while len(pending) > depth:
                for payload, is_key in finalize_one():
                    if rate:
                        rate.record(len(payload) * 8)
                    yield payload, is_key
        flush_buf()
        while pending:
            for payload, is_key in finalize_one():
                if rate:
                    rate.record(len(payload) * 8)
                yield payload, is_key

    @staticmethod
    def _pad_planes(frame: Frame, block: int):
        """Pad Y to block multiples and chroma to half that (uint8/uint16)."""
        dtype = np.uint8 if frame.bit_depth == 8 else np.uint16
        yp = intra_frame.pad_plane(frame.y.astype(dtype), block)
        hp, wp = yp.shape
        up = np.zeros((hp // 2, wp // 2), dtype)
        vp = np.zeros((hp // 2, wp // 2), dtype)
        uu = frame.u.astype(dtype)
        vv = frame.v.astype(dtype)
        up[:uu.shape[0], :uu.shape[1]] = uu
        vp[:vv.shape[0], :vv.shape[1]] = vv
        if uu.shape[0] < up.shape[0]:
            up[uu.shape[0]:, :] = up[uu.shape[0] - 1:uu.shape[0], :]
            vp[vv.shape[0]:, :] = vp[vv.shape[0] - 1:vv.shape[0], :]
        if uu.shape[1] < up.shape[1]:
            up[:, uu.shape[1]:] = up[:, uu.shape[1] - 1:uu.shape[1]]
            vp[:, vv.shape[1]:] = vp[:, vv.shape[1] - 1:vv.shape[1]]
        return yp, up, vp

    # ------------------------------------------------------------------
    # pipelined encode: device compute of frame N+1 overlaps host entropy
    # coding of frame N (jax dispatch is async; we defer materialization)

    def _encode_interframe(self, frame: Frame, qindex: int) -> bytes:
        import jax.numpy as jnp
        h, w = frame.height, frame.width
        bd = frame.bit_depth
        yp, up, vp = self._pad_planes(frame, BLOCK)
        ry, ru, rv = self._ref_dev
        dc, ac = quant.dc_q(qindex, bd), quant.ac_q(qindex, bd)
        (mvs, lv_y, lv_u, lv_v, skips, rec_y, rec_u, rec_v,
         lr_mode, cdef_on, *_sp) = inter_frame.encode_inter_frame_v2(
                jnp.asarray(yp), jnp.asarray(up), jnp.asarray(vp),
                ry, ru, rv, dc, ac, qindex, BLOCK, bd)
        self._ref_dev = (rec_y, rec_u, rec_v)  # stays on device
        mvs = np.asarray(mvs).astype(np.int32)
        lv_y = np.asarray(lv_y)
        lv_u = np.asarray(lv_u)
        lv_v = np.asarray(lv_v)
        skips = np.asarray(skips).astype(np.uint8)
        tile = tile_codec.encode_tile_inter(skips, mvs, lv_y, lv_u, lv_v,
                                            BLOCK, BLOCK // 2)
        fh = obu_mod.FrameHeader(frame_type=obu_mod.INTER_FRAME,
                                 base_q_idx=qindex, width=w, height=h,
                                 luma_block_log2=BLOCK.bit_length() - 1,
                                 lr_mode=int(np.asarray(lr_mode)),
                                 cdef_on=bool(np.asarray(cdef_on)))
        return obu_mod.write_frame_obu(fh, tile)

    # ------------------------------------------------------------------
    # core per-frame encode

    def encode_keyframe(self, frame: Frame, qindex: int) -> bytes:
        """Encode one frame as an intra keyframe; returns the frame OBU.
        (Updates GOP reference state like any encoded frame.)"""
        payload, _ = self._finalize(self._submit(frame, qindex,
                                                 force_key=True))
        return payload

    def sequence_header(self, width: int, height: int,
                        bit_depth: int = 8,
                        source_stream=None) -> obu_mod.SequenceHeader:
        """AV1 sequence header; HDR sources carry their colour
        description (primaries/transfer/matrix code points) through
        from the container probe into the bitstream color_config."""
        sh = obu_mod.SequenceHeader(width=width, height=height,
                                    bit_depth=bit_depth)
        if source_stream is not None:
            sh.color_primaries = getattr(source_stream,
                                         "color_primaries_code", 0)
            sh.color_transfer = getattr(source_stream,
                                        "color_transfer_code", 0)
            sh.color_matrix = getattr(source_stream,
                                      "color_matrix_code", 0)
        return sh

    def codec_private(self, sh) -> bytes:
        """MKV CodecPrivate for the video track (av1C record)."""
        return obu_mod.av1c_record(sh)

    def encode_smoke_frame(self, frame: Frame) -> bytes:
        """Startup self-test payload (VerifyFFmpeg analog)."""
        return self.encode_keyframe(frame, qindex=96)

    @staticmethod
    def _chunk_cap(width: int, height: int, bit_depth: int) -> int:
        """Largest legal chunk for a frame size: K x frame-samples must
        stay inside the validated compile envelope (4 x 1080p at
        8-bit) — oversized lax.scan programs at 4K have crashed XLA
        compilation on this platform."""
        budget = 4 * 1920 * 1088
        px = width * height * (2 if bit_depth > 8 else 1)
        return max(1, budget // max(1, px))

    def _prewarm(self, width: int, height: int, bit_depth: int = 8):
        """Compile this job's program shapes CONCURRENTLY before the
        encode loop: distinct XLA programs compile in parallel on the
        axon platform (measured 99 s sequential -> 18 s parallel for
        two fresh shapes), so the daemon's cold-start latency divides
        by roughly the shape count."""
        import threading

        import jax
        import jax.numpy as jnp
        dt = np.uint8 if bit_depth == 8 else np.uint16
        fr = Frame(y=np.zeros((height, width), dt),
                   u=np.zeros((height // 2, width // 2), dt),
                   v=np.zeros((height // 2, width // 2), dt))
        block = self._block_for(fr)
        yp, up, vp = self._pad_planes(fr, block)
        hp, wp = yp.shape
        hc, wc = up.shape
        tiles = self._tile_rows_for(hp, block)
        bd = bit_depth
        dc, ac = quant.dc_q(96, bd), quant.ac_q(96, bd)
        K = min(max(1, int(getattr(self.cfg, "chunk", 1))),
                self._chunk_cap(width, height, bd))
        two = self._use_two_refs
        zy = jnp.zeros((hp, wp), dt)
        zc = jnp.zeros((hc, wc), dt)

        def warm_key():
            out = intra_frame.encode_key_frame_v2(
                zy, zc, zc, dc, ac, 96, block, bd, tiles)
            np.asarray(out[12])

        def warm_single():
            out = inter_frame.encode_inter_frame_v2(
                zy, zc, zc, zy, zc, zc, dc, ac, 96, block, bd, tiles,
                self._use_subpel, self._use_aux_filters,
                *((zy, zc, zc) if two else (None, None, None)),
                use_two_refs=two, use_tx_select=self._use_tx_select)
            np.asarray(out[12])

        def warm_chunk():
            ys = jnp.zeros((K, hp, wp), dt)
            cs = jnp.zeros((K, hc, wc), dt)
            qs = jnp.full((K,), 96, jnp.int32)
            dcs = jnp.full((K,), dc, jnp.int32)
            acs = jnp.full((K,), ac, jnp.int32)
            out = inter_frame.encode_inter_chunk_v2(
                ys, cs, cs, zy, zc, zc, dcs, acs, qs, block, bd, tiles,
                self._use_subpel, self._use_aux_filters,
                *((zy, zc, zc) if two else (None, None, None)),
                use_two_refs=two, use_tx_select=self._use_tx_select)
            np.asarray(out[12])

        jobs = [warm_key, warm_single] + ([warm_chunk] if K > 1 else [])
        # parallel compile is a TPU cold-start feature; the XLA CPU
        # client segfaults when the persistent cache serializes an
        # executable concurrently with another thread's compile (see
        # spec_engine._prewarm) — run sequentially off-TPU
        if jax.default_backend() != "tpu":
            for j in jobs:
                j()
            return
        threads = [threading.Thread(target=j, daemon=True) for j in jobs]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    # ------------------------------------------------------------------
    # source decode (cv2-based pixel path)

    @staticmethod
    def iter_source_frames(path: str) -> Iterator[Frame]:
        # uncompressed y4m: native 8/10-bit planes (the test vehicle
        # for the high-bit-depth path; cv2 decodes everything at 8-bit)
        with open(path, "rb") as probe_f:
            if probe_f.read(9) == b"YUV4MPEG2":
                from av1tpu.media import y4m
                f = open(path, "rb")
                try:
                    hdr, frames = y4m.read_frames(f)
                    for y, u, v in frames:
                        yield Frame(y=y, u=u, v=v,
                                    bit_depth=hdr.bit_depth)
                finally:
                    f.close()
                return
        # native libavcodec decode: straight to planar I420 at source
        # bit depth (8 or 10) — no BGR round-trip, and the only route
        # for compressed >8-bit sources (HDR10 HEVC etc.)
        from av1tpu.media import avdec
        if avdec.available():
            with avdec.SourceDecoder(path) as dec:
                for df in dec:
                    yield Frame(y=df.y, u=df.u, v=df.v,
                                bit_depth=df.bit_depth)
            return
        import cv2
        cap = cv2.VideoCapture(path)
        if not cap.isOpened():
            raise TranscodeError(f"cannot open source video: {path}")
        try:
            while True:
                ok, img = cap.read()
                if not ok:
                    return
                h, w = img.shape[:2]
                if h % 2 or w % 2:  # even-dimension policy (transcode.go:98)
                    img = img[:h - (h % 2), :w - (w % 2)]
                    h, w = img.shape[:2]
                i420 = cv2.cvtColor(img, cv2.COLOR_BGR2YUV_I420)
                y = i420[:h]
                u = i420[h:h + h // 4].reshape(h // 2, w // 2)
                v = i420[h + h // 4:].reshape(h // 2, w // 2)
                yield Frame(y=y.copy(), u=u.copy(), v=v.copy())
        finally:
            cap.release()

    # ------------------------------------------------------------------
    # full transcode (the ProcessJob engine call)

    def transcode(self, input_path: str, output_path: str, probe_result,
                  is_webrip_like: bool) -> None:
        vs = probe_result.video_stream
        if vs is None:
            raise TranscodeError("no video stream found in probe result")
        # HDR / high-bit-depth gate: compressed >8-bit or PQ/HLG
        # sources decode natively via libavcodec (media/avdec) into the
        # 10-bit encode pipeline.  When that decoder is unavailable the
        # only fallback is cv2's 8-bit BGR path, which would silently
        # destroy the grade (the reference squeezed these through 8-bit
        # nv12 — transcode.go:99-109; SURVEY §2 flags that as a defect,
        # not a feature) — so refuse and leave the source untouched.
        transfer = getattr(vs, "color_transfer_code", 0)
        src_bits = int(getattr(vs, "bit_depth", 0) or 0)
        native_decode = probe_result.format.format_name == "yuv4mpegpipe"
        if not native_decode and (transfer in (16, 18) or src_bits > 8):
            from av1tpu.media import avdec
            if not avdec.available():
                raise TranscodeError(
                    f"HDR/high-bit-depth source (transfer code "
                    f"{transfer}, {src_bits or '?'}-bit): native decode "
                    "unavailable and the 8-bit fallback would mangle "
                    "it; refusing (reference behavior was an 8-bit "
                    "squeeze — intentionally not reproduced)")
        quality = ratectrl.determine_quality(vs.height)
        qindex = ratectrl.quality_to_qindex(quality)
        fps_num, fps_den = _parse_rate(vs.avg_frame_rate
                                       or vs.r_frame_rate) or (24, 1)
        frame_dur_ns = 1_000_000_000 * fps_den // fps_num

        # gate-aware rate control: quality-floored (see GateRateController)
        rate = None
        try:
            duration = float(probe_result.format.duration or 0)
            orig_bytes = int(probe_result.format.size or 0)
        except (TypeError, ValueError):
            duration, orig_bytes = 0.0, 0
        est_total = 0
        if duration > 0:
            est_total = max(1, int(duration * fps_num / fps_den))
        if duration > 0 and orig_bytes > 0:
            total_frames = est_total
            gate_ratio = getattr(self, "gate_ratio", 0.90)
            # video budget = gate target minus copied-stream bytes, with
            # a 5% safety margin and ~2% mux overhead (main.go:384-449
            # estimator shape)
            video_fraction = 0.95
            target_bytes = (orig_bytes * gate_ratio * 0.95
                            - orig_bytes * (1 - video_fraction)) / 1.02
            if target_bytes > 0:
                rate = ratectrl.LookaheadRateController(
                    qindex, target_bytes * 8, total_frames,
                    max(1, self.cfg.keyint),
                    window=int(getattr(self.cfg, "lookahead", 16)))

        plan = plan_streams(probe_result)

        # source containers for stream copy + the video track's source
        # PTS (carried through to the output, reference
        # transcode.go:58-64,125-131: ffmpeg passes source timestamps;
        # WebRip-like adds -start_at_zero/-avoid_negative_ts make_zero)
        src_packets = []
        src_video_pts: list[int] = []
        chapters = tags = b""
        fmt = probe_result.format.format_name
        if "matroska" in fmt:
            with open(input_path, "rb") as f:
                m = mkv.parse(f)
                chapters, tags = m.chapters_payload, m.tags_payload
                keep = set()
                for s in plan.copied:
                    if s.index < len(m.tracks):
                        keep.add(m.tracks[s.index].number)
                number_map = {m.tracks[s.index].number:
                              plan.output_number[s.index]
                              for s in plan.copied if s.index < len(m.tracks)}
                vtrack = None
                if plan.video_stream is not None and \
                        plan.video_stream.index < len(m.tracks):
                    vtrack = m.tracks[plan.video_stream.index].number
                for pkt in mkv.iter_packets(f, m):
                    if pkt.track_number == vtrack:
                        src_video_pts.append(pkt.timestamp_ns)
                    if pkt.track_number in keep:
                        pkt.track_number = number_map[pkt.track_number]
                        src_packets.append(pkt)
        elif "mp4" in fmt or "mov" in fmt:
            with open(input_path, "rb") as f:
                m4 = mp4.parse(f)
                idx_of = {t.track_id: i for i, t in enumerate(m4.tracks)}
                for s in plan.copied:
                    track = m4.tracks[s.index] if s.index < len(m4.tracks) else None
                    if track is None:
                        continue
                    for pkt in mp4.iter_packets(f, m4, track):
                        pkt.track_number = plan.output_number[s.index]
                        src_packets.append(pkt)
                if plan.video_stream is not None and \
                        plan.video_stream.index < len(m4.tracks):
                    vt = m4.tracks[plan.video_stream.index]
                    src_video_pts = [p.timestamp_ns
                                     for p in mp4.iter_packets(f, m4, vt)]
            src_packets.sort(key=lambda p: p.timestamp_ns)

        # encode video (with GOP-granular checkpoint/resume, SURVEY §5c)
        t0 = time.monotonic()
        src_iter = self.iter_source_frames(input_path)
        first = next(src_iter, None)
        if first is None:
            raise TranscodeError("source decoded zero frames")
        width, height = first.width, first.height

        spool_path = output_path + ".spool"
        sig = spool_mod.source_signature(input_path)
        resumed = spool_mod.read_spool(spool_path, sig, qindex, width,
                                       height) or []
        n_resume = len(resumed)
        if n_resume:
            log.info("resuming from spool: %d frames already encoded",
                     n_resume)
            writer = spool_mod.SpoolAppender(spool_path)
        else:
            writer = spool_mod.SpoolWriter(spool_path, sig, qindex,
                                           width, height)

        def _all_frames():
            yield first
            yield from src_iter

        def _to_encode():
            for i, frame in enumerate(_all_frames()):
                if i < n_resume:
                    continue  # decoded + discarded (cheap vs re-encoding)
                yield frame

        # video timestamps: source PTS in display order (VFR preserved);
        # frames beyond the container's packet list fall back to CFR
        # steps.  WebRip-like sources are normalized to start at zero
        # (reference transcode.go:58-64,125-131: -start_at_zero /
        # -avoid_negative_ts make_zero rebase EVERY stream by one shared
        # offset — the earliest timestamp across video and all copied
        # tracks — so A/V deltas survive the rebase exactly).
        pts_plan = sorted(src_video_pts)
        if is_webrip_like:
            starts = []
            if pts_plan:
                starts.append(pts_plan[0])
            if src_packets:
                starts.append(min(p.timestamp_ns for p in src_packets))
            base = min(starts) if starts else 0
            if base != 0:
                pts_plan = [t - base for t in pts_plan]
                for p in src_packets:
                    p.timestamp_ns -= base

        def ts_of(i: int) -> tuple[int, int]:
            if i < len(pts_plan):
                t = pts_plan[i]
                if i + 1 < len(pts_plan) and pts_plan[i + 1] > t:
                    return t, pts_plan[i + 1] - t
                return t, frame_dur_ns
            extra = i - len(pts_plan) + 1
            last = pts_plan[-1] if pts_plan else -frame_dur_ns
            return last + extra * frame_dur_ns, frame_dur_ns

        # streaming mux: packets are written as GOPs finish instead of
        # buffering the whole encoded stream in RAM (the reference
        # pipes through ffmpeg's muxer the same way)
        sh = self.sequence_header(width, height,
                                  bit_depth=first.bit_depth,
                                  source_stream=plan.video_stream)
        tracks = output_tracks(plan, width, height, frame_dur_ns)
        tracks[0].codec_private = self.codec_private(sh)
        src_packets.sort(key=lambda p: p.timestamp_ns)

        n = 0
        n_new = 0
        total_bytes = 0
        last_end_ns = 0
        si = 0
        # compile this job's program shapes in parallel before frames
        # start flowing (cold-start latency divides by ~shape count)
        self._prewarm(width, height, first.bit_depth)
        self.start_stream()  # resume point opens a fresh GOP (keyframe)
        out_f = open(output_path, "wb")
        try:
            mkv_writer = mkv_mux.MkvWriter(
                out_f, tracks, chapters_payload=chapters,
                tags_payload=tags)

            def emit(payload: bytes, is_key: bool, i: int):
                nonlocal si, last_end_ns, total_bytes
                t, dur = ts_of(i)
                while si < len(src_packets) and \
                        src_packets[si].timestamp_ns <= t:
                    mkv_writer.write_packet(src_packets[si])
                    si += 1
                mkv_writer.write_packet(Packet(
                    track_number=1, timestamp_ns=t, data=payload,
                    keyframe=is_key, duration_ns=dur))
                last_end_ns = t + dur
                total_bytes += len(payload)

            # live per-job progress (SURVEY §5 tracing mandate): the
            # daemon persists these into the job JSON, throttled to
            # ~1 Hz so frame cadence never turns into fsync cadence
            progress_cb = getattr(self, "progress_cb", None)
            prog_every = float(getattr(self, "progress_interval", 1.0))
            last_prog = 0.0

            def report_progress(done: int) -> None:
                nonlocal last_prog
                if progress_cb is None:
                    return
                now = time.monotonic()
                if now - last_prog < prog_every:
                    return
                last_prog = now
                try:
                    progress_cb(done, est_total)
                except Exception:
                    log.exception("progress callback failed")

            for i, (payload, is_key) in enumerate(resumed):
                emit(payload, is_key, i)
                n += 1
            report_progress(n)
            for payload, is_key in self.encode_stream(
                    _to_encode(), rate if rate is not None else qindex):
                writer.append(payload, is_key)
                emit(payload, is_key, n)
                n += 1
                n_new += 1
                if is_key:
                    writer.flush()  # durable at GOP boundaries
                report_progress(n)
            if n == 0:
                raise TranscodeError("source decoded zero frames")
            while si < len(src_packets):
                mkv_writer.write_packet(src_packets[si])
                si += 1
            mkv_writer.finalize(last_end_ns / 1e9)
        except BaseException:
            # no partial output claims: the spool checkpoint survives,
            # the half-written mkv must not (resume re-muxes from zero)
            out_f.close()
            try:
                os.unlink(output_path)
            except OSError:
                pass
            raise
        finally:
            out_f.close()
            writer.flush()
            writer.close()

        dt = time.monotonic() - t0
        if src_video_pts and len(src_video_pts) != n:
            log.info("source video pts count %d != frames %d; tail "
                     "timestamps synthesized as CFR",
                     len(src_video_pts), n)
        self.stats.frames += n_new
        self.stats.encode_seconds += dt
        self.stats.bytes += total_bytes
        fps = n_new / dt if dt > 0 else 0.0
        self.last_job_stats = {"encoded_frames": n, "encode_fps": fps,
                               "resumed_frames": n_resume,
                               "qround": getattr(self, "_qround", 0.0)}
        log.info("encoded %d frames (%d resumed) %dx%d in %.2fs "
                 "(%.2f fps), %d bytes", n, n_resume, width, height, dt,
                 fps, total_bytes)
        spool_mod.delete(spool_path)  # checkpoint no longer needed


def _parse_rate(rate: str) -> Optional[tuple[int, int]]:
    if not rate:
        return None
    parts = rate.split("/")
    try:
        if len(parts) == 2:
            num, den = int(parts[0]), int(parts[1])
            return (num, den) if num > 0 and den > 0 else None
        f = float(rate)
        return (round(f * 1000), 1000) if f > 0 else None
    except ValueError:
        return None
