"""Extract the AV1 spec default (2-D diagonal) scan tables for RECT
transform sizes from the system codec libraries' .rodata.

The spec fixes explicit scan tables (Default_Scan_4x8 ...) for
rectangular transforms; unlike the square sizes they are NOT the
alternating JPEG zigzag (found behaviorally: a single coefficient at
(1,0) of a 16x32 inter tx desyncs libaom — tmp fuzz round 3).  No AV1
spec text or dev headers exist in this container, but libaom and
libgav1 both embed the tables as int16 permutation arrays.

Method:
 1. scan .rodata of both libraries for int16 arrays of length L in
    {32, 64, 128, 256, 512} that are permutations of 0..L-1 starting
    at 0 (scan tables always start at the DC position),
 2. keep candidates found in BOTH libraries (spec constants agree
    across independent builds),
 3. behavioral disambiguation happens in the caller/test: each
    candidate is interpreted at both strides (WxH and HxW) and checked
    by round-tripping a single-coefficient bitstream through libaom
    (tests/test_rect_scans.py keeps this pinned).

Writes av1tpu/specav1/av1_default_scans.npz with arrays keyed
"scan_{w}x{h}" holding (L, 2) int32 (row, col) in scan order.

Usage: python -m tools.extract_scans [--verify-only]
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import numpy as np

LIBAOM = "/usr/lib/x86_64-linux-gnu/libaom.so.3"
LIBGAV1 = "/usr/lib/x86_64-linux-gnu/libgav1.so.1"


def read_rodata_u16(path: str) -> np.ndarray:
    out = subprocess.run(["readelf", "-S", path],
                         capture_output=True, text=True).stdout
    lines = out.splitlines()
    for i, line in enumerate(lines):
        if " .rodata " in line:
            off = int(line.split()[-1], 16)
            size = int(lines[i + 1].split()[0], 16)
            data = Path(path).read_bytes()[off:off + size]
            return np.frombuffer(data[:len(data) & ~1], dtype="<u2")
    raise RuntimeError(f"no .rodata in {path}")


def find_perms(rod: np.ndarray, length: int) -> list:
    """All int16 permutations of 0..length-1 beginning with 0."""
    hits = []
    zeros = np.flatnonzero(rod == 0)
    target = length * (length - 1) // 2
    for z in zeros:
        seg = rod[z:z + length]
        if len(seg) < length or seg.max() != length - 1:
            continue
        if int(seg.sum()) != target:
            continue
        if len(np.unique(seg)) == length:
            hits.append(np.asarray(seg, np.int32))
    # dedup
    uniq = []
    for h in hits:
        if not any(np.array_equal(h, u) for u in uniq):
            uniq.append(h)
    return uniq


def is_diagonalish(seg: np.ndarray, w: int) -> bool:
    """True if the array, read at stride w, visits positions in
    non-decreasing anti-diagonal order (property of every AV1 default
    scan; excludes row/col-major and iscan arrays)."""
    rows, cols = seg // w, seg % w
    d = rows + cols
    return bool(np.all(np.diff(d) >= 0)) and not bool(
        np.all(seg == np.arange(len(seg))))


RECT_SHAPES = [(4, 8), (8, 4), (4, 16), (16, 4), (8, 16), (16, 8),
               (8, 32), (32, 8), (16, 32), (32, 16)]


def main(out_path: str | None = None) -> dict:
    rod_aom = read_rodata_u16(LIBAOM)
    rod_gav = read_rodata_u16(LIBGAV1)
    by_len: dict = {}
    for L in sorted({w * h for (w, h) in RECT_SHAPES}):
        a = find_perms(rod_aom, L)
        g = find_perms(rod_gav, L)
        both = [x for x in a if any(np.array_equal(x, y) for y in g)]
        by_len[L] = both
        print(f"L={L}: {len(a)} in libaom, {len(g)} in libgav1, "
              f"{len(both)} shared")
    # classify: for each rect shape keep shared perms that are
    # diagonal-monotone at that stride
    tables: dict = {}
    for (w, h) in RECT_SHAPES:
        cands = [seg for seg in by_len[w * h] if is_diagonalish(seg, w)]
        tables[(w, h)] = cands
        print(f"{w}x{h}: {len(cands)} diagonal candidates")
    if out_path:
        np.savez(out_path, **{
            f"scan_{w}x{h}_{i}": np.stack([seg // w, seg % w], axis=1)
            for (w, h), cands in tables.items()
            for i, seg in enumerate(cands)})
        print(f"wrote {out_path}")
    return tables


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
