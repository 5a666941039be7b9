"""Extract the AV1 spec default CDF tables from system codec libraries.

The AV1 specification fixes the initial (default) CDF tables that every
conformant decoder loads on a key frame.  Emitting spec-decodable
bitstreams therefore requires these exact constants.  No source or dev
headers exist in this container — but the system ships two independent
compiled implementations that both embed the tables in .rodata:

    /usr/lib/x86_64-linux-gnu/libaom.so.3   (reference codec, C)
    /usr/lib/x86_64-linux-gnu/libgav1.so.1  (Google decoder, C++)

Both store CDFs in the AOM "inverse CDF" form: for an N-symbol CDF the
array holds N-1 strictly-decreasing u16 probabilities (32768 - cum),
then a 0 terminator, then a 0 adaptation counter.  This tool:

 1. scans both libraries' .rodata for such runs,
 2. locates each spec table by its unique (shape, stride, per-row
    symbol-count) signature in libaom,
 3. cross-validates every extracted row against the gav1 run set
    (two independent builds must agree on spec constants),
 4. writes ``av1tpu/encoder/entropy/av1_default_cdfs.npz``.

The ultimate validation is behavioral: tests/test_spec_entropy.py
round-trips bitstreams through the libaom decoder, which only works if
these tables are exactly right.

Usage:  python -m tools.extract_cdfs [--out PATH]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

import numpy as np

LIBAOM = "/usr/lib/x86_64-linux-gnu/libaom.so.3"
LIBGAV1 = "/usr/lib/x86_64-linux-gnu/libgav1.so.1"


def read_section(path: str, name: str) -> bytes:
    out = subprocess.run(["readelf", "-S", path],
                         capture_output=True, text=True).stdout
    lines = out.splitlines()
    for i, line in enumerate(lines):
        if f" {name} " in line:
            off = int(line.split()[-1], 16)
            size = int(lines[i + 1].split()[0], 16)
            size -= size % 2
            with open(path, "rb") as f:
                f.seek(off)
                return f.read(size)
    raise KeyError(f"{name} not in {path}")


def u16(path: str) -> np.ndarray:
    return np.frombuffer(read_section(path, ".rodata"), dtype="<u2")


def scan_runs(u: np.ndarray) -> list[tuple[int, int]]:
    """All (start, n_values) of decreasing-u16 runs ending in 0, 0."""
    runs = []
    i, N = 0, len(u)
    while i < N - 2:
        if 0 < u[i] < 32768:
            j = i
            while j + 1 < N and 0 < u[j + 1] < u[j]:
                j += 1
            if j + 2 < N and u[j + 1] == 0 and u[j + 2] == 0:
                runs.append((i, j - i + 1))
                i = j + 2
            else:
                i = j + 1
        else:
            i += 1
    return runs


def row_syms(u: np.ndarray, pos: int, stride: int) -> int | None:
    """Parse one CDF row of `stride` u16s at pos.

    Returns the symbol count (n values + terminator), 0 for an all-zero
    row, or None if the row is not a valid zero-padded CDF.
    """
    row = u[pos:pos + stride]
    if len(row) < stride:
        return None
    n = 0
    while n < stride and 0 < row[n] < 32768 and \
            (n == 0 or row[n] < row[n - 1]):
        n += 1
    if n == 0:
        return 0 if not row.any() else None
    # rest of the row must be zero (terminator + counter + padding)
    if row[n:].any() or n + 2 > stride:
        return None
    return n + 1


# ---------------------------------------------------------------------------
# table signatures: (name, row_spec, stride)
# row_spec: list of expected per-row symbol counts (0 = all-zero row).
# Shapes follow the AV1 spec syntax tables (symbol counts per context).
# ---------------------------------------------------------------------------

def rep(n_syms, count):
    return [n_syms] * count


TABLES: list[tuple[str, list[int], int]] = [
    # --- coefficient CDFs, 4 base_qindex quartile contexts in one array ---
    ("txb_skip",        rep(2, 4 * 5 * 13), 3),
    ("eob_extra",       rep(2, 4 * 5 * 2 * 9), 3),
    ("dc_sign",         rep(2, 4 * 2 * 3), 3),
    ("eob_pt_16",       rep(5, 4 * 2 * 2), 6),
    ("eob_pt_32",       rep(6, 4 * 2 * 2), 7),
    ("eob_pt_64",       rep(7, 4 * 2 * 2), 8),
    ("eob_pt_128",      rep(8, 4 * 2 * 2), 9),
    ("eob_pt_256",      rep(9, 4 * 2 * 2), 10),
    ("eob_pt_512",      rep(10, 4 * 2 * 2), 11),
    ("eob_pt_1024",     rep(11, 4 * 2 * 2), 12),
    ("coeff_base_eob",  rep(3, 4 * 5 * 2 * 4), 4),
    ("coeff_base",      rep(4, 4 * 5 * 2 * 42), 5),
    ("coeff_br",        rep(4, 4 * 5 * 2 * 21), 5),
    # --- intra mode CDFs ---
    ("kf_y_mode",       rep(13, 5 * 5), 14),
    ("angle_delta",     rep(7, 8), 8),
    ("if_y_mode",       rep(13, 4), 14),
    ("uv_mode",         rep(13, 13) + rep(14, 13), 15),
    ("cfl_sign",        rep(8, 1), 9),
    ("cfl_alpha",       rep(16, 6), 17),
    ("filter_intra_mode", rep(5, 1), 6),
    ("filter_intra",    rep(2, 22), 3),
    # --- partition / tx ---
    ("partition",       rep(4, 4) + rep(10, 12) + rep(8, 4), 11),
    ("tx_size",         rep(2, 3) + rep(3, 6), 4),
    ("txfm_partition",  rep(2, 21), 3),
    # intra_ext_tx: set0 all-zero, set1 7 syms, set2 5 syms; each set is
    # [4 tx sizes][13 intra modes] rows of stride CDF_SIZE(16)+pad
    ("intra_ext_tx",    rep(0, 52) + rep(7, 52) + rep(5, 52), 17),
    # inter_ext_tx: set0 zero, set1 16 syms [4], set2 12 [4], set3 2 [4]
    ("inter_ext_tx",    rep(0, 4) + rep(16, 4) + rep(12, 4) + rep(2, 4), 17),
    # --- inter mode CDFs ---
    ("skip",            rep(2, 3), 3),
    ("skip_mode",       rep(2, 3), 3),
    ("intra_inter",     rep(2, 4), 3),
    ("comp_inter",      rep(2, 5), 3),
    ("comp_ref_type",   rep(2, 5), 3),
    ("uni_comp_ref",    rep(2, 9), 3),
    ("single_ref",      rep(2, 18), 3),
    ("comp_ref",        rep(2, 9), 3),
    ("comp_bwdref",     rep(2, 6), 3),
    ("newmv",           rep(2, 6), 3),
    ("zeromv",          rep(2, 2), 3),
    ("refmv",           rep(2, 6), 3),
    ("drl",             rep(2, 3), 3),
    ("inter_compound_mode", rep(8, 8), 9),
    ("interintra",      rep(2, 4), 3),
    ("interintra_mode", rep(4, 4), 5),
    ("wedge_interintra", rep(2, 22), 3),
    ("compound_type",   rep(2, 22), 3),
    ("wedge_idx",       rep(16, 22), 17),
    ("motion_mode",     rep(3, 22), 4),
    ("obmc",            rep(2, 22), 3),
    ("comp_group_idx",  rep(2, 7), 3),
    ("compound_idx",    rep(2, 6), 3),
    ("switchable_interp", rep(3, 16), 4),
    # --- mv (nmv_context struct: joints + 2 components) ---
    ("mv_joint",        rep(4, 1), 5),
    # --- misc frame-level ---
    ("delta_q",         rep(4, 1), 5),
    ("delta_lf",        rep(4, 5), 5),
    ("intrabc",         rep(2, 1), 3),
    ("palette_y_size",  rep(7, 7), 8),
    ("palette_uv_size", rep(7, 7), 8),
    ("palette_y_mode",  rep(2, 21), 3),
    ("palette_uv_mode", rep(2, 2), 3),
    ("restore_wiener",  rep(2, 1), 3),
    ("restore_sgrproj", rep(2, 1), 3),
    ("restore_switchable", rep(3, 1), 4),
    ("segment_pred",    rep(2, 3), 3),
    ("spatial_seg",     rep(8, 3), 9),
]

# palette color index: sizes 2..8, 5 contexts each, stride CDF_SIZE(8)=9
PALETTE_COLOR_SPEC = sum(([k] * 5 for k in range(2, 9)), [])
TABLES.append(("palette_y_color", PALETTE_COLOR_SPEC, 9))
TABLES.append(("palette_uv_color", PALETTE_COLOR_SPEC, 9))

# ---------------------------------------------------------------------------
# Resolved table locations: byte offsets into libaom.so.3 .rodata.
#
# Provenance of each pin:
#   * "unique"     — the shape signature matches at exactly one position;
#   * "value"      — first-row values match the spec values confirmed
#                    independently (coeff_base[0][0][0][0] = (4034, 8930,
#                    12727), coeff_br[...] = (14298, 20718, 24174));
#   * "behavioral" — confirmed by round-tripping bitstreams through the
#                    libaom decoder (tests/test_specav1_decode.py).
# Tables absent from this dict are still searched by signature and the
# extractor reports their candidate count for the behavioral solver.
# ---------------------------------------------------------------------------
OFFSETS: dict[str, int] = {
    "coeff_base_eob": 52320,   # unique
    "coeff_base": 53600,       # value
    "coeff_br": 70400,         # value
    "eob_pt_1024": 78816,      # unique ([4][2][2] shape)
    "eob_pt_512": 79200,       # unique
    "eob_pt_256": 79552,       # unique
    "eob_pt_128": 79872,       # unique
    "eob_pt_64": 80160,        # unique (address chain, descending sizes)
    "eob_pt_32": 80416,        # unique
    "eob_pt_16": 80640,        # unique
    "eob_extra": 80832,        # unique
    "txb_skip": 83008,         # unique (260-row block after eob_extra)
    "dc_sign": 84576,          # unique
    "wedge_idx": 86464,        # unique
    "inter_ext_tx": 87232,     # unique
    "intra_ext_tx": 87776,     # unique
    "partition": 93088,        # unique
    "uv_mode": 93536,          # unique
    "kf_y_mode": 94336,        # unique
    "switchable_interp": 97008,  # unique
    "tx_size": 97232,          # unique
    "angle_delta": 95328,      # behavioral: unique window whose 8-block
                               # varied-delta stream round-trips libaom
    "palette_y_size": 95104,   # remaining rows of the same 22-row block
    "palette_uv_size": 95216,  # (y/uv order provisional until palette
                               # is exercised behaviorally)
    # inter-mode cluster (round 2, resolved by cross-binary rodata
    # analysis + dense behavioral replay against libaom; ICF note
    # below): section offsets within the mode-defaults region
    "comp_inter": 95744,       # (5940,8733,20737,22128,29867)
    "single_ref": 95776,       # 18 rows [ctx][tree]
    "newmv": 96080,            # (8733,16138,17429,24382,20546,28092)
    "refmv": 96112,            # (8794,8580,14920,4146,8456,12845)
    "drl": 96144,              # (19664,8208,13823)
}

# NOTE on zeromv: the linker's identical-code-folding (ICF) dedupes the
# zeromv rows against byte-identical rows of other tables, so it has no
# standalone rodata copy in any system binary.  Its values (30593,
# 31714) were pinned behaviorally: a 64-GLOBALMV dense-adaptation
# stream disambiguates the >>6 range-coder quantization window
# [30592..30655] (see av1tpu/encoder/entropy/av1_default_cdfs.npz).
#
# NOTE on the restoration CDFs: the 1-row bool signature matches rodata
# in many accidental places (round-2's signature scan stored garbage —
# restore_wiener == restore_sgrproj == [12851], caught in round 3 when
# LR landed).  restore_wiener was pinned EXACTLY = [21198] behaviorally:
# stage 1 sweeps all 512 >>6 quanta with single-read keyframe streams
# (exactly one quantum decodes bit-exactly in libaom); stage 2/3 sweep
# the 64 in-quantum values with 48-read dense-adaptation streams whose
# ON units code identity Wiener taps (0,0,0), using an offline
# adaptation-trajectory simulation to pick a splitting on/off pattern.
# restore_sgrproj was pinned the same way (identity SGR: xqd = (0,0)).

# Tables in the packed mode-defaults region: rows are the standard
# [value(s), 0-terminator, counter] layout at the usual stride, but the
# LAST row's counter slot is elided (the next table starts there), so
# the shape-signature scanner misses them.  Values were confirmed
# behaviorally (skip: all-skip multi-SB grids round-trip through the
# libaom decoder pixel-exactly; skip_mode matches the spec defaults
# 32621/20708/8127).  Format: name -> (byte_off, [n_syms per row]).
PACKED_OFFSETS: dict[str, tuple[int, list[int]]] = {
    "skip_mode": (97136, [2, 2, 2]),
    "skip": (97152, [2, 2, 2]),
}


def find_table(u, runs, row_spec, stride):
    """All rodata positions where `row_spec` rows at `stride` parse."""
    hits = []
    # candidate starts: run starts (first non-zero row) minus leading
    # zero rows
    lead_zero = 0
    while row_spec[lead_zero] == 0:
        lead_zero += 1
    first_syms = row_spec[lead_zero]
    for pos, n in runs:
        if n + 1 != first_syms:
            continue
        start = pos - lead_zero * stride
        if start < 0:
            continue
        ok = True
        for r, syms in enumerate(row_spec):
            got = row_syms(u, start + r * stride, stride)
            if got != syms:
                ok = False
                break
        if ok:
            hits.append(start)
    return hits


# spec quantizer step lookup tables (dc_qlookup/ac_qlookup), located by
# their monotone shape + documented endpoints (dc8 ends 1336, ac8 1828,
# dc10 5347, ac10 7312, ac12 21387)
QLOOKUP_OFFSETS = {
    "ac_qlookup_10": 302688,
    "ac_qlookup_8": 303200,
    "ac_qlookup_12": 303712,
    "dc_qlookup_10": 304224,
    "dc_qlookup_8": 304736,
}


def extract(verbose=True):
    ua = u16(LIBAOM)
    ug = u16(LIBGAV1)
    runs_a = scan_runs(ua)
    gav_set = set()
    for s, n in scan_runs(ug):
        gav_set.add(tuple(int(x) for x in ug[s:s + n]))

    out: dict[str, np.ndarray] = {}
    report = []
    for name, row_spec, stride in TABLES:
        if name in PACKED_OFFSETS:
            off, syms = PACKED_OFFSETS[name]
            rows = np.zeros((len(syms), stride), np.uint16)
            pos = off // 2
            for k, ns in enumerate(syms):
                vals = ua[pos:pos + ns - 1]
                if not (vals > 0).all() or not (vals < 32768).all():
                    raise AssertionError(f"{name}: bad packed row {k}")
                rows[k, :ns - 1] = vals
                pos += ns + 1
            out[name] = rows
            report.append((name, "packed", 1, 1.0))
            continue
        if name in OFFSETS:
            start = OFFSETS[name] // 2
            rows = ua[start:start + len(row_spec) * stride].reshape(
                len(row_spec), stride)
            agree = total = 0
            for r, syms in enumerate(row_spec):
                got = row_syms(ua, start + r * stride, stride)
                if got != syms:
                    raise AssertionError(
                        f"{name}: pinned offset {OFFSETS[name]} row {r} "
                        f"parses as {got}, expected {syms}")
                if syms < 2:
                    continue
                total += 1
                if tuple(int(x) for x in rows[r][:syms - 1]) in gav_set:
                    agree += 1
            out[name] = rows.astype(np.uint16)
            report.append((name, "pinned", 1, agree / max(total, 1)))
            continue
        hits = find_table(ua, runs_a, row_spec, stride)
        # score candidates by gav1 agreement
        scored = []
        for start in hits:
            rows = ua[start:start + len(row_spec) * stride].reshape(
                len(row_spec), stride)
            agree = total = 0
            for r, syms in enumerate(row_spec):
                if syms < 2:
                    continue
                total += 1
                if tuple(int(x) for x in rows[r][:syms - 1]) in gav_set:
                    agree += 1
            scored.append((agree / max(total, 1), start, rows))
        scored.sort(reverse=True, key=lambda t: t[0])
        if not scored:
            report.append((name, "MISSING", 0, 0.0))
            continue
        best = scored[0]
        dup = sum(1 for s in scored
                  if s[0] == best[0] and not np.array_equal(s[2], best[2]))
        out[name] = best[2].astype(np.uint16)
        report.append((name, "ok" if dup == 0 else f"AMBIG({dup})",
                       len(hits), best[0]))

    for name, off in QLOOKUP_OFFSETS.items():
        seg = ua[off // 2: off // 2 + 256].astype(np.int32)
        if seg[0] != 4 or (np.diff(seg) < 0).any():
            raise AssertionError(f"{name}: implausible at {off}")
        out[name] = seg.astype(np.uint16)
        report.append((name, "pinned", 1, 1.0))

    # --- nmv components (default_nmv_context) -----------------------------
    # libaom lays the struct out contiguously in .rodata:
    #   joints_cdf[CDF_SIZE(4)], then per component (row, col):
    #   classes[CDF_SIZE(11)], class0_fp[2][CDF_SIZE(4)], fp[CDF_SIZE(4)],
    #   sign[CDF_SIZE(2)], class0_hp[CDF_SIZE(2)], hp[CDF_SIZE(2)],
    #   class0[CDF_SIZE(2)], bits[10][CDF_SIZE(2)]
    # (entropymv.h nmv_component field order).  Located by parsing that
    # exact shape chain after every 4-symbol joints candidate and
    # cross-validating rows against gav1.
    comp_layout = [("classes", 11, 12), ("class0_fp", 4, 5),
                   ("class0_fp", 4, 5), ("fp", 4, 5), ("sign", 2, 3),
                   ("class0_hp", 2, 3), ("hp", 2, 3), ("class0", 2, 3)] + \
                  [("bits", 2, 3)] * 10
    nmv_hits = []
    for pos, n in runs_a:
        if n + 1 != 4:  # joints: 4 symbols = 3 coded values
            continue
        p = pos + 5
        ok = True
        rows = {0: {}, 1: {}}
        for comp in (0, 1):
            for fname, syms, stride in comp_layout:
                got = row_syms(ua, p, stride)
                if got != syms:
                    ok = False
                    break
                rows[comp].setdefault(fname, []).append(
                    ua[p:p + stride].astype(np.uint16))
                p += stride
            if not ok:
                break
        if ok:
            joints = ua[pos:pos + 5].astype(np.uint16)
            nmv_hits.append((pos, joints, rows))
    picked = None
    for pos, joints, rows in nmv_hits:
        agree = total = 0
        for comp in (0, 1):
            for fname, rws in rows[comp].items():
                for rw in rws:
                    syms = int(np.argmin(rw > 0)) + 1
                    total += 1
                    if tuple(int(x) for x in rw[:syms - 1]) in gav_set:
                        agree += 1
        if total and agree / total > 0.9:
            picked = (pos, joints, rows, agree / total)
            break
    if picked is None and len(nmv_hits) == 1:
        # gav1 does not store the nmv struct in scannable form; a UNIQUE
        # structural hit whose joints row equals the spec default
        # AOM_CDF4(4096, 11264, 19328) (icdf 28672/21504/13440) is
        # accepted on value evidence; behavioral round-trip through the
        # libaom decoder is the final validation.
        pos, joints, rows = nmv_hits[0]
        if list(joints[:3]) == [28672, 21504, 13440]:
            picked = (pos, joints, rows, -1.0)
    if picked is None:
        report.append(("nmv_components", "MISSING", len(nmv_hits), 0.0))
    else:
        pos, joints, rows, score = picked
        out["mv_joint"] = joints[None, :]
        for comp in (0, 1):
            for fname, rws in rows[comp].items():
                out[f"mv_comp{comp}_{fname}"] = np.stack(rws)
        report.append(("nmv_components", "ok", len(nmv_hits), score))

    # --- subpel interpolation filters --------------------------------------
    # int16[16][8] tables, each row summing to FILTER_BITS' 128, phase 0
    # = {0,0,0,128,0,0,0,0}.  libaom stores regular/smooth/sharp (8-tap)
    # and the 4-tap + bilinear variants contiguously.  Identified by the
    # known regular phase-1 row and cross-checked against gav1.
    ia = np.frombuffer(read_section(LIBAOM, ".rodata"), dtype="<i2")
    cand_tables = []
    i = 0
    zero_phase = np.array([0, 0, 0, 128, 0, 0, 0, 0], np.int16)
    while i < len(ia) - 128:
        if (ia[i:i + 8] == zero_phase).all():
            rows = ia[i:i + 128].reshape(16, 8)
            if (rows.sum(axis=1) == 128).all() and \
                    (np.abs(rows) <= 188).all():
                cand_tables.append((i, rows.copy()))
                i += 128
                continue
        i += 1
    reg = smooth = sharp = None
    for pos, rows in cand_tables:
        r1 = list(rows[1])
        if r1 == [0, 2, -6, 126, 8, -2, 0, 0]:
            reg = rows
        elif r1[2] > 0 and r1.count(0) >= 2 and rows[8][3] == rows[8][4] \
                and (rows >= 0).all():
            smooth = rows
        elif r1[3] == 127 or (np.abs(rows) > 130).any():
            sharp = rows
    if reg is None and cand_tables:
        # fall back: the 8-tap set with the most negative side lobes is
        # sharp; moderate is regular; non-negative is smooth
        raise AssertionError("regular subpel filter signature not found")
    if reg is not None:
        out["subpel_regular"] = reg.astype(np.int16)
        report.append(("subpel_regular", "value", len(cand_tables), 1.0))
    if smooth is not None:
        out["subpel_smooth"] = smooth.astype(np.int16)
        report.append(("subpel_smooth", "value", len(cand_tables), 1.0))
    if sharp is not None:
        out["subpel_sharp"] = sharp.astype(np.int16)
        report.append(("subpel_sharp", "value", len(cand_tables), 1.0))

    # spec intra-prediction constants (located by value signature):
    # smooth-mode weights (u8, sizes 4/8/16/32/64 concatenated) and the
    # sparse directional derivative table Dr_Intra_Derivative (u16[90],
    # index = prediction angle)
    rod = read_section(LIBAOM, ".rodata")
    sm_at = rod.find(bytes([255, 149, 85, 64, 255, 197]))
    if sm_at < 0:
        raise AssertionError("sm_weights not found")
    out["sm_weights"] = np.frombuffer(rod[sm_at:sm_at + 124], np.uint8)
    dr1023 = None
    for c in np.where(ua == 1023)[0]:
        if 547 in ua[c:c + 6]:
            dr1023 = 2 * int(c)
            break
    if dr1023 is None:
        raise AssertionError("dr_intra_derivative not found")
    dr = np.zeros(90, np.uint16)
    dr[3:] = ua[dr1023 // 2: dr1023 // 2 + 87]
    out["dr_intra_derivative"] = dr
    report.append(("sm_weights+dr_deriv", "pinned", 1, 1.0))

    if verbose:
        for name, status, nhits, agree in report:
            flag = "" if status == "ok" and agree > 0.95 else "   <-- CHECK"
            print(f"{name:22s} {status:10s} hits={nhits:3d} "
                  f"gav1-agree={agree:5.1%}{flag}")
    missing = [r[0] for r in report if r[1] == "MISSING"]
    return out, report, missing


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="av1tpu/encoder/entropy/"
                    "av1_default_cdfs.npz")
    args = ap.parse_args(argv)
    out, report, missing = extract()
    path = Path(args.out)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"\nwrote {path} ({len(out)} tables)")
    if missing:
        print("MISSING:", ", ".join(missing))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
