"""System + accelerator metrics readers (ref: internal/tui/gpu.go, update.go).

CPU and memory come from /proc (the gopsutil analog); the accelerator
panel is the TPU-native analog of gpu.go's multi-fallback Intel GPU
reader: (a) JAX device memory stats (HBM occupancy), (b) device
enumeration only, (c) unavailable.  Readers never raise — the dashboard
degrades to zeros like the reference's GPU fallbacks (gpu.go:16-51).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional


@dataclasses.dataclass
class SystemMetrics:
    cpu_percent: float = 0.0
    mem_percent: float = 0.0
    mem_used_gb: float = 0.0
    mem_total_gb: float = 0.0
    tpu_percent: float = 0.0        # HBM occupancy %
    tpu_kind: str = ""
    tpu_count: int = 0
    tpu_hbm_used_gb: float = 0.0
    tpu_hbm_total_gb: float = 0.0


_last_cpu: Optional[tuple[float, float]] = None  # (busy, total)


def read_cpu_percent() -> float:
    """CPU busy% from /proc/stat deltas (cpu.Percent analog)."""
    global _last_cpu
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [float(x) for x in parts[1:9]]
        idle = vals[3] + vals[4]           # idle + iowait
        total = sum(vals)
        busy = total - idle
        if _last_cpu is None:
            _last_cpu = (busy, total)
            return 0.0
        db = busy - _last_cpu[0]
        dt = total - _last_cpu[1]
        _last_cpu = (busy, total)
        return 100.0 * db / dt if dt > 0 else 0.0
    except (OSError, ValueError, IndexError):
        return 0.0


def read_mem() -> tuple[float, float, float]:
    """(percent, used_gb, total_gb) from /proc/meminfo."""
    try:
        info = {}
        with open("/proc/meminfo") as f:
            for line in f:
                k, _, rest = line.partition(":")
                info[k] = float(rest.split()[0])  # kB
        total = info.get("MemTotal", 0.0)
        avail = info.get("MemAvailable", total)
        used = total - avail
        pct = 100.0 * used / total if total else 0.0
        return pct, used / (1024 ** 2), total / (1024 ** 2)
    except (OSError, ValueError, IndexError):
        return 0.0, 0.0, 0.0


def read_tpu() -> tuple[float, str, int, float, float]:
    """(hbm_pct, kind, count, used_gb, total_gb); zeros when no TPU.

    Fallback ladder (gpu.go analog): memory_stats → enumeration → none.
    """
    try:
        import jax
        devices = jax.devices()
        if not devices:
            return 0.0, "", 0, 0.0, 0.0
        kind = getattr(devices[0], "device_kind", "") or ""
        count = len(devices)
        try:
            stats = devices[0].memory_stats() or {}
            used = float(stats.get("bytes_in_use", 0))
            total = float(stats.get("bytes_limit", 0)
                          or stats.get("bytes_reservable_limit", 0))
            if total > 0:
                return (100.0 * used / total, kind, count,
                        used / (1024 ** 3), total / (1024 ** 3))
        except Exception:
            pass
        return 0.0, kind, count, 0.0, 0.0
    except Exception:
        return 0.0, "", 0, 0.0, 0.0


def collect(with_tpu: bool = True) -> SystemMetrics:
    m = SystemMetrics()
    m.cpu_percent = read_cpu_percent()
    m.mem_percent, m.mem_used_gb, m.mem_total_gb = read_mem()
    if with_tpu:
        (m.tpu_percent, m.tpu_kind, m.tpu_count,
         m.tpu_hbm_used_gb, m.tpu_hbm_total_gb) = read_tpu()
    return m
