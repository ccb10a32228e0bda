"""Host steal-time sampling for measurement windows.

On this shared host, neighbor steal is the dominant timing noise (r5:
960k 8-core legs swung 33% across windows while 2-core legs held ±2%).
/proc/stat exposes steal jiffies (field 8), so every measured leg can
carry its own contention evidence instead of relying on post-hoc
physical-impossibility flags (bench8 < bench32). Interpretation: steal%
is the fraction of ALL host cpu-jiffies stolen during the span — a few
percent host-wide is enough to stretch a leg that needs every core.
"""

from __future__ import annotations


def cpu_sample() -> tuple[int, int]:
    """(total_jiffies, steal_jiffies) from the aggregate /proc/stat line."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts]
    return sum(vals), vals[7] if len(vals) > 7 else 0


def steal_pct(before: tuple[int, int], after: tuple[int, int]) -> float:
    """Percent of host cpu-jiffies stolen between two cpu_sample() calls."""
    dt = after[0] - before[0]
    return round(100.0 * (after[1] - before[1]) / dt, 3) if dt > 0 else 0.0


def bandwidth_probe(mb: int = 256, reps: int = 3) -> float:
    """Best-of-reps single-core DRAM copy bandwidth in GB/s (~2 s total).

    Steal% catches cpu-steal contention but NOT neighbor memory-bandwidth
    pressure (r5 measured a 960k 8-core leg at 202.8 s with only 1.9%
    steal vs 129.3 s in an earlier window — the slowdown never appeared
    in /proc/stat). The flagship composite is bandwidth-bound at 8 cores
    (r4 host controls: 0.675 ceiling), so a degraded copy bandwidth right
    before a leg IS the contention signal steal% misses. Run OUTSIDE the
    timed span."""
    import time

    import numpy as np

    src = np.ones(mb * 1024 * 1024 // 8, dtype=np.float64)
    best = 0.0
    for _ in range(reps):
        t0 = time.monotonic()
        dst = src.copy()
        dt = time.monotonic() - t0
        best = max(best, (2 * src.nbytes / dt) / 1e9)  # read + write
        del dst
    return round(best, 2)
