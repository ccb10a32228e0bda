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
