"""Process-tree CPU accounting for benchmark runs.

On a shared host, wall clock lies (external neighbors); CPU-seconds of our
own process tree (driver JVM + python workers) measure the actual work and
let the bench report contention-corrected scaling efficiency.
"""

from __future__ import annotations

import os


def _root_pid() -> int:
    """Topmost java/python ancestor (under spark-submit the JVM is our
    parent, and python workers are its children, not ours)."""
    def comm(pid: int) -> str:
        try:
            with open(f"/proc/{pid}/comm") as f:
                return f.read().strip()
        except OSError:
            return ""

    def ppid(pid: int) -> int:
        try:
            with open(f"/proc/{pid}/stat") as f:
                return int(f.read().rsplit(")", 1)[1].split()[1])
        except (OSError, IndexError, ValueError):
            return 0

    root = os.getpid()
    cur = root
    for _ in range(20):
        parent = ppid(cur)
        if parent <= 1:
            break
        if comm(parent).startswith(("java", "python")):
            root = parent
        cur = parent
    return root


def tree_cpu_seconds() -> float:
    """utime+stime summed over the job's process tree (JVM + workers +
    driver), rooted at the topmost java/python ancestor."""
    clk = os.sysconf("SC_CLK_TCK")
    me = _root_pid()
    info: dict[int, tuple[int, float]] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                rest = f.read().rsplit(")", 1)[1].split()
            info[int(pid)] = (int(rest[1]), (int(rest[11]) + int(rest[12])) / clk)
        except (OSError, IndexError, ValueError):
            continue
    total = 0.0
    for pid, (_ppid, cpu) in info.items():
        cur = pid
        for _ in range(30):
            if cur == me:
                total += cpu
                break
            cur = info.get(cur, (0, 0.0))[0]
            if cur <= 1:
                break
    return total


def load_avg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def steal_fraction_probe() -> tuple[int, float]:
    """(steal_ticks, monotonic_seconds) snapshot for neighbor-pressure
    measurement on the shared sandbox host.

    /proc/loadavg cannot separate our own load from hypervisor neighbors
    mid-run (a 32-thread leg alone drives it to ~32), but steal time counts
    ONLY cycles the hypervisor gave to other guests — the right validity
    instrument for a scaling pair: a leg is trustworthy iff the steal
    fraction across it stayed low."""
    import time

    with open("/proc/stat") as f:
        steal = int(f.readline().split()[8])
    return steal, time.monotonic()


def steal_fraction(before: tuple[int, float]) -> float:
    """Steal fraction of total machine capacity since ``before``
    (0.0 = hypervisor gave us everything, 0.25 = neighbors took a quarter)."""
    import os

    s0, t0 = before
    s1, t1 = steal_fraction_probe()
    ncpu = os.cpu_count() or 1
    hz = os.sysconf("SC_CLK_TCK")
    total = max(1.0, (t1 - t0) * ncpu * hz)
    return (s1 - s0) / total
