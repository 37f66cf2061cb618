"""Host-RSS watchdog: bound leaky long runs by snapshot-and-restart.

Some remote-accelerator client stacks leak host memory proportionally to
the bytes transferred (measured here: ~6 MB of anon RSS retained per 6.2 MB
``device_put`` through the TPU tunnel, invisible to tracemalloc — a native
leak in the transfer client, outside this package's control).  Over a
production-length recipe (8k + 20k iterations, ~23 MB/s of shipped batches)
that grows to >100 GB and ends in an OOM kill, losing everything since the
last snapshot.

The framework's resume machinery makes planned restarts LOSSLESS — full
train-state snapshots plus a deterministic data order (sample k is a pure
function of ``(seed, k)``, ``data/voc.py:_EpochOrder``) reproduce the
uninterrupted run exactly, and the dump tools resume via ``--skip-existing``
— so the mitigation is operational: every phase CLI checks its own RSS at
safe boundaries and, past the limit, persists progress and exits with
:data:`RESTART_EXIT_CODE`; the recipe driver (``tools/run_recipe.py``)
relaunches it until the phase completes.  The reference has no equivalent
(its Caffe trainer simply dies on host OOM and ``run.sh`` stops).
"""

from __future__ import annotations

import os

# EX_TEMPFAIL: "try again" — distinguishes a planned memory-bound restart
# from real failures so supervisors only relaunch what is safe to relaunch.
RESTART_EXIT_CODE = 75


def rss_gb() -> float:
    """Current resident set size in GB (0.0 where /proc is unavailable)."""
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        return pages * os.sysconf("SC_PAGE_SIZE") / 1e9
    except (OSError, IndexError, ValueError):
        return 0.0


def total_gb() -> float:
    """MemTotal in GB (0.0 where /proc is unavailable)."""
    try:
        with open("/proc/meminfo") as f:
            for ln in f:
                if ln.startswith("MemTotal:"):
                    return int(ln.split()[1]) * 1024 / 1e9
    except (OSError, IndexError, ValueError):
        pass
    return 0.0


def resolve_limit(flag_gb: float) -> float:
    """CLI flag -> effective limit: 0 = off, <0 = auto (80% of MemTotal —
    leaves headroom for the page cache and the decode workers), >0 = GB."""
    if flag_gb == 0:
        return 0.0
    if flag_gb < 0:
        total = total_gb()
        return 0.8 * total if total else 0.0
    return float(flag_gb)


def over_limit(limit_gb: float) -> bool:
    """True when the limit is active and current RSS exceeds it."""
    return bool(limit_gb) and rss_gb() > limit_gb
