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


def maybe_restart(limit_gb: float, done: int, total: int,
                  resume_hint: str = "--skip-existing",
                  unit: str = "images") -> None:
    """Exit ``RESTART_EXIT_CODE`` when past the RSS limit and work remains.

    Shared by every dump-style CLI loop (outputs written so far are the
    progress record, so a supervised relaunch with ``resume_hint`` resumes
    losslessly).  Finishing beats restarting: never fires once ``done``
    reaches ``total``.  Never fires at ``done == 0`` either — each launch
    must bank at least some progress, so an RSS limit below the process'
    floor footprint still advances the dump monotonically instead of
    tripping the supervisor's no-progress abort.
    """
    if limit_gb and 0 < done < total and over_limit(limit_gb):
        print(f"rss-watchdog: host RSS {rss_gb():.1f} GB > {limit_gb:.1f} GB "
              f"limit after {done}/{total} {unit} -> exit "
              f"{RESTART_EXIT_CODE} (relaunch with {resume_hint} to "
              "continue)", flush=True)
        raise SystemExit(RESTART_EXIT_CODE)


def arm(args, persist: bool, describe: str):
    """Standard CLI watchdog arming: ``(rss_limit, stall)`` from the shared
    ``--rss-limit-gb`` / ``--stall-limit-min`` flags.

    Both watchdogs only arm when ``persist`` is true (outputs/snapshots are
    written, so a relaunch can resume) — without persistence a restart
    would loop from scratch.
    """
    rss_limit = (resolve_limit(getattr(args, "rss_limit_gb", 0.0))
                 if persist else 0.0)
    stall = StallWatchdog(
        (getattr(args, "stall_limit_min", 0.0) or 0.0) * 60.0
        if persist else 0.0,
        describe=describe,
    )
    return rss_limit, stall


def split_existing(items, path_fn):
    """Partition work items into (done, todo) by output existence.

    The ``--skip-existing`` resume primitive: ``path_fn(item)`` is the
    item's output path.  Logs the split so relaunch logs show resumption.
    """
    done, todo = [], []
    for it in items:
        (done if os.path.exists(path_fn(it)) else todo).append(it)
    print(f"skip-existing: {len(done)} done, {len(todo)} to go", flush=True)
    return done, todo


class StallWatchdog:
    """Force-exit when no progress tick arrives within ``limit_s`` seconds.

    Remote-TPU tunnels can wedge mid-dispatch (observed: a ~10-minute
    mid-training stall around a recompile; a permanent wedge blocks the
    main thread inside the step dispatch forever, where the RSS watchdog
    can never run and the supervising ``run_recipe`` sees a subprocess
    that simply never exits).  This daemon thread watches wall time since
    the last :meth:`tick` and, past the limit, exits the whole process
    with :data:`RESTART_EXIT_CODE` via ``os._exit`` — a snapshot cannot be
    taken from a thread while the device is wedged, so the restart replays
    from the last snapshot (bounded by the snapshot cadence), and the
    supervisor's no-progress guard converts a permanently wedged phase
    into a clean abort after three fruitless relaunches.

    ``limit_s`` must comfortably exceed the longest legitimate gap between
    ticks — first remote compiles take minutes, so the CLIs default to a
    60-minute limit.  ``limit_s=0`` disables (no thread is started).
    """

    def __init__(self, limit_s: float, describe: str = "step", on_stall=None):
        import threading
        import time

        self._limit = float(limit_s)
        self._time = time.monotonic
        self._last = self._time()
        self._describe = describe
        self._on_stall = on_stall or self._exit
        self._stop = threading.Event()
        if self._limit > 0:
            self._thread = threading.Thread(
                target=self._watch, daemon=True, name="stall-watchdog"
            )
            self._thread.start()

    def tick(self) -> None:
        self._last = self._time()

    def close(self) -> None:
        self._stop.set()

    def _watch(self) -> None:
        poll = min(30.0, self._limit / 4)
        while not self._stop.wait(poll):
            idle = self._time() - self._last
            if idle > self._limit:
                self._on_stall(idle)
                return

    def _exit(self, idle: float) -> None:
        print(f"stall-watchdog: no {self._describe} progress for "
              f"{idle / 60:.1f} min -> exit {RESTART_EXIT_CODE} (wedged "
              "device/tunnel; a supervisor relaunch resumes from the last "
              "snapshot)", flush=True)
        os._exit(RESTART_EXIT_CODE)
