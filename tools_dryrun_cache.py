"""Capture + commit the multi-chip dryrun's compile-cache entries (VERDICT r4
item 6).

``dryrun_multichip(8)`` at the production geometry costs 8-35 min of XLA:CPU
compile on a 1-core host and stays inside the driver's timeout only when the
persistent cache already holds its exact programs.  This tool makes that
margin robust:

  capture:  run the dryrun child against a FRESH cache dir (measures the
            honest cold-cache wall), then copy every entry it created into
            ``recipes/dryrun_cache/`` (git-tracked).
  seed:     (done automatically by ``__graft_entry__._seed_dryrun_cache`` at
            every dryrun) copy any missing tracked entries into the live
            cache dir before compiling.

Refresh whenever jax/XLA versions change or the dryrun's program shapes move:
    python tools_dryrun_cache.py capture

The tracked entries are keyed by jax's own cache hash (backend + version +
compile options are part of the key), so a stale seed is never *wrong* —
only unused.  (Key portability across cache-dir paths requires the
GPU-autotune-path fix in ``dsrg_tpu.utils.cache.enable_compile_cache`` —
without it every entry is keyed to the dir it was compiled in.)

Caveat: XLA:CPU cache entries are AOT machine code for the capture host's
ISA.  Loading them on a host with a different CPU prints a
machine-feature-mismatch warning (benign for tuning pseudo-features like
``prefer-no-gather``; observed harmless on this host) but could in
principle SIGILL on a genuinely older ISA — re-run ``capture`` after any
host change.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
TRACKED = os.path.join(REPO, "recipes", "dryrun_cache")


def capture(n_devices: int = 8) -> None:
    fresh = tempfile.mkdtemp(prefix="dsrg_dryrun_cache_")
    # NO_SEED keeps a RE-capture honest: without it the child would seed the
    # fresh dir from the previously tracked entries (warm wall, stale recycle)
    env = dict(os.environ, DSRG_TPU_CACHE_DIR=fresh, DSRG_TPU_DRYRUN_NO_SEED="1")
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); "
         "from __graft_entry__ import dryrun_multichip; "
         "dryrun_multichip(%d)" % (REPO, n_devices)],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )
    wall = time.perf_counter() - t0
    sys.stdout.write(proc.stdout)
    if proc.returncode != 0:
        raise SystemExit(f"cold dryrun failed rc={proc.returncode}")

    os.makedirs(TRACKED, exist_ok=True)
    copied, total = [], 0
    for name in sorted(os.listdir(fresh)):
        src = os.path.join(fresh, name)
        if not os.path.isfile(src):
            continue
        shutil.copy2(src, os.path.join(TRACKED, name))
        copied.append(name)
        total += os.path.getsize(src)
    meta = {
        "cold_wall_s": round(wall, 1),
        "n_devices": n_devices,
        "entries": len(copied),
        "total_mb": round(total / 1e6, 1),
        "note": ("entries created by a cold production-geometry "
                 "dryrun_multichip(8) on this host; seeded into the live "
                 "cache dir by __graft_entry__ before every dryrun"),
    }
    with open(os.path.join(TRACKED, "META.json"), "w") as f:
        json.dump(meta, f, indent=2)
        f.write("\n")
    shutil.rmtree(fresh, ignore_errors=True)
    print(json.dumps(meta))


def seed(cache_dir: str) -> int:
    """Copy tracked entries missing from ``cache_dir``; returns count copied."""
    if not os.path.isdir(TRACKED):
        return 0
    os.makedirs(cache_dir, exist_ok=True)
    n = 0
    for name in os.listdir(TRACKED):
        if name == "META.json":
            continue
        dst = os.path.join(cache_dir, name)
        if not os.path.exists(dst):
            shutil.copy2(os.path.join(TRACKED, name), dst)
            n += 1
    return n


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "capture"
    if cmd == "capture":
        capture()
    elif cmd == "seed":
        from dsrg_tpu.utils.cache import enable_compile_cache

        target = enable_compile_cache()
        print("seeded", seed(target) if target else 0, "entries ->", target)
    else:
        raise SystemExit(f"unknown command {cmd!r} (capture|seed)")
