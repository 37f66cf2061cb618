"""Pin the bench baseline denominator (VERDICT r4 item 2).

Measures the reference-host baseline costs ONCE on a quiet host and writes
them to ``BASELINE_PINNED.json``.  ``bench.py`` then reports BOTH a
``vs_baseline`` computed against these pinned constants (so the ratio moves
only via the TPU numerator, round over round) and the live re-measured
ratio (``vs_baseline_live``) for honesty about the current host.

Motivation: the headline ratio drifted 14.4x -> 12.5x across rounds with
unchanged code because ``bench_reference_host_step`` re-timed the scalar
permutohedral CRF on a load-sensitive 1-core host every run.

Usage:  python tools_pin_baseline.py [--n-probe 7]
Refresh whenever the host hardware changes; the JSON records the method.
"""

from __future__ import annotations

import argparse
import datetime
import json
import multiprocessing
import platform
import sys
import time

import numpy as np

from bench import _PINNED_PATH


def _min_time(fn, n):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-probe", type=int, default=7,
                    help="repeats per measurement; min is recorded")
    args = ap.parse_args(argv)

    sys.path.insert(0, ".")
    from dsrg_tpu import native
    from tests.oracles.grow_oracle import grow_oracle

    assert native.available() or native.build(), "native engines must build"

    rng = np.random.default_rng(0)
    m = 21

    # --- train-geometry CRF (41x41, the stage-1 step's per-image cost) ---
    h = w = 41
    image = rng.uniform(0, 255, size=(h, w, 3)).astype(np.float32)
    logits = rng.normal(size=(h, w, m)).astype(np.float32)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    crf_t = _min_time(
        lambda: native.crf_permutohedral(image, probs, maxiter=10, scale_factor=12.0),
        args.n_probe,
    )

    # --- python region growing at the same geometry ---
    labels = np.zeros(m, np.float32)
    labels[[0, 3, 7]] = 1.0
    cues = (rng.uniform(size=(m, h, w)) < 0.02).astype(np.float32) * labels[:, None, None]
    pr = probs.transpose(2, 0, 1)
    grow_t = _min_time(lambda: grow_oracle(labels, cues, pr), args.n_probe)

    # --- full-resolution CRF (bench config 1's baseline) ---
    size = 321
    image_fr = rng.integers(0, 256, size=(size, size, 3)).astype(np.float32)
    probs_fr = rng.dirichlet(np.ones(m), size=size * size).astype(np.float32)
    probs_fr = probs_fr.reshape(size, size, m)
    logp_fr = np.log(probs_fr)
    native.crf_permutohedral(image_fr, logp_fr, maxiter=10)  # warm caches
    crf_fullres_t = _min_time(
        lambda: native.crf_permutohedral(image_fr, logp_fr, maxiter=10), 3
    )

    # --- native BFS grower, batch 20 (bench config 2's baseline) ---
    b = 20
    labels_b = np.zeros((b, m), np.float32)
    labels_b[:, 0] = 1
    for i in range(b):
        labels_b[i, rng.integers(1, m, 2)] = 1
    cues_b = (rng.uniform(size=(b, h, h, m)) < 0.02).astype(np.float32) * labels_b[:, None, None, :]
    probs_b = rng.dirichlet(np.ones(m), size=(b, h, h)).astype(np.float32)

    def _grow_native_batch():
        for i in range(b):
            native.region_grow_cpu(labels_b[i], cues_b[i].transpose(2, 0, 1).copy(),
                                   probs_b[i].transpose(2, 0, 1).copy())

    _grow_native_batch()
    grow_native_t = _min_time(_grow_native_batch, 3)

    out = {
        "pinned_utc": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "host": {"machine": platform.machine(),
                 "ncpu": multiprocessing.cpu_count()},
        "n_probe": args.n_probe,
        "crf_ms_per_image_permutohedral_scalar": round(crf_t * 1000, 3),
        "grow_ms_per_image_python": round(grow_t * 1000, 3),
        "crf_fullres_321_ms": round(crf_fullres_t * 1000, 1),
        "grow_native_cpu_batch20_ms": round(grow_native_t * 1000, 2),
        "method": (
            "min over n_probe repeats on a quiet host; crf = scalar "
            "permutohedral C++ (native/permutohedral_cpu.cpp) 41x41x21 / "
            "321x321x21 x10 iters; grow = pure-python oracle per image, "
            "native BFS for batch 20.  bench.py derives the reference host "
            "step as 2*B*crf + B*grow/ncpu (pylayers.py:325-342 structure) "
            "and the sse-adjusted floor with crf/4."
        ),
    }
    with open(_PINNED_PATH, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
