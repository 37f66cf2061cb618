"""Per-op profile of the compiled stage-1 train step (VERDICT r4 item 1).

Captures a ``jax.profiler.trace`` of the EXACT bench step (batch 20 @ 321^2,
bf16, crf_fast — ``bench.bench_tpu_step``'s config) on the real device,
parses the XSpace with tensorboard_plugin_profile's converters, and writes
``artifacts/step_profile_r05.json``:

  - total device time per step,
  - fwd / bwd / other split (jax marks backward ops with ``transpose(``
    in the XLA metadata op_name scope: grad-of-fn ops lower as
    ``transpose(jvp(fn))``),
  - top-N ops by self time with their scope classification.

Fallback: if the tunnel's PJRT client cannot serve device traces, the tool
says so loudly — the in-jit rep-loop decomposition in
``tools_profile_step.py`` (model_fwd / model_fwdbwd_train / pools_fwdbwd /
conv_fwdbwd phases) remains the manual method.

Usage: python tools_profile_bwd.py [--steps 6] [--out artifacts/step_profile_r05.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile


def capture_xspace(trace_dir: str, steps: int, batch_size: int = 20):
    """Run the bench step under jax.profiler.trace; returns (xplane_path, step_ms)."""
    import time

    import jax
    import numpy as np

    sys.path.insert(0, ".")
    from bench import _enable_compile_cache, bench_tpu_step  # noqa: F401

    _enable_compile_cache()
    # rebuild the exact bench step inline so we control the timing window
    import jax.numpy as jnp

    from dsrg_tpu.config import Stage1Config
    from dsrg_tpu.models import DeepLabLargeFOV
    from dsrg_tpu.train.stage1 import init_stage1, make_stage1_step

    cfg = Stage1Config(batch_size=batch_size, crop_size=321,
                       compute_dtype="bfloat16", crf_fast=True)
    model = DeepLabLargeFOV(num_classes=cfg.num_classes, compute_dtype=jnp.bfloat16)
    state, tx, _ = init_stage1(model, cfg)
    step = jax.jit(make_stage1_step(model, cfg, tx), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    labels = np.zeros((batch_size, cfg.num_classes), np.float32)
    labels[:, 0] = 1.0
    for i in range(batch_size):
        labels[i, rng.integers(1, cfg.num_classes, size=2)] = 1.0
    cues = (rng.uniform(size=(batch_size, cfg.cue_size, cfg.cue_size,
                              cfg.num_classes)) < 0.02)
    cues = cues.astype(np.float32) * labels[:, None, None, :]
    batch = {
        "images": jnp.asarray(rng.normal(size=(batch_size, 321, 321, 3)).astype(np.float32) * 40),
        "labels": jnp.asarray(labels),
        "cues": jnp.asarray(cues),
    }

    for _ in range(3):  # compile + warm
        state, metrics = step(state, batch)
    float(metrics["loss"])

    with jax.profiler.trace(trace_dir):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = step(state, batch)
        final = float(metrics["loss"])  # sync inside the trace window
        dt = (time.perf_counter() - t0) / steps
    assert np.isfinite(final)

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise SystemExit(
            "no .xplane.pb captured — the tunnel's PJRT client cannot serve "
            "device traces; use tools_profile_step.py's rep-loop phases instead"
        )
    return max(paths, key=os.path.getsize), dt * 1000.0


def xspace_op_table(xplane_path: str):
    """Parse the XSpace into [(op_name, scope, self_us, occurrences)] via the
    tensorboard profile plugin's hlo-stats converter."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplane_path], "hlo_stats", {}
    )
    if isinstance(data, bytes):
        data = data.decode("utf-8")
    table = json.loads(data)
    return table


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--batch-size", type=int, default=20)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--out", default="artifacts/step_profile_r05.json")
    ap.add_argument("--keep-trace", default=None,
                    help="keep the raw trace under this dir (default: tmp, deleted)")
    args = ap.parse_args(argv)

    trace_dir = args.keep_trace or tempfile.mkdtemp(prefix="dsrg_trace_")
    xplane, step_ms = capture_xspace(trace_dir, args.steps, args.batch_size)
    print(f"captured {xplane} ({os.path.getsize(xplane)/1e6:.1f} MB); "
          f"step {step_ms:.1f} ms", flush=True)

    table = xspace_op_table(xplane)
    # hlo_stats schema: {"cols": [...], "rows": [...]} (gviz DataTable-like)
    cols = [c["label"] if isinstance(c, dict) else c for c in table.get("cols", [])]
    print("columns:", cols, flush=True)

    def col(label_sub):
        for i, c in enumerate(cols):
            if label_sub.lower() in str(c).lower():
                return i
        return None

    i_prog = col("program")  # HLO module name
    i_cat = col("category")
    i_op = col("HLO op name") if col("HLO op name") is not None else col("op name")
    i_expr = col("expression")
    i_occ = col("occurrence")
    i_self = col("total self time (us)") if col("total self time (us)") is not None else col("self time")
    i_frame = col("framework op")  # tf_op_name — carries the jax scope

    rows = []
    for r in table.get("rows", []):
        c = [x.get("v") if isinstance(x, dict) else x for x in r["c"]] if isinstance(r, dict) else r
        rows.append(c)

    ops = []
    for c in rows:
        ops.append({
            "program": c[i_prog] if i_prog is not None else "",
            "category": c[i_cat] if i_cat is not None else "",
            "op": c[i_op] if i_op is not None else "",
            "scope": c[i_frame] if i_frame is not None else "",
            "expr": (c[i_expr] or "")[:160] if i_expr is not None else "",
            "occurrences": c[i_occ] if i_occ is not None else None,
            "self_us": float(c[i_self] or 0.0) if i_self is not None else 0.0,
        })

    # keep only the train-step program (drop any stray compiles in the window)
    progs = {}
    for o in ops:
        progs[o["program"]] = progs.get(o["program"], 0.0) + o["self_us"]
    main_prog = max(progs, key=progs.get) if progs else ""
    ops = [o for o in ops if o["program"] == main_prog]

    def classify(o):
        s = (o["scope"] or "") + " " + (o["op"] or "")
        if "transpose(" in s:
            return "bwd"
        if any(k in s for k in ("caffe_sgd", "apply_updates", "update",
                                "global_norm", "opt_state")):
            return "update"
        return "fwd_or_other"

    total_us = sum(o["self_us"] for o in ops)
    split = {}
    for o in ops:
        k = classify(o)
        split[k] = split.get(k, 0.0) + o["self_us"]

    ops.sort(key=lambda o: -o["self_us"])
    top = ops[: args.top]
    out = {
        "step_ms_wall": round(step_ms, 2),
        "steps_traced": args.steps,
        "program": main_prog,
        "device_total_ms_per_step": round(total_us / 1000.0 / args.steps, 2),
        "split_ms_per_step": {
            k: round(v / 1000.0 / args.steps, 2) for k, v in sorted(split.items())
        },
        "top_ops": [
            {**{k: o[k] for k in ("category", "op", "scope", "expr", "occurrences")},
             "ms_per_step": round(o["self_us"] / 1000.0 / args.steps, 3),
             "class": classify(o)}
            for o in top
        ],
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps({k: out[k] for k in
                      ("step_ms_wall", "device_total_ms_per_step",
                       "split_ms_per_step")}, indent=2))
    for o in out["top_ops"][:15]:
        print(f'{o["ms_per_step"]:8.3f} ms  {o["class"]:12s} {o["category"]:18s} '
              f'{(o["op"] or "")[:40]:40s} {(o["scope"] or "")[:70]}')


if __name__ == "__main__":
    main()
