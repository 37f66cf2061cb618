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

# The plugin's generated *_pb2 modules predate protobuf 4's upb fast path;
# force the pure-python implementation BEFORE google.protobuf is imported
# anywhere in this process or the converter import hard-fails.
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


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


def xspace_op_table(xplane_path: str, steps: int):
    """Parse the XSpace proto directly (the tensorboard profile plugin's
    converters are version-broken against this TF build): aggregate the
    device plane's "XLA Ops" line per op metadata, pulling the jax scope
    (``tf_op``), ``hlo_category``, ``flops`` and ``bytes_accessed`` from the
    per-op metadata stats.  Returns (ops, async_ms_per_step, device_name)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        xs.ParseFromString(f.read())
    dev = None
    for p in xs.planes:
        if p.name.startswith("/device:") and any(
                l.name == "XLA Ops" and l.events for l in p.lines):
            dev = p
            break
    if dev is None:
        raise SystemExit("no device plane with an 'XLA Ops' line in the trace")
    em, sm = dev.event_metadata, dev.stat_metadata

    def md_stats(md):
        out = {}
        for st in md.stats:
            name = sm[st.metadata_id].name
            if st.str_value:
                out[name] = st.str_value
            elif st.ref_value:
                out[name] = sm[st.ref_value].name
            else:
                out[name] = st.int64_value or st.uint64_value or st.double_value
        return out

    agg = {}
    for l in dev.lines:
        if l.name not in ("XLA Ops", "Async XLA Ops"):
            continue
        for ev in l.events:
            key = (l.name, ev.metadata_id)
            a = agg.get(key)
            if a is None:
                md = em[ev.metadata_id]
                s = md_stats(md)
                agg[key] = a = {
                    "line": l.name,
                    "op": md.display_name or md.name.split(" = ")[0],
                    "expr": md.name[:200],
                    "category": s.get("hlo_category", ""),
                    "scope": s.get("tf_op", ""),
                    "source": s.get("source", ""),
                    "flops": int(s.get("flops", 0) or 0),
                    "bytes_accessed": int(s.get("bytes_accessed", 0) or 0),
                    "occurrences": 0,
                    "self_us": 0.0,
                }
            a["occurrences"] += 1
            a["self_us"] += ev.duration_ps / 1e6
    ops = [a for a in agg.values() if a["line"] == "XLA Ops"]
    async_us = sum(a["self_us"] for a in agg.values()
                   if a["line"] == "Async XLA Ops")
    peaks = {}
    for st in dev.stats:
        name = sm[st.metadata_id].name
        if name in ("device_type_string", "peak_teraflops_per_second",
                    "peak_hbm_bw_gigabytes_per_second"):
            peaks[name] = st.str_value or st.double_value
    return ops, async_us / 1000.0 / steps, dev.name, peaks


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--batch-size", type=int, default=20)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--out", default="artifacts/step_profile_r05.json")
    ap.add_argument("--keep-trace", default=None,
                    help="keep the raw trace under this dir (default: tmp, deleted)")
    ap.add_argument("--parse", default=None, metavar="XPLANE_PB",
                    help="skip capture; parse this existing .xplane.pb "
                         "(pass --wall-ms for the step wall time to record)")
    ap.add_argument("--wall-ms", type=float, default=None)
    args = ap.parse_args(argv)

    if args.parse:
        xplane, step_ms = args.parse, (args.wall_ms or float("nan"))
    else:
        trace_dir = args.keep_trace or tempfile.mkdtemp(prefix="dsrg_trace_")
        xplane, step_ms = capture_xspace(trace_dir, args.steps, args.batch_size)
    print(f"captured {xplane} ({os.path.getsize(xplane)/1e6:.1f} MB); "
          f"step {step_ms:.1f} ms", flush=True)

    ops, async_ms, dev_name, peaks = xspace_op_table(xplane, args.steps)

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
    cat_split = {}
    for o in ops:
        k = classify(o)
        split[k] = split.get(k, 0.0) + o["self_us"]
        ck = (k, o["category"] or "?")
        cat_split[ck] = cat_split.get(ck, 0.0) + o["self_us"]

    ops.sort(key=lambda o: -o["self_us"])
    top = ops[: args.top]
    out = {
        "step_ms_wall": round(step_ms, 2),
        "steps_traced": args.steps,
        "device": dev_name,
        "device_peaks": peaks,
        "device_total_ms_per_step": round(total_us / 1000.0 / args.steps, 2),
        "async_dma_ms_per_step_overlapped": round(async_ms, 2),
        "split_ms_per_step": {
            k: round(v / 1000.0 / args.steps, 2) for k, v in sorted(split.items())
        },
        "split_by_class_and_category_ms": {
            f"{k}/{c}": round(v / 1000.0 / args.steps, 3)
            for (k, c), v in sorted(cat_split.items(), key=lambda kv: -kv[1])
        },
        "top_ops": [
            {**{k: o[k] for k in ("category", "op", "scope", "expr",
                                  "occurrences", "flops", "bytes_accessed",
                                  "source")},
             "ms_per_step": round(o["self_us"] / 1000.0 / args.steps, 3),
             "tflops_per_s": round(
                 o["flops"] * o["occurrences"] / o["self_us"] / 1e6, 1)
             if o["self_us"] else 0.0,
             "gb_per_s": round(
                 o["bytes_accessed"] * o["occurrences"] / o["self_us"] / 1e3, 1)
             if o["self_us"] else 0.0,
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
