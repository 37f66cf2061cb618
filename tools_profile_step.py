"""Train-step hot-spot profiler: where do the stage-1 step's 96 ms go?

The step is conv-bound (STATUS.md): the four dilated fc6 heads
(3x3x512x1024 at dilation 6/12/18/24 on the 41^2 map,
``train-s.prototxt:395-730``) carry ~40% of total FLOPs, so they are the
one place XLA's dilated-conv lowering could leave MXU headroom.  This tool
times, via in-jit rep loops (the only honest method through the ~40 ms
dispatch-latency tunnel — ``bench.py::_device_ms``):

  1. the full model forward (bf16, batch 20 @ 321^2),
  2. the 4-head fc6 stack as ``lax.conv_general_dilated`` (what flax emits),
  3. the same math as 9 static pad/slice shifts + per-tap matmuls
     (``heads_fc6_shift``) — the "dilated conv is just 9 shifted GEMMs"
     reformulation,
  4. variant 3 with the 4 heads batched into one einsum per tap,

fwd and fwd+bwd, and checks 2 == 3 == 4 numerically first.  If a variant
wins by more than tunnel noise, the model adopts it; either way the numbers
get recorded in STATUS.md.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

DILATIONS = (6, 12, 18, 24)


def heads_fc6_conv(x, ws):
    """Reference formulation: one dilated conv per head.

    x: (B, H, W, C); ws: (4, 3, 3, C, O).  Returns (4, B, H, W, O).
    """
    import jax

    outs = []
    for k, d in enumerate(DILATIONS):
        outs.append(
            jax.lax.conv_general_dilated(
                x, ws[k], (1, 1), [(d, d), (d, d)], rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        )
    import jax.numpy as jnp

    return jnp.stack(outs)


def _tap_slices(x, d):
    """The 9 zero-padded shifts of ``x`` at offsets {-d, 0, +d}^2."""
    import jax.numpy as jnp

    h, w = x.shape[1], x.shape[2]
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    return [
        xp[:, ky * d : ky * d + h, kx * d : kx * d + w, :]
        for ky in range(3)
        for kx in range(3)
    ]


def heads_fc6_shift(x, ws):
    """Same math as 9 static shifts + per-tap (BHW, C) @ (C, O) matmuls."""
    import jax.numpy as jnp

    outs = []
    for k, d in enumerate(DILATIONS):
        acc = None
        for t, xs in enumerate(_tap_slices(x, d)):
            y = jnp.einsum("bhwc,co->bhwo", xs, ws[k, t // 3, t % 3])
            acc = y if acc is None else acc + y
        outs.append(acc)
    return jnp.stack(outs)


def _tap_bands(size, d):
    """Split an output axis of length ``size`` into contiguous bands whose
    set of VALID taps {-d, 0, +d} is constant inside the band.

    A 3-tap dilated conv at dilation d on a map of extent `size` has its
    off-center taps land in zero padding for d (resp. size-d) of the
    positions — at d=24 on the 41-map that is 63% of all window FLOPs
    multiplying zeros.  Returns [(start, stop, (dy...)), ...]."""
    cuts = sorted({0, min(d, size), min(size - d, size) if size > d else 0, size})
    cuts = [c for c in cuts if 0 <= c <= size]
    bands = []
    for a, b in zip(cuts[:-1], cuts[1:]):
        if a >= b:
            continue
        taps = tuple(t for t in (-1, 0, 1)
                     if a + t * d >= 0 and (b - 1) + t * d <= size - 1)
        bands.append((a, b, taps))
    return bands


def heads_fc6_region(x, ws):
    """Padding-free formulation: per head, split the output map into <=3x3
    bands with a fixed valid-tap set; each band is ONE GEMM whose contracting
    dim concatenates the valid taps' input slices (and weight taps).  No
    zero-padding is read or multiplied anywhere — the real FLOP count drops
    to 81%/64%/50%/37% of the 9-tap conv for d=6/12/18/24 on the 41-map."""
    import jax.numpy as jnp

    B, H, W, C = x.shape
    outs = []
    for k, d in enumerate(DILATIONS):
        w = ws[k]
        rows = []
        for (y0, y1, ty) in _tap_bands(H, d):
            cols = []
            for (x0, x1, tx) in _tap_bands(W, d):
                slabs = [
                    x[:, y0 + dy * d : y1 + dy * d,
                      x0 + dx * d : x1 + dx * d, :]
                    for dy in ty for dx in tx
                ]
                kk = jnp.concatenate(slabs, axis=-1)
                wt = jnp.concatenate(
                    [w[dy + 1, dx + 1] for dy in ty for dx in tx], axis=0
                )
                cols.append(jnp.einsum("bhwc,co->bhwo", kk, wt))
            rows.append(jnp.concatenate(cols, axis=2))
        outs.append(jnp.concatenate(rows, axis=1))
    return jnp.stack(outs)


def heads_fc6_shift_batched(x, ws):
    """Variant: per tap, batch the 4 heads into one einsum (the operands
    still differ per head — each head shifts by its own dilation — so this
    only changes how XLA sees the GEMM batching)."""
    import jax.numpy as jnp

    taps = [_tap_slices(x, d) for d in DILATIONS]  # [head][tap]
    acc = None
    for t in range(9):
        xs = jnp.stack([taps[k][t] for k in range(4)])  # (4, B, H, W, C)
        y = jnp.einsum("kbhwc,kco->kbhwo", xs, ws[:, t // 3, t % 3])
        acc = y if acc is None else acc + y
    return acc


def check_equivalence():
    """fp32 numerical agreement of the three formulations (tiny shapes)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 51, 51, 8)).astype(np.float32))
    ws = jnp.asarray(rng.normal(size=(4, 3, 3, 8, 16)).astype(np.float32))
    import jax

    # jit each formulation: eagerly, the region variant is hundreds of tiny
    # ops — at the tunnel's ~40 ms dispatch floor that is minutes of wall.
    a = np.asarray(jax.jit(heads_fc6_conv)(x, ws))
    b = np.asarray(jax.jit(heads_fc6_shift)(x, ws))
    c = np.asarray(jax.jit(heads_fc6_shift_batched)(x, ws))
    r = np.asarray(jax.jit(heads_fc6_region)(x, ws))
    err_b = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    err_c = np.abs(a - c).max() / (np.abs(a).max() + 1e-9)
    err_r = np.abs(a - r).max() / (np.abs(a).max() + 1e-9)
    assert err_b < 1e-5 and err_c < 1e-5 and err_r < 1e-5, (err_b, err_c, err_r)
    return float(err_b), float(err_c)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/profile_step.jsonl",
                    help="incremental JSONL results (survives a killed run)")
    ap.add_argument("--phases", nargs="+", default=[
        "conv_fwd", "shift_fwd", "shift_batched_fwd", "gemm36", "model_fwd",
        "conv_fwdbwd", "shift_fwdbwd", "shift_batched_fwdbwd",
    ], help="measurements to run, cheap/safe first; also available: "
            "model_fwdbwd, model_fwdbwd_train, pools_fwdbwd (where the "
            "non-head step time goes)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import _device_ms, _enable_compile_cache

    _enable_compile_cache()
    out = open(args.out, "a")

    def emit(name, ms):
        rec = {name: round(ms, 2)}
        out.write(json.dumps(rec) + "\n")
        out.flush()
        print(json.dumps(rec), flush=True)

    eb, ec = check_equivalence()
    print(f"equivalence ok: shift {eb:.2e}, batched {ec:.2e}", flush=True)

    def _device_ms_args(make_body, args, reps=10, outer=3):
        """Like bench._device_ms, but ``args`` enter as jit ARGUMENTS.

        Closure-captured arrays become HLO constants; past a few hundred MB
        the tunnel's remote-compile endpoint rejects the program (HTTP 413),
        and constants also dodge donation.  Passing them as arguments keeps
        the program small."""

        def loop(*a):
            def body(_, acc):
                return make_body(acc, *a)

            return jax.lax.fori_loop(0, reps, body, 0.0)

        f = jax.jit(loop)
        float(f(*args))
        times = []
        for _ in range(outer):
            t0 = time.perf_counter()
            float(f(*args))
            times.append(time.perf_counter() - t0)
        return min(times) / reps * 1000.0

    B, S, C, O = 20, 41, 512, 1024
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, S, C)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    ws = jnp.asarray(
        (rng.normal(size=(4, 3, 3, C, O)) * 0.01).astype(np.float32)
    ).astype(jnp.bfloat16)
    fns = {
        "conv": heads_fc6_conv,
        "shift": heads_fc6_shift,
        "shift_batched": heads_fc6_shift_batched,
        "region": heads_fc6_region,
    }

    def fwd_ms(fn, reps=30):
        return _device_ms(
            lambda acc: fn(x + acc.astype(x.dtype) * 1e-30, ws)
            .astype(jnp.float32)
            .mean(),
            reps=reps,
        )

    def fwdbwd_ms(fn, reps=15):
        # loss = mean(y^2), NOT mean(y): a mean's cotangent is a constant,
        # which lets XLA algebraically collapse both backward convs (grad_x
        # of conv with a constant cotangent is a precomputed weight sum;
        # grad_w likewise reduces to activation sums) — the measured
        # "fwd+bwd" then costs the same as fwd alone.  Squaring makes the
        # cotangent 2y, data-dependent, so the backward convs are real.
        g = jax.grad(
            lambda xx, ww: jnp.square(fn(xx, ww).astype(jnp.float32)).mean(),
            argnums=(0, 1),
        )

        def body(acc):
            gx, gw = g(x + acc.astype(x.dtype) * 1e-30, ws)
            return gx.astype(jnp.float32).mean() + gw.astype(jnp.float32).mean()

        return _device_ms(body, reps=reps)

    for phase in args.phases:
        if phase == "conv_fwdbwd_args":
            # methodology calibration: the same measurement as conv_fwdbwd
            # but with operands as jit arguments instead of closure constants
            g = jax.grad(
                lambda xx, ww: jnp.square(
                    heads_fc6_conv(xx, ww).astype(jnp.float32)
                ).mean(),
                argnums=(0, 1),
            )

            def body(acc, xx, ww):
                gx, gw = g(xx + acc.astype(xx.dtype) * 1e-30, ww)
                return gx.astype(jnp.float32).mean() + gw.astype(jnp.float32).mean()

            emit(phase, _device_ms_args(body, (x, ws), reps=15))
        elif phase.endswith("_fwdbwd") and phase[: -len("_fwdbwd")] in fns:
            emit(phase, fwdbwd_ms(fns[phase[: -len("_fwdbwd")]]))
        elif phase in ("conv_fwd", "shift_fwd", "shift_batched_fwd",
                       "region_fwd"):
            emit(phase, fwd_ms(fns[phase[: -len("_fwd")]]))
        elif phase == "model_fwd":
            from dsrg_tpu.models import DeepLabLargeFOV

            model = DeepLabLargeFOV(num_classes=21, compute_dtype=jnp.bfloat16)
            xi = jnp.asarray(
                rng.normal(size=(B, 321, 321, 3)).astype(np.float32) * 40
            )
            variables = model.init(
                {"params": jax.random.PRNGKey(0)}, xi[:1], train=False
            )
            emit(phase, _device_ms(
                lambda acc: model.apply(
                    variables, xi + acc.astype(xi.dtype) * 1e-30, train=False
                ).astype(jnp.float32).mean(),
                reps=20,
            ))
        elif phase in ("model_fwdbwd", "model_fwdbwd_train"):
            # full-model fwd + grad-to-params (the train step minus CRF/grow/
            # losses/update); _train adds the 8 dropout masks' RNG cost
            from dsrg_tpu.models import DeepLabLargeFOV

            model = DeepLabLargeFOV(num_classes=21, compute_dtype=jnp.bfloat16)
            xi = jnp.asarray(
                rng.normal(size=(B, 321, 321, 3)).astype(np.float32) * 40
            )
            variables = model.init(
                {"params": jax.random.PRNGKey(0)}, xi[:1], train=False
            )
            train = phase.endswith("_train")
            rngs = {"dropout": jax.random.PRNGKey(1)} if train else None

            def loss(params, xx):
                y = model.apply(
                    {"params": params}, xx, train=train, rngs=rngs
                ).astype(jnp.float32)
                return jnp.square(y).mean()

            g = jax.grad(loss)

            def body(acc, params, xx):
                gp = g(params, xx + acc * 1e-30)
                leaves = jax.tree_util.tree_leaves(gp)
                return sum(l.astype(jnp.float32).mean() for l in leaves)

            emit(phase, _device_ms_args(body, (variables["params"], xi), reps=10))
        elif phase in ("pools_fwdbwd", "pools_fwdbwd_sas"):
            # the 5 Caffe max pools' fwd+bwd alone, shapes as they occur in
            # the batch-20 @ 321^2 step.  _sas forces the single 2-D
            # reduce_window whose VJP is one 9-element SelectAndScatter per
            # window (14.5 ms measured); the plain phase measures the shipped
            # separable two-pass pooling (two 3-element 1-D SAS).  A dense
            # pad/shift routing backward was also tried and measured 114.9 ms
            # — 8x WORSE than SAS — and was dropped.
            from dsrg_tpu.ops.pooling import _max_pool_2d, caffe_max_pool

            if phase.endswith("_sas"):
                caffe_max_pool = _max_pool_2d

            shapes = [  # (H, C, stride) per pool1..pool5
                (321, 64, 2), (161, 128, 2), (81, 256, 2),
                (41, 512, 1), (41, 512, 1),
            ]
            xs = [
                jnp.asarray(rng.normal(size=(B, s, s, c)).astype(np.float32)).astype(jnp.bfloat16)
                for s, c, _ in shapes
            ]

            def loss(inputs):
                tot = 0.0
                for xi_, (_, _, st) in zip(inputs, shapes):
                    y = caffe_max_pool(xi_, 3, st, 1).astype(jnp.float32)
                    tot = tot + jnp.square(y).mean()
                return tot

            g = jax.grad(loss)

            def body(acc, inputs):
                gs = g([xi_ + acc.astype(xi_.dtype) * 1e-30 for xi_ in inputs])
                return sum(gg.astype(jnp.float32).mean() for gg in gs)

            emit(phase, _device_ms_args(body, (xs,), reps=10))
        elif phase == "gemm36":
            # equivalent-FLOP plain GEMM chain: the MXU floor for the fc6
            # math (M = B*41^2 = 33620, K = 512, N = 1024) x 36
            a = jnp.asarray(
                rng.normal(size=(B * S * S, C)).astype(np.float32)
            ).astype(jnp.bfloat16)
            bm = jnp.asarray(
                rng.normal(size=(C, O)).astype(np.float32)
            ).astype(jnp.bfloat16)

            def gemm_chain(acc):
                outv = None
                aa = a + acc.astype(a.dtype) * 1e-30
                for _ in range(36):
                    y = aa @ bm
                    outv = y if outv is None else outv + y
                return outv.astype(jnp.float32).mean()

            emit(phase, _device_ms(gemm_chain, reps=20))
        else:
            raise SystemExit(
                f"unknown phase {phase!r} (known bases for *_fwdbwd: {sorted(fns)})"
            )


if __name__ == "__main__":
    main()
