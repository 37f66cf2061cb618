"""Training CLI — mirror of ``training/tools/train.py`` + ``run.sh`` stages.

The reference takes ``--solver/--weights/--snapshot/--gpu``; the solver
prototxt is replaced by ``--stage {s,f}`` selecting the built-in
solver-s/solver-f hyperparameters (overridable via flags).  ``--weights``
warm-starts parameters (``net.copy_from`` semantics); ``--snapshot`` resumes
a full train state (``solver.restore`` semantics).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time

import jax
import numpy as np

from dsrg_tpu.config import Stage1Config, Stage2Config
from dsrg_tpu.data.cues import CueDB
from dsrg_tpu.data.loader import PrefetchLoader
from dsrg_tpu.data.voc import Stage1Dataset, Stage2Dataset
from dsrg_tpu.models import DeepLabLargeFOV
from dsrg_tpu.parallel import data_parallel_step, make_mesh, replicate_to_mesh
from dsrg_tpu.train import checkpoint as ckpt
from dsrg_tpu.train.stage1 import init_stage1, make_stage1_step
from dsrg_tpu.train.stage2 import init_stage2, make_stage2_step


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train a DSRG network")
    p.add_argument("--stage", choices=["s", "f"], required=True,
                   help="s = DSRG seed training, f = retrain on pseudo GT")
    p.add_argument("--weights", default=None, help="params checkpoint to warm-start from")
    p.add_argument("--snapshot", default=None, help="full train-state checkpoint to resume")
    p.add_argument("--snapshot-dir", default="models", help="snapshot output dir")
    p.add_argument("--gpu", dest="gpu_id", default=0, type=int, help="unused (parity flag)")
    # multi-host SPMD (jax.distributed; SURVEY §2.4 "DCN for multi-slice").
    # Launch the SAME command on every host with a distinct --process-id;
    # env-var defaults match jax's own (so TPU pod launchers can omit them).
    p.add_argument("--coordinator", default=os.environ.get("JAX_COORDINATOR_ADDRESS"),
                   help="multi-host: coordinator host:port (process 0's address)")
    p.add_argument("--num-processes", type=int,
                   default=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
                   help="multi-host: total number of processes in the job")
    p.add_argument("--process-id", type=int,
                   default=int(os.environ.get("JAX_PROCESS_ID", "0")),
                   help="multi-host: this process's index")
    # data
    p.add_argument("--image-dir", help="stage s: JPEGImages dir")
    p.add_argument("--input-list", help="stage s: input_list.txt (file id pairs)")
    p.add_argument("--cues", help="stage s: localization cue pickle")
    p.add_argument("--root", help="stage f / coco: dataset root")
    p.add_argument("--pair-list", help="stage f / coco: (image, label) pair list")
    p.add_argument("--dataset", choices=["voc", "coco"], default="voc",
                   help="stage s data source: VOC cue pickle or COCO dense cues")
    p.add_argument("--model", dest="model_name", choices=["vgg16", "resnet101"],
                   default="vgg16", help="backbone family")
    # solver overrides
    p.add_argument("--max-iter", type=int, default=None)
    p.add_argument("--base-lr", type=float, default=None)
    p.add_argument("--clip-gradients", type=float, default=None,
                   help="Caffe solver clip_gradients: scale raw grads to this "
                        "global L2 norm when exceeded (ResNet-101 warm starts "
                        "need ~35; the VGG recipe leaves it off)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--crop-size", type=int, default=None)
    p.add_argument("--snapshot-every", type=int, default=None)
    p.add_argument("--num-classes", type=int, default=21)
    p.add_argument("--display", type=int, default=10)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--crf-fast", action="store_true",
                   help="bf16 CRF kernel matmuls in the stage-s step (throughput "
                        "opt-in; default is the reference's fp32 mean field)")
    p.add_argument("--crf-true-grad", action="store_true",
                   help="backprop the TRUE mean-field Jacobian (CRF-as-RNN) "
                        "through the stage-s CRF instead of the reference's "
                        "heuristic (1-Q)*g CRFLayer backward")
    p.add_argument("--no-mesh", action="store_true", help="force single-device")
    p.add_argument("--cache-decoded", action="store_true",
                   help="cache decoded uint8 canvases to a memmap under "
                        "--snapshot-dir (stage s: resized crops; stage f: "
                        "max-padded originals + labels).  First epoch "
                        "decodes, later epochs read at memory speed; "
                        "implies --ship-uint8")
    p.add_argument("--ship-uint8", action="store_true",
                   help="ship raw uint8 image canvases and mean-subtract on "
                        "device (4x fewer host->device bytes than f32; exact "
                        "for stage f, <=0.5/255 resize quantization for "
                        "stage s)")
    p.add_argument("--auto-resume", action="store_true",
                   help="resume from the latest snapshot in --snapshot-dir if present")
    p.add_argument("--rss-limit-gb", type=float, default=-1.0,
                   help="host-RSS watchdog: past this many GB, snapshot and "
                        "exit 75 so a supervisor can relaunch with "
                        "--auto-resume (deterministic data order makes the "
                        "restart lossless).  Bounds the native transfer-"
                        "buffer leak of remote-TPU tunnel clients.  "
                        "-1 = auto (80%% of MemTotal), 0 = off")
    p.add_argument("--stall-limit-min", type=float, default=60.0,
                   help="stall watchdog: exit 75 when no training step "
                        "completes for this many minutes (wedged "
                        "device/tunnel; resume replays from the last "
                        "snapshot).  Must exceed the longest legitimate "
                        "gap — first remote compiles take minutes.  0 = off")
    p.add_argument("--sync-snapshots", action="store_true",
                   help="write snapshots synchronously (default: async orbax "
                        "writes that do not stall the train loop)")
    # in-training validation (the reference has none; SegAccuracy-equivalent+)
    p.add_argument("--val-every", type=int, default=0, help="validate every N iters (0 = off)")
    p.add_argument("--val-ids", default=None, help="validation id list")
    p.add_argument("--val-dir", default=None, help="VOC root for validation images")
    p.add_argument("--val-gt", default=None, help="ground-truth mask dir")
    p.add_argument("--val-limit", type=int, default=100, help="max validation images")
    p.add_argument("--metrics-log", default=None, help="JSONL metrics file")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace of steps 10-14 here")
    return p.parse_args(argv)


def _flush_metrics(pending, logger):
    """Materialize deferred step metrics with ONE device->host transfer.

    A separate float() per scalar costs a full round trip each — through a
    remote-TPU tunnel that is ~40 ms x (display x n_keys) per block, which
    at display=50 added ~200 ms/step.  Stacking on device first makes it
    one transfer per display block."""
    if not pending:
        return None
    import jax.numpy as jnp

    keys = sorted(pending[0][1])
    flat = np.asarray(jnp.stack([m[k] for _, m in pending for k in keys]))
    averaged = None
    for row, (itn, _) in enumerate(pending):
        averaged = logger.log(
            itn,
            {k: float(flat[row * len(keys) + i]) for i, k in enumerate(keys)},
        )
    pending.clear()
    return averaged


def _process_geometry(global_batch: int, n_proc: int, pid: int, n_dev: int):
    """Multi-host uneven-batch geometry: (rows, start_row, n_real).

    The global batch pads to the device multiple (``pad_batch_to_multiple``'s
    rule applied at the job level): ``rows = ceil(B/n_dev)*n_dev / n_proc``
    is this process's contribution to the global array; it carries the real
    samples at global rows ``[start_row, start_row + n_real)`` — possibly
    zero of them when the global batch is smaller than the preceding
    processes' rows (e.g. batch 20 on 8 single-chip hosts: 24 padded rows,
    3/process, process 7 is all padding).  Pad rows are masked out of
    losses/grads/metrics exactly, so ANY process count whose device total
    the batch pads to works — the reference's batch 20 runs on arbitrary
    pod-slice host counts (train-s.prototxt:17-19).
    """
    if n_proc == 1:
        return global_batch, 0, global_batch
    assert n_dev % n_proc == 0, (n_dev, n_proc)
    padded = -(-global_batch // n_dev) * n_dev
    rows = padded // n_proc
    start = pid * rows
    n_real = max(0, min(global_batch - start, rows))
    return rows, start, n_real


def _local_batch(global_batch: int, n_proc: int) -> int:
    """Per-process LOADED sample count (multi-host data loading).

    All-padding processes still load one realistic (masked) sample so the
    CRF/grow numerics on their replica rows stay healthy."""
    if n_proc == 1:
        return global_batch
    _, _, n_real = _process_geometry(
        global_batch, n_proc, jax.process_index(), len(jax.devices())
    )
    return max(n_real, 1)


def _override(cfg, args):
    changes = {}
    if args.max_iter is not None:
        changes["max_iter"] = args.max_iter
    if args.base_lr is not None:
        changes["base_lr"] = args.base_lr
    if args.clip_gradients is not None:
        changes["clip_gradients"] = args.clip_gradients
    if args.batch_size is not None:
        changes["batch_size"] = args.batch_size
    if args.crop_size is not None:
        changes["crop_size"] = args.crop_size
        if hasattr(cfg, "cue_size"):
            changes["cue_size"] = (args.crop_size - 1) // 8 + 1
    if args.snapshot_every is not None:
        changes["snapshot_every"] = args.snapshot_every
    changes["num_classes"] = args.num_classes
    changes["compute_dtype"] = args.dtype
    if getattr(args, "crf_fast", False) and hasattr(cfg, "crf_fast"):
        changes["crf_fast"] = True
    if getattr(args, "crf_true_grad", False) and hasattr(cfg, "crf_true_grad"):
        changes["crf_true_grad"] = True
    return dataclasses.replace(cfg, **changes)


def main(argv=None) -> None:
    args = parse_args(argv)
    if args.num_processes > 1:
        # must run before any jax backend use (SURVEY §2.4: multi-slice DP
        # over DCN via jax.distributed; the reference is single-process)
        from dsrg_tpu.parallel.distributed import initialize

        initialize(args.coordinator, args.num_processes, args.process_id)
    from dsrg_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    n_proc = jax.process_count()
    is_primary = jax.process_index() == 0
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    def build_model(num_classes):
        if args.model_name == "resnet101":
            from dsrg_tpu.models import ResNet101DeepLab

            return ResNet101DeepLab(num_classes=num_classes, compute_dtype=dtype)
        return DeepLabLargeFOV(num_classes=num_classes, compute_dtype=dtype)

    if args.stage == "s":
        if args.dataset == "coco":
            args.num_classes = args.num_classes if args.num_classes != 21 else 81
        cfg = _override(Stage1Config(), args)
        model = build_model(cfg.num_classes)
        state, tx, extra_vars = init_stage1(model, cfg)
        input_mean = None
        if args.dataset == "coco":
            import os.path as osp

            from dsrg_tpu.data.coco import COCO_MEAN, COCOCueDataset

            dataset = COCOCueDataset(
                args.root, args.pair_list, batch_size=_local_batch(cfg.batch_size, n_proc),
                new_size=(cfg.crop_size, cfg.crop_size),
                num_classes=cfg.num_classes, seed=cfg.seed,
                ship_uint8=args.ship_uint8 or args.cache_decoded,
                cache_dir=(osp.join(args.snapshot_dir, "decoded_cache")
                           if args.cache_decoded else None),
            )
            input_mean = tuple(float(m) for m in COCO_MEAN)
        else:
            cue_db = CueDB(args.cues, num_classes=cfg.num_classes, cue_size=cfg.cue_size)
            import os.path as osp

            dataset = Stage1Dataset(
                args.image_dir, args.input_list, cue_db,
                crop_size=cfg.crop_size, batch_size=_local_batch(cfg.batch_size, n_proc), seed=cfg.seed,
                ship_uint8=args.ship_uint8 or args.cache_decoded,
                cache_dir=(osp.join(args.snapshot_dir, "decoded_cache")
                           if args.cache_decoded else None),
            )
        step_kwargs = {} if input_mean is None else {"input_mean": input_mean}
        make_step = lambda axis: make_stage1_step(
            model, cfg, tx, axis_name=axis, extra_vars=extra_vars, **step_kwargs
        )
    else:
        cfg = _override(Stage2Config(), args)
        model = build_model(cfg.num_classes)
        state, tx, extra_vars = init_stage2(model, cfg)
        import os.path as osp

        dataset = Stage2Dataset(
            args.root, args.pair_list,
            crop_size=cfg.crop_size, batch_size=_local_batch(cfg.batch_size, n_proc), seed=cfg.seed,
            ship_uint8=args.ship_uint8 or args.cache_decoded,
            cache_dir=(osp.join(args.snapshot_dir, "decoded_cache")
                       if args.cache_decoded else None),
        )
        make_step = lambda axis: make_stage2_step(
            model, cfg, tx, axis_name=axis, extra_vars=extra_vars
        )

    if args.weights:
        if args.weights.endswith(".caffemodel"):
            from dsrg_tpu.models.import_caffe import (
                caffe_blobs_to_flax,
                load_caffemodel,
                resnet_blobs_to_flax,
            )

            blobs = load_caffemodel(args.weights)
            if args.model_name == "resnet101":
                variables = resnet_blobs_to_flax(
                    blobs, {"params": state.params, **extra_vars}
                )
                state = state.replace(params=variables["params"])
                extra_vars = {"batch_stats": variables["batch_stats"]}
            else:
                state = state.replace(params=caffe_blobs_to_flax(blobs, state.params))
        else:
            source = ckpt.load_params(args.weights)
            if isinstance(source, dict) and "params" in source:
                source = source["params"]  # full variables dict checkpoint
            state = state.replace(params=ckpt.copy_from(state.params, source))
    if args.snapshot:
        state = ckpt.restore_checkpoint(args.snapshot, state)
    elif args.auto_resume:
        latest = ckpt.latest_checkpoint(args.snapshot_dir)
        if latest:
            print("auto-resume from", latest)
            state = ckpt.restore_checkpoint(latest, state)

    if int(state.step) and hasattr(dataset, "seek"):
        # reproduce the uninterrupted run's data order after a resume
        # (sample k is a pure function of (seed, k) — data/voc.py:_EpochOrder)
        dataset.seek(int(state.step))

    n_dev = len(jax.devices())
    use_mesh = (not args.no_mesh) and n_dev > 1
    pad_rows = n_valid = None
    if n_proc > 1:
        # every process reads a disjoint contiguous slice of the global
        # data order; batches assemble into global arrays in the loader
        # (make_array_from_process_local_data via shard_global_batch).
        # Uneven global batches: this process contributes `rows` rows to
        # the padded global batch, of which the first `n_valid` are real —
        # an all-padding process loads the global batch's LAST sample once
        # (row clamp in _EpochOrder) and masks every row.
        rows, start, n_real = _process_geometry(
            cfg.batch_size, n_proc, jax.process_index(), n_dev
        )
        dataset.configure_shard(
            jax.process_index(), n_proc,
            start_row=start if n_real else cfg.batch_size - 1,
            global_batch=cfg.batch_size,
        )
        pad_rows, n_valid = rows, n_real
        if args.no_mesh:
            raise SystemExit("--no-mesh is incompatible with --num-processes > 1")
    if use_mesh or n_proc > 1:
        if n_proc > 1:
            from dsrg_tpu.parallel.distributed import make_global_mesh

            mesh = make_global_mesh()
        else:
            mesh = make_mesh()
        # snapshots restore committed to one device; re-place onto the mesh
        # so restored runs shard exactly like fresh ones (topology-portable
        # restore — tests/test_checkpoint_topology.py)
        state = replicate_to_mesh(state, mesh)
        step = data_parallel_step(make_step("data"), mesh, donate_state=False)
        loader = PrefetchLoader(dataset, mesh=mesh, pad_rows=pad_rows,
                                n_valid=n_valid)
        padded = -(-cfg.batch_size // n_dev) * n_dev
        note = (
            ""
            if padded == cfg.batch_size
            else (f" (batch padded {cfg.batch_size}->{padded}; pad rows are "
                  "masked out of losses/grads/metrics exactly)")
        )
        if is_primary:
            proc_note = f" across {n_proc} processes" if n_proc > 1 else ""
            print(f"data-parallel over {n_dev} devices{proc_note}, "
                  f"{padded // n_dev} images/device{note}")
    else:
        step = jax.jit(make_step(None), donate_argnums=())
        loader = PrefetchLoader(dataset)
        print("single-device training")

    def run_validation(params):
        import os.path as osp

        from PIL import Image as PILImage

        from dsrg_tpu.inference import Predictor
        from dsrg_tpu.utils.confusion import ConfusionMatrix
        from dsrg_tpu.utils.palette import read_mask_png

        variables = {"params": params, **extra_vars} if extra_vars else params
        predictor = Predictor(model, variables, num_classes=cfg.num_classes)
        conf = ConfusionMatrix(cfg.num_classes)
        ids = [ln.strip() for ln in open(args.val_ids) if ln.strip()][: args.val_limit]
        for img_id in ids:
            img = np.asarray(
                PILImage.open(
                    osp.join(args.val_dir, "JPEGImages", img_id + ".jpg")
                ).convert("RGB")
            )
            mask = predictor.predict_mask(img, sizes=[cfg.crop_size], smooth=False)
            gt = read_mask_png(osp.join(args.val_gt, img_id + ".png"))
            conf.add(gt, mask)
        miou, _, _ = conf.jaccard()
        return miou

    from dsrg_tpu.utils import watchdog
    from dsrg_tpu.utils.profiling import MetricLogger, StepTimer, trace

    # multi-host: a one-sided exit-75 would strand the peers in collectives,
    # so the auto (-1) RSS limit is disabled; an explicit --rss-limit-gb
    # still applies (the supervisor must then relaunch ALL processes)
    rss_limit = (
        watchdog.resolve_limit(args.rss_limit_gb)
        if (n_proc == 1 or args.rss_limit_gb > 0)
        else 0.0
    )
    if n_proc > 1 and rss_limit <= 0:
        print(
            "WARNING: multi-host run with NO host-RSS watchdog — the tunnel "
            "TPU client leaks host memory ~1:1 with bytes transferred "
            "(~80 GB/h at production rates); a multi-hour run WILL be "
            "OOM-killed mid-collective.  Pass --rss-limit-gb N under a "
            "supervisor that relaunches ALL processes on exit code 75.",
            flush=True,
        )
    stall = watchdog.StallWatchdog(args.stall_limit_min * 60.0,
                                   describe="training-step")
    logger = MetricLogger(args.metrics_log if is_primary else None,
                          average_window=args.display)
    timer = StepTimer(cfg.batch_size)
    start_iter = int(state.step)
    profiler_ctx = None
    pending = []
    writer = (
        ckpt.AsyncCheckpointWriter() if not args.sync_snapshots else None
    )
    for it in range(start_iter, cfg.max_iter):
        if args.profile_dir and it == start_iter + 10:
            profiler_ctx = trace(args.profile_dir)
            profiler_ctx.__enter__()
        batch = next(loader)
        state, metrics = step(state, batch)
        # defer host materialization to the display boundary: per-step
        # float() syncs stall the device pipeline (badly so through remote
        # tunnels); async dispatch keeps it full
        pending.append((it + 1, metrics))
        if (it + 1) % args.display == 0:
            averaged = _flush_metrics(pending, logger)
        timer.tick()
        stall.tick()  # dispatch went through; a wedge blocks in the flush
        if args.profile_dir and it == start_iter + 14 and profiler_ctx is not None:
            profiler_ctx.__exit__(None, None, None)
            profiler_ctx = None
            print("profile trace ->", args.profile_dir, flush=True)
        if (it + 1) % args.display == 0 and is_primary:
            extra = ""
            if timer.step_time:
                extra = f" ({timer.step_time * 1000:.0f} ms/iter, {timer.images_per_sec:.1f} img/s)"
            print(f"iter {it + 1}: loss = {averaged['loss']:.4f}{extra}", flush=True)
        if (args.val_every and (it + 1) % args.val_every == 0 and args.val_ids
                and is_primary):
            # local-devices-only computation: safe to run on one process
            # while peers move on to the next (collective) step
            miou = run_validation(state.params)
            logger.log(it + 1, {"val_miou": miou})
            print(f"iter {it + 1}: val mIoU = {miou:.4f}", flush=True)
            stall.tick()  # a long-but-finite validation is progress too
        snapped = (it + 1) % cfg.snapshot_every == 0 or (it + 1) == cfg.max_iter
        if snapped:
            to_save = (
                {"params": state.params, **extra_vars} if extra_vars else state.params
            )
            if writer is not None:  # async: returns immediately, writes in bg
                path = writer.save(args.snapshot_dir, state, it + 1)
                writer.save_params(path + "_params", to_save)
            else:
                path = ckpt.save_checkpoint(args.snapshot_dir, state, it + 1)
                ckpt.save_params(path + "_params", to_save)
            if is_primary:
                print("snapshot ->", path, flush=True)
        # host-RSS watchdog (utils/watchdog.py): past the limit, persist a
        # full snapshot and hand control back to the supervisor — completing
        # the run beats restarting, so never fire on the final iteration
        if (rss_limit and (it + 1) % args.display == 0
                and (it + 1) != cfg.max_iter and watchdog.over_limit(rss_limit)):
            stall.close()  # the sync snapshot below may legitimately be slow
            if not snapped:
                path = ckpt.save_checkpoint(args.snapshot_dir, state, it + 1)
            if writer is not None:
                writer.close()  # drain any in-flight async snapshot
            loader.close()
            logger.close()
            print(f"rss-watchdog: host RSS {watchdog.rss_gb():.1f} GB > "
                  f"{rss_limit:.1f} GB limit at iter {it + 1}; snapshot "
                  f"saved -> exit {watchdog.RESTART_EXIT_CODE} (relaunch "
                  "with --auto-resume to continue losslessly)", flush=True)
            raise SystemExit(watchdog.RESTART_EXIT_CODE)
    stall.close()
    _flush_metrics(pending, logger)  # flush any tail metrics
    if writer is not None:
        writer.close()  # drain the in-flight snapshot before exit
    loader.close()
    logger.close()


if __name__ == "__main__":
    main()
