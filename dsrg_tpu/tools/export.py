"""Export a trained model for serving (StableHLO via ``jax.export``).

The reference's deployment story is ``deploy.prototxt`` + ``.caffemodel``
loaded into a fresh Caffe process (``training/tools/test-ms.py:114-118``).
The TPU-native equivalent serializes either the bare deploy forward
(``--mode deploy``) or the full multi-scale + CRF inference pipeline
(``--mode pipeline``: uint8 canvases in, uint8 masks out) as a single
weights-embedded artifact loadable by any JAX process
(``dsrg_tpu.serving.ServingModel`` / ``ServingPipeline``).
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True, help="params checkpoint path")
    p.add_argument("--output", required=True, help="output artifact path")
    p.add_argument("--mode", choices=["deploy", "pipeline"], default="pipeline")
    p.add_argument("--num-classes", default=21, type=int)
    p.add_argument("--model-name", choices=["vgg16", "resnet101"], default="vgg16")
    p.add_argument("--batch", default=8, type=int, help="exported batch size")
    p.add_argument("--canvas", default=[512, 512], type=int, nargs=2,
                   metavar=("H", "W"), help="pipeline canvas (max image size)")
    p.add_argument("--input-size", default=321, type=int,
                   help="deploy-mode square input size")
    p.add_argument("--sizes", default=[241, 321, 401], type=int, nargs="+",
                   help="pipeline absolute scale sizes (test-ms)")
    p.add_argument("--scales", default=None, type=float, nargs="+",
                   help="pipeline fractional scales (test-ms-f) instead of --sizes")
    p.add_argument("--no-smooth", action="store_true", help="skip the CRF stage")
    p.add_argument("--platforms", default=None, nargs="+",
                   help="jax.export lowering platforms (e.g. tpu cpu)")
    args = p.parse_args(argv)

    from dsrg_tpu.serving import export_deploy, export_pipeline
    from dsrg_tpu.tools._infer_common import load_predictor

    pred = load_predictor(args.model, args.num_classes, args.model_name)
    if args.mode == "deploy":
        path = export_deploy(
            pred.model, pred.variables, args.output,
            input_shape=(args.batch, args.input_size, args.input_size, 3),
            platforms=args.platforms,
        )
    else:
        path = export_pipeline(
            pred.model, pred.variables, args.output,
            canvas_hw=tuple(args.canvas), batch=args.batch,
            sizes=None if args.scales else tuple(args.sizes),
            scales=tuple(args.scales) if args.scales else None,
            smooth=not args.no_smooth, num_classes=args.num_classes,
            platforms=args.platforms,
        )
    print("exported", args.mode, "->", path, flush=True)


if __name__ == "__main__":
    main()
