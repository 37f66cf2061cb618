"""Multi-scale inference at relative scales [0.75, 1, 1.25] — mirror of
``training/tools/test-ms-f.py`` (final val predictions, ``run.sh:10``)."""

from dsrg_tpu.tools._infer_common import build_arg_parser, run_inference


def main(argv=None) -> None:
    args = build_arg_parser(__doc__).parse_args(argv)
    run_inference(args, scales=[0.75, 1.0, 1.25])


if __name__ == "__main__":
    main()
