"""COCO inference at native scale — mirror of ``training/tools/test-coco-f.py``
(scale-1 zoom variant with running mIoU, skipping non-RGB images)."""

from dsrg_tpu.tools.test_coco import run_coco
from dsrg_tpu.tools._infer_common import build_arg_parser


def main(argv=None) -> None:
    p = build_arg_parser(__doc__)
    p.set_defaults(num_classes=81)
    args = p.parse_args(argv)
    run_coco(args, scales=[1.0])


if __name__ == "__main__":
    main()
