"""Evaluate the atiss baseline (reference ``run/test_atiss.py``)."""

from lsdm_tpu.run._baseline_common import make_arg_parser, eval_baseline


def main():
    args = make_arg_parser(train=False).parse_args()
    eval_baseline(args, "atiss")


if __name__ == "__main__":
    main()
