"""Train the mime baseline (reference ``run/train_mime.py``)."""

from lsdm_tpu.run._baseline_common import make_arg_parser, train_baseline


def main():
    args = make_arg_parser(train=True).parse_args()
    train_baseline(args, "mime")


if __name__ == "__main__":
    main()
