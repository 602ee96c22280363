"""Entry point mirroring the reference `resume/int_rel_ch.py` evaluation."""

from lirec_tpu.cli.common import run_entry


def main(argv=None):
    return run_entry("int_rel_ch", argv)


if __name__ == "__main__":
    main()
