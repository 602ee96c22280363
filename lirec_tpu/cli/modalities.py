"""Entry point mirroring the reference `resume/modalities.py` evaluation."""

from lirec_tpu.cli.common import run_entry


def main(argv=None):
    return run_entry("modalities", argv)


if __name__ == "__main__":
    main()
