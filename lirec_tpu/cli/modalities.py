"""Entry point mirroring the reference `resume/modalities.py` evaluation."""

from lirec_tpu.cli.common import run_entry


def main(argv=None):
    return run_entry("modalities", argv)


if __name__ == "__main__":
    main()


def script() -> int:
    """Console-script wrapper: main() returns data for programmatic use;
    setuptools wrappers sys.exit() the return value, so exit 0 here."""
    main()
    return 0
