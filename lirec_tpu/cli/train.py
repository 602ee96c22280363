"""First-class training entry (the reference only latently trains via
`mlp/train.py`; no reference script invokes it with resume=False)."""

import sys

from lirec_tpu.cli.common import run_entry


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    preset = "int_rel_ch"
    if argv and not argv[0].startswith("-"):
        preset = argv.pop(0)
    return run_entry(preset, argv + ["--train"])


if __name__ == "__main__":
    main()


def script() -> int:
    """Console-script wrapper: main() returns data for programmatic use;
    setuptools wrappers sys.exit() the return value, so exit 0 here."""
    main()
    return 0
