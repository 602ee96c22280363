"""Convert released PyTorch checkpoints to the native msgpack format.

    python -m lirec_tpu.cli.convert_checkpoint --src mod_all.pth.tar \\
        --dst mod_all.ckpt

The converted file loads with `checkpoint.load_params` (no torch needed at
eval time); conversion itself requires torch to unpickle the source
(ref `utils/util_functions.py:274-281` checkpoint format).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="lirec-tpu convert_checkpoint")
    p.add_argument("--src", required=True, help=".pth.tar source")
    p.add_argument("--dst", required=True, help=".ckpt msgpack destination")
    args = p.parse_args(argv)

    from lirec_tpu.checkpoint import load_torch_checkpoint, save_params

    params, meta = load_torch_checkpoint(args.src)
    save_params(args.dst, params, extra={"epoch": meta.get("epoch")})
    n_arrays = sum(len(v) for v in params.values())
    print(
        "converted %s -> %s (%d layers, %d arrays, epoch=%s)"
        % (args.src, args.dst, len(params), n_arrays, meta.get("epoch")),
        file=sys.stderr,
    )
    return {"layers": len(params), "epoch": meta.get("epoch")}


if __name__ == "__main__":
    main()


def script() -> int:
    """Console-script wrapper: main() returns data for programmatic use;
    setuptools wrappers sys.exit() the return value, so exit 0 here."""
    main()
    return 0
