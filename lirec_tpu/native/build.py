"""Compile the native ingest library (g++ -O3 -shared) with mtime caching."""

from __future__ import annotations

import os
import os.path as ops
import subprocess
import sys

SRC = ops.join(ops.dirname(__file__), "ingest.cpp")
LIB = ops.join(ops.dirname(__file__), "libingest.so")


def build(force: bool = False) -> str:
    if (
        not force
        and ops.exists(LIB)
        and os.stat(LIB).st_mtime >= os.stat(SRC).st_mtime
    ):
        return LIB
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", LIB, SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return LIB


if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print("built", path)
