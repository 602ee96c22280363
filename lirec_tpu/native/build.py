"""Compile the native libraries (g++ -O3 -shared) with mtime caching."""

from __future__ import annotations

import os
import os.path as ops
import subprocess
import sys

SRC = ops.join(ops.dirname(__file__), "ingest.cpp")
LIB = ops.join(ops.dirname(__file__), "libingest.so")
ASM_SRC = ops.join(ops.dirname(__file__), "assembly.cpp")
ASM_LIB = ops.join(ops.dirname(__file__), "libassembly.so")


def _build_one(src: str, lib: str, force: bool) -> str:
    if (
        not force
        and ops.exists(lib)
        and os.stat(lib).st_mtime >= os.stat(src).st_mtime
    ):
        return lib
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", lib, src,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return lib


def build(force: bool = False) -> str:
    return _build_one(SRC, LIB, force)


def build_assembly(force: bool = False) -> str:
    return _build_one(ASM_SRC, ASM_LIB, force)


if __name__ == "__main__":
    force = "--force" in sys.argv
    print("built", build(force=force))
    print("built", build_assembly(force=force))
