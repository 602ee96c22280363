"""Optional Orbax checkpoint backend.

The default format is flax msgpack (saver.py) — single-file, dependency
light. For production multi-host checkpointing, Orbax adds atomic writes,
async save, and sharded-array support; this thin adapter exposes the same
(params, opt_state, epoch) surface over `orbax.checkpoint`.
"""

from __future__ import annotations

import os.path as ops
from typing import Dict, Optional, Tuple


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save(path: str, params: Dict, opt_state=None, epoch: int = 0) -> None:
    payload = {"params": params, "epoch": epoch}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    _checkpointer().save(ops.abspath(path), payload, force=True)


def restore(
    path: str, params_template: Dict, opt_template=None
) -> Tuple[Dict, Optional[object], int]:
    import orbax.checkpoint as ocp

    payload = {"params": params_template, "epoch": 0}
    if opt_template is not None:
        payload["opt_state"] = opt_template
        restored = _checkpointer().restore(ops.abspath(path), item=payload)
    else:
        # params-only read of a full train-state checkpoint (eval resume):
        # skip whatever opt_state is on disk
        restored = _checkpointer().restore(
            ops.abspath(path),
            args=ocp.args.PyTreeRestore(item=payload, partial_restore=True),
        )
    return (
        restored["params"],
        restored.get("opt_state"),
        int(restored.get("epoch", 0)),
    )
