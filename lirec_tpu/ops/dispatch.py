"""Kernel-dispatch observability.

r1 shipped a VMEM guard that silently disabled the fused eval kernel at
real dims for a whole round (BENCH.md ablations); r3's B=256 SMEM cliff
was the same failure class. Every auto-dispatch decision (pallas tier vs
XLA fallback) is now recorded here and logged once per distinct decision,
so benches and the real-scale stress run can assert WHICH path executed
instead of inferring it from throughput.
"""

from __future__ import annotations

import logging

__all__ = ["record", "last_dispatch", "all_dispatches", "reset"]

_logger = logging.getLogger("lirec_tpu.ops")
_DISPATCH: dict = {}
_LOGGED: set = set()


def record(kernel: str, path: str, reason: str, shapes) -> None:
    """Record (and log once per distinct decision) a dispatch choice."""
    _DISPATCH[kernel] = {"path": path, "reason": reason, "shapes": shapes}
    key = (kernel, path, reason, str(shapes))
    if key not in _LOGGED:
        _LOGGED.add(key)
        _logger.info(
            "kernel dispatch: %s -> %s (%s) shapes=%s",
            kernel, path, reason, shapes,
        )


def last_dispatch(kernel: str):
    """Most recent decision for `kernel`, or None. Kernels:
    'fused_ctx_pool', 'gather_masked_sum', 'scatter_accum'."""
    return _DISPATCH.get(kernel)


def all_dispatches() -> dict:
    return dict(_DISPATCH)


def reset() -> None:
    _DISPATCH.clear()
