"""Collective-traffic analysis of compiled SPMD programs.

The reference has no distributed layer (SURVEY.md §2), so there is nothing
to match here — this module exists so the rebuild's OWN distributed layer
is *measurable*, not just correct (VERDICT r4 item 6): for any compiled
SPMD step it reports which collectives XLA actually inserted and how many
bytes each moves, so `bench.py --mesh` can compare the measured traffic
against the documented expectation (DP gradient psum ≈ param bytes; eval
counter psums ≈ carry bytes) the day real multi-chip hardware exists.

The numbers come from the optimized HLO text of the compiled executable —
the same source `jax.stages.Compiled.as_text()` exposes on every backend,
so the analysis works identically on the 8-device virtual CPU mesh and on
real chips. Bytes are the OUTPUT payload of each collective op (one
logical traversal of the data; wire bytes depend on algorithm/topology —
ring all-reduce moves ~2x this — which is exactly why the expectation is
documented next to the measurement instead of baked into it).
"""

from __future__ import annotations

import re
from typing import Dict, List

__all__ = [
    "collective_ops",
    "collective_summary",
    "expected_train_bytes",
    "expected_eval_bytes",
]

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}

# one optimized-HLO instruction whose root op is a collective; tuple-shaped
# results ("(f32[..], f32[..]) all-reduce(...)") are matched per element
_COLLECTIVE = re.compile(
    r"\b(all-reduce|all-gather|reduce-scatter|collective-permute"
    r"|all-to-all)(?:-start|-done)?\("
)
_SHAPE = re.compile(r"([a-z]+\d*)\[([0-9,]*)\]")


def _shape_bytes(dtype: str, dims: str) -> int:
    n = _DTYPE_BYTES.get(dtype, 4)
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n


def collective_ops(hlo_text: str) -> List[Dict]:
    """Every collective instruction in an optimized-HLO dump, with the op
    kind and its result payload bytes. Sync tuple results (a fused
    all-reduce over several buffers) are summed. Async ``-start`` results
    are ``(operand, result[, u32 context scalars])`` tuples — those count
    the RESULT payload once (largest non-context shape; smallest for
    reduce-scatter, whose output shrinks), never operand+result. ``-done``
    halves of async pairs are skipped (the ``-start`` carries the shape).
    """
    out = []
    for line in hlo_text.splitlines():
        m = _COLLECTIVE.search(line)
        if not m or "-done(" in line:
            continue
        # shapes of the RESULT only: the text between '=' and the op name
        eq = line.find("=")
        head = line[eq + 1 : m.start()] if 0 <= eq < m.start() else ""
        shapes = _SHAPE.findall(head)
        sizes = [_shape_bytes(dt, dims) for dt, dims in shapes]
        is_start = "-start(" in m.group(0)
        if is_start and len(shapes) > 1:
            payload = [
                s for (dt, dims), s in zip(shapes, sizes)
                if dims or dt not in ("u32", "s32")
            ] or sizes
            nbytes = (
                min(payload) if m.group(1) == "reduce-scatter"
                else max(payload)
            )
        else:
            nbytes = sum(sizes)
        out.append({
            "op": m.group(1),
            "bytes": nbytes,
            "shapes": ["%s[%s]" % s for s in shapes],
        })
    return out

def collective_summary(compiled) -> Dict:
    """Per-op-kind byte totals for a ``jax.stages.Compiled``.

    NOTE: counts each instruction ONCE — a collective inside a while loop
    (e.g. a whole-epoch sweep) moves this much *per iteration*. Analyze
    the per-batch/per-step program for per-step numbers.
    """
    ops = collective_ops(compiled.as_text())
    per_kind: Dict[str, Dict] = {}
    for op in ops:
        k = per_kind.setdefault(op["op"], {"count": 0, "bytes": 0})
        k["count"] += 1
        k["bytes"] += op["bytes"]
    return {
        "total_bytes": sum(o["bytes"] for o in ops),
        "n_collectives": len(ops),
        "per_op": per_kind,
    }


def _tree_bytes(tree) -> int:
    import jax

    return sum(
        leaf.size * leaf.dtype.itemsize for leaf in jax.tree.leaves(tree)
    )


def expected_train_bytes(params, mesh) -> Dict:
    """Documented expectation for one DP(xTP) train step.

    Pure data parallelism reduces the loss gradients once per step: the
    psum payload is one full gradient pytree = param bytes (Adam moments
    are sharded-stationary; nothing else crosses devices). A model axis
    adds the row-parallel boundary psums of activations — O(B x joint)
    per sharded layer pair, small next to the 18.4M-param gradient — so
    ``param_bytes`` is the floor and the dominant term.
    """
    data = int(mesh.shape.get("data", 1))
    model = int(mesh.shape.get("model", 1))
    pb = _tree_bytes(params)
    return {
        "param_bytes": pb,
        "note": (
            "DP grad psum ~= param bytes/step (%.1f MB); model=%d adds "
            "row-parallel activation psums (O(B*joint)/layer), data=%d"
            % (pb / 2**20, model, data)
        ),
    }


def expected_eval_bytes(carry) -> Dict:
    """Documented expectation for one SPMD packed-eval step: the batch is
    sharded over 'data' and the metric counters live in a replicated
    carry, so each step psums counter DELTAS — at most carry bytes — plus
    model-axis boundary psums when TP is on. A few KB: eval scales out
    near-perfectly by construction, and a measurement far above this
    means an accidental resharding inside the loop."""
    cb = _tree_bytes(carry)
    return {
        "carry_bytes": cb,
        "note": "counter-delta psums <= carry bytes/step (%.1f KB)"
        % (cb / 1024),
    }
