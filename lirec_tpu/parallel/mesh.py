"""Device mesh + sharding layout.

The reference has no distributed layer at all (SURVEY.md §2: no
torch.distributed/NCCL/MPI anywhere); this module *introduces* one, the
TPU-native way: a ``('data', 'model')`` mesh, batch/hypothesis axes sharded
over ``data`` (pure DP), and the MLP stack tensor-parallel over ``model``:

- first-layer kernels column-parallel  ``[in, joint/model]``,
- second-layer kernels row-parallel    ``[joint/model, out]`` (XLA inserts
  the psum at the boundary),
- the gate column-parallel feeding a row-parallel ``out_ints`` head.

The context-clip axis (19) is deliberately left unsharded but contiguous in
the layout so a future ``context`` axis can shard it (sequence parallelism)
without a repack.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "param_shardings",
    "batch_shardings",
    "table_shardings",
    "shard_tree",
    "host_copy",
    "initialize_distributed",
    "process_local_slice",
    "global_batch_from_local",
    "coordination_barrier",
]

_BARRIER_COUNTS: dict = {}


def coordination_barrier(tag: str, timeout_s: int = 600) -> None:
    """Align all processes at a symmetric program point over the
    coordination SERVICE (plain TCP), not over device collectives.

    Gloo context formation inside XLA:CPU has a hard ~30 s key-exchange
    deadline; host-side skew larger than that — compile-time asymmetry,
    the AOT cache's serialize work — kills the whole cluster at its first
    collective ("Gloo context initialization failed: DEADLINE_EXCEEDED").
    Calling this right before a collective program's first execution
    absorbs the skew where the timeout is generous, so the 30 s window
    only has to cover the actual context handshake. No-op
    single-process. Every process must reach the same ``tag`` sequence
    (a per-tag counter keeps repeated uses unique)."""
    if jax.process_count() == 1:
        return
    n = _BARRIER_COUNTS.get(tag, 0)
    _BARRIER_COUNTS[tag] = n + 1
    try:
        from jax._src import distributed

        client = distributed.global_state.client
        if client is None:
            return
        client.wait_at_barrier("lirec_%s_%d" % (tag, n), timeout_s * 1000)
    except (ImportError, AttributeError):
        # private-API layout changed (module moved OR global_state/
        # wait_at_barrier renamed): fall back to raw gloo timing
        pass


def host_copy(tree):
    """Global (possibly multi-process) arrays -> host numpy.

    Single-process this is a plain fetch. Multi-process, arrays sharded
    over non-addressable devices cannot be np.asarray'd directly — each
    leaf allgathers to a full host copy on every process (checkpointing
    and BestNSaver snapshots read these)."""
    if jax.process_count() == 1:
        return jax.tree.map(np.asarray, tree)
    from jax.experimental import multihost_utils

    return jax.tree.map(
        np.asarray, multihost_utils.process_allgather(tree, tiled=True)
    )


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (DCN): call once per host before building the
    mesh. No-op in single-process runs. With multiple hosts, the data axis
    should span hosts (pure DP over DCN) and the model axis stay within a
    host's ICI domain — `make_mesh` lays devices out in that order."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    devices=None,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        model = 2 if n % 2 == 0 and n > 1 else 1
        shape = (n // model, model)
    grid = np.asarray(devices).reshape(shape)
    return Mesh(grid, axis_names)


# parameter name -> (kernel spec, bias spec); first layers column-parallel,
# second layers row-parallel, heads row-parallel after the sharded gate.
_COLUMN = (P(None, "model"), P("model"))
_ROW = (P("model", None), P(None))
_REPL = (P(None, None), P(None))

_PARAM_PLAN = {
    # ints / ctx modality MLPs: layer1 column, layer2 row
    "txt": _COLUMN, "txt2": _ROW,
    "vis": _COLUMN, "vis2": _ROW,
    "tracks1": _COLUMN, "tracks12": _ROW,
    "tracks2": _COLUMN, "tracks22": _ROW,
    # gate: consumes the (replicated) fused representation, column-parallel
    "gates_ints": _COLUMN,
    # heads: out_ints consumes the sharded gate output -> row-parallel;
    # out_ctx consumes the replicated ctx representation -> replicate (small)
    "out_ints": _ROW,
    "out_ctx": _REPL,
}


def _plan_for(name: str, gates: bool):
    stem = name.split("_")[0] if name not in _PARAM_PLAN else name
    if name == "out_ints" and not gates:
        # without the gate the head input is replicated
        return _REPL
    return _PARAM_PLAN.get(name) or _PARAM_PLAN.get(stem) or _REPL


def param_shardings(params: Dict, mesh: Mesh, gates: bool = True) -> Dict:
    """NamedSharding tree matching a params pytree."""
    out: Dict = {}
    for name, leaf in params.items():
        kspec, bspec = _plan_for(name, gates)
        out[name] = {
            "kernel": NamedSharding(mesh, kspec),
            "bias": NamedSharding(mesh, bspec),
        }
    return out


def batch_shardings(batch: Dict, mesh: Mesh) -> Dict:
    """Shard every per-sample array over the data axis. Batch-level keys
    (the localized-table unique-row ids, data/localize.py) have no batch
    dimension and replicate."""
    return {
        key: NamedSharding(
            mesh,
            P(None) if key in ("uniq_clip", "uniq_track")
            else P("data", *([None] * (np.ndim(val) - 1))),
        )
        for key, val in batch.items()
    }


def table_shardings(tables: Dict, mesh: Mesh) -> Dict:
    """Feature tables are gathered from with data-local indices ->
    replicate them (they are small: a few thousand rows)."""
    return {key: NamedSharding(mesh, P(None, None)) for key in tables}


def shard_tree(tree, shardings):
    """Commit a pytree to a matching sharding tree.

    Single-process: a plain device_put. Multi-process: every process holds
    the full host value (params / tables / replicated inputs), so each
    leaf is assembled shard-by-shard with `make_array_from_callback` —
    device_put cannot target non-addressable devices.
    """
    if jax.process_count() == 1:
        return jax.tree.map(
            lambda leaf, sh: jax.device_put(leaf, sh), tree, shardings
        )

    def put(leaf, sh):
        arr = np.asarray(leaf)
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: arr[idx]
        )

    return jax.tree.map(put, tree, shardings)


def process_local_slice(mesh: Mesh, global_len: int, axis: str = "data") -> slice:
    """Row range of a ``P(axis)``-sharded length-``global_len`` array owned
    by THIS process. With the process-major device order of `make_mesh`
    (jax.devices() sorts by process) each process owns one contiguous
    block, so per-process data loaders can feed disjoint file ranges."""
    sh = NamedSharding(mesh, P(axis))
    pid = jax.process_index()
    spans = sorted({
        (idx[0].start or 0,
         global_len if idx[0].stop is None else idx[0].stop)
        for d, idx in sh.devices_indices_map((global_len,)).items()
        if d.process_index == pid
    })
    lo, hi = spans[0][0], spans[-1][1]
    cursor = lo
    for start, stop in spans:
        if start != cursor:
            raise ValueError(
                "process-local rows are not contiguous; lay the %r axis "
                "out process-major (see make_mesh)" % axis
            )
        cursor = stop
    return slice(lo, hi)


def global_batch_from_local(local_batch: Dict, mesh: Mesh,
                            axis: str = "data") -> Dict:
    """Per-process batch shards -> global arrays (multi-host data feeding).

    Each process passes only ITS rows (see `process_local_slice`);
    `jax.make_array_from_process_local_data` assembles the global array
    without any cross-host transfer. Works single-process too (where it
    degenerates to a device_put). Batch-level keys with no batch axis
    (the localized-table unique-row ids) must arrive FULL on every
    process and replicate."""
    out = {}
    for key, val in local_batch.items():
        val = np.asarray(val)
        spec = (
            P(None) if key in ("uniq_clip", "uniq_track")
            else P(axis, *([None] * (val.ndim - 1)))
        )
        sh = NamedSharding(mesh, spec)
        out[key] = jax.make_array_from_process_local_data(sh, val)
    return out
