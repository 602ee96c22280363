"""`bench.py --mesh DxM` — one-command multi-chip readiness (VERDICT r4
item 6): the SPMD packed eval + train sweeps run on the 8-device virtual
mesh, counters match the single-device sweep exactly, and the collective
traffic XLA inserted is measured against the documented expectation.
The same command is the scaling measurement the day real chips exist."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_collective_parser_counts_spmd_psum():
    """parallel/collectives.py reads real optimized HLO: a row-parallel
    matmul grad over a 4x2 mesh must show an all-reduce whose payload the
    parser sizes correctly (dtype itemsize x dims, tuple results summed)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lirec_tpu.parallel.collectives import (
        collective_ops, collective_summary,
    )
    from lirec_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(shape=(4, 2))

    def loss(w, x):
        return ((x @ w) @ w.T).sum()

    w = jax.device_put(
        jnp.ones((256, 512)), NamedSharding(mesh, P(None, "model"))
    )
    x = jax.device_put(
        jnp.ones((64, 256)), NamedSharding(mesh, P("data", None))
    )
    compiled = jax.jit(jax.grad(loss)).lower(w, x).compile()
    summary = collective_summary(compiled)
    assert summary["n_collectives"] >= 1, compiled.as_text()[:2000]
    assert summary["total_bytes"] > 0
    # every parsed op carries a shape and consistent bytes
    for op in collective_ops(compiled.as_text()):
        assert op["op"] in (
            "all-reduce", "all-gather", "reduce-scatter",
            "collective-permute", "all-to-all",
        )
        assert op["bytes"] >= 0


def test_collective_parser_shapes():
    """Unit: result-shape parsing (tuple results, layout annotations,
    -start/-done async pairs counted once)."""
    from lirec_tpu.parallel.collectives import collective_ops

    hlo = "\n".join([
        "  %ar = f32[64,512]{1,0} all-reduce(f32[64,512]{1,0} %x), to_apply=%add",
        "  %t = (f32[100]{0}, bf16[8,128]{1,0}) all-reduce(%a, %b), to_apply=%add",
        "  %s = f32[32]{0} all-gather-start(f32[4]{0} %p), dimensions={0}",
        "  %d = f32[32]{0} all-gather-done(f32[32]{0} %s)",
        "  %g = get-tuple-element((f32[4]) %ar), index=0",
        # realistic async tuple results: (operand, result[, context]) —
        # payload counted once, never operand+result
        "  %ag = (f32[4]{0}, f32[32]{0}) all-gather-start(f32[4]{0} %p), dimensions={0}",
        "  %ars = (f32[100]{0}, f32[100]{0}) all-reduce-start(f32[100]{0} %x), to_apply=%add",
        "  %cp = (bf16[8,128]{1,0}, bf16[8,128]{1,0}, u32[], u32[]) collective-permute-start(bf16[8,128]{1,0} %y)",
        "  %rs = (f32[32]{0}, f32[4]{0}) reduce-scatter-start(f32[32]{0} %z), dimensions={0}",
    ])
    ops = collective_ops(hlo)
    kinds = [o["op"] for o in ops]
    assert kinds == ["all-reduce", "all-reduce", "all-gather",
                     "all-gather", "all-reduce", "collective-permute",
                     "reduce-scatter"]
    assert ops[0]["bytes"] == 64 * 512 * 4
    assert ops[1]["bytes"] == 100 * 4 + 8 * 128 * 2
    assert ops[2]["bytes"] == 32 * 4
    assert ops[3]["bytes"] == 32 * 4          # result, not 4+32
    assert ops[4]["bytes"] == 100 * 4         # operand==result, once
    assert ops[5]["bytes"] == 8 * 128 * 2     # u32 contexts excluded
    assert ops[6]["bytes"] == 4 * 4           # reduce-scatter: the output


def test_bench_mesh_end_to_end(tmp_path):
    """The full --mesh mode on the virtual 4x2 mesh: counters match,
    collective measurements and expectations land in the artifact, and
    the eval step's traffic stays in counter-delta territory (KB, not the
    MB a resharding bug would show)."""
    from tools.bench_mesh import run

    result = run(
        (4, 2), batch=16, n_batches=6, compute_dtype="float32",
        n_clips=128, n_tracks=256,
        dims={"text_dim": 16, "visual_dim": 32, "joint_dim": 128},
        out_path=str(tmp_path / "mesh.json"),
    )
    assert result["eval"]["counters_match"], result["eval"]["counter_diffs"]
    assert result["n_devices"] == 8
    assert not result["timings_meaningful"]  # honest on CPU
    ev = result["eval"]["collectives_per_step"]
    tr = result["train"]["collectives_per_step"]
    assert ev["n_collectives"] >= 1
    # eval: counter-delta psums only — orders of magnitude under the
    # batch/table sizes (a resharding inside the loop would blow this)
    assert ev["total_bytes"] < 64 * 1024, ev
    # train: the gradient psum must at least show up (>= ~param bytes is
    # not asserted exactly — XLA may reduce-scatter/all-gather split it)
    assert tr["total_bytes"] > 0
    assert result["train"]["expectation"]["param_bytes"] > 0
    import json
    import os

    assert os.path.exists(tmp_path / "mesh.json")
    with open(tmp_path / "mesh.json") as f:
        assert json.load(f)["mesh"] == {"data": 4, "model": 2}
