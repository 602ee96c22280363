"""ISOLATED scatter3(+regather) timing: XLA vs the 2D pallas kernel.

CAUTION when reading the output: in this isolated chain XLA wins (~0.73
vs ~1.1 ms/iter), but inside the REAL train step XLA's scatters run 2.5x
slower than here (1.31 ms/step, profiled) and the kernel wins — which is
why it is default-on (BENCH.md r3c, models/hybrid.py). This script exists
to reproduce exactly that isolated-vs-in-program contrast."""
import functools, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from lirec_tpu.ops import scatter_accum as sa

M, NC, NT, DC, DT = 23040, 2048, 4097, 1024, 512
rng = np.random.default_rng(0)
idx3 = jnp.asarray(rng.integers(0, [NC, NT, NT], size=(M, 3)), jnp.int32)
gc = jnp.asarray(rng.standard_normal((M, DC)), jnp.bfloat16)
g1 = jnp.asarray(rng.standard_normal((M, DT)), jnp.bfloat16)
g2 = jnp.asarray(rng.standard_normal((M, DT)), jnp.bfloat16)

def run(tag, force):
    @jax.jit
    def sweep(idx3, gc, g1, g2, n):
        def body(i, carry):
            acc, gc, g1, g2 = carry
            a, b, c = sa.scatter_accum3(idx3, gc, g1, g2, NC, NT, force=force)
            gc = gc + a[idx3[:, 0], :].astype(gc.dtype) * 1e-9
            g1 = g1 + b[idx3[:, 1], :].astype(g1.dtype) * 1e-9
            g2 = g2 + c[idx3[:, 2], :].astype(g2.dtype) * 1e-9
            return acc + a[0].sum(), gc, g1, g2
        return jax.lax.fori_loop(
            0, n, body, (jnp.float32(0), gc, g1, g2))[0]

    def timed(n):
        t0 = time.time()
        out = sweep(idx3, gc, g1, g2, jnp.int32(n))
        out.block_until_ready(); float(out)
        return time.time() - t0

    timed(2)  # compile
    per = []
    short, long_ = 4, 44
    for rep in range(5):
        ts = timed(short + 2 * rep + 1)
        tl = timed(long_ + 2 * rep)
        per.append((tl - ts) / (long_ - short - 1))
    ok = sorted(p for p in per if p > 0) or sorted(per)
    print("%-8s %7.3f ms/iter (scatter3 + regather)" % (tag, ok[len(ok)//2]*1000), flush=True)

run("xla", "reference")
run("pallas", "pallas")
