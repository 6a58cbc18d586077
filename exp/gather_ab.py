"""Same-process A/B of the random-gather DMA ceiling across descriptor
(page) sizes.

exp/dma_probe.py runs one variant per process; the axon tunnel has
±25% cross-process variance, so its per-variant numbers cannot be
compared against each other (verify-skill rule: only same-process A/B
pairs). This probe builds one kernel per page size and times them
INTERLEAVED in a single process, several rounds each, printing every
round so spread is visible.

Usage: python exp/gather_ab.py [TOTAL_MB] [NSLOT] [PAGE_KB,...]
Kernel: carry-through (output = q + tiny*acc) so the timing loop can
never be hoisted (see dma_probe.py).
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import sys

import numpy as np


def main():
    total_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    nslot = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    pages_kb = [int(x) for x in (sys.argv[3] if len(sys.argv) > 3
                                 else "8,16,32").split(",")]
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    chunk_kb = 1024

    import os
    import jax
    if os.environ.get("QT_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from quest_tpu.utils.benchmarking import bench_op

    total = total_mb * 1024 * 1024 // 2
    chunk = chunk_kb * 1024 // 2
    nchunk = total // chunk
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(total).astype(np.float32),
                    dtype=jnp.bfloat16)
    q0 = jnp.zeros((8, 128), jnp.float32)
    interp = jax.default_backend() != "tpu"

    def make_run(page_kb):
        PAGE = page_kb * 1024 // 2
        ppc = chunk // PAGE
        npages = total // PAGE
        perm = rng.permutation(npages).astype(np.int32)

        def kernel(idx_ref, q_ref, x_hbm, o_ref, buf, sems, acc):
            def start(c):
                slot = c % nslot
                for i in range(ppc):
                    pid = idx_ref[c * ppc + i]
                    pltpu.make_async_copy(
                        x_hbm.at[pid], buf.at[slot, i],
                        sems.at[slot]).start()

            @pl.when(pl.program_id(0) == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)
                for d in range(nslot - 1):
                    start(d)

            c = pl.program_id(0)

            @pl.when(c + nslot - 1 < nchunk)
            def _():
                start(c + nslot - 1)
            slot = c % nslot
            pltpu.make_async_copy(buf.at[slot], buf.at[slot],
                                  sems.at[slot]).wait()
            acc[...] += buf[slot, 0, :8, :].astype(jnp.float32)

            @pl.when(c == nchunk - 1)
            def _():
                o_ref[...] = q_ref[...] + acc[...] * 1e-6

        @jax.jit
        def run(q, xx):
            xp = xx.reshape(npages, PAGE // 128, 128)
            return pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(nchunk,),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pl.ANY)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    scratch_shapes=[
                        pltpu.VMEM((nslot, ppc, PAGE // 128, 128),
                                   jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((nslot,)),
                        pltpu.VMEM((8, 128), jnp.float32),
                    ],
                ),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
                interpret=interp,
            )(jnp.asarray(perm), q, xp)

        return lambda q, env: run(q, env)

    runs = {pk: make_run(pk) for pk in pages_kb}
    nbytes = total * 2
    for r in range(rounds):
        for pk in pages_kb:
            t = bench_op(runs[pk], q0, iters=(8, 72), reps=5, env=x)
            print(f"round={r} page={pk}KB nslot={nslot} "
                  f"{t*1e6:.1f} us {nbytes/t/1e9:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
