"""Raw HBM->VMEM DMA bandwidth probe.

Usage: python exp/dma_probe.py MODE CHUNK_KB NSLOT [TOTAL_MB] [NSEM]
  MODE: contig | gather | gather_hi
contig:   stream TOTAL_MB contiguously in CHUNK_KB chunks, NSLOT ring.
gather:   same bytes, but chunks picked by a random page permutation
          (8 KB pages) -- CHUNK_KB//8 descriptors per chunk-slot.
gather_hi: gather with priority=0 on DMA start.
NSEM > 1 stripes each chunk across NSEM semaphores (contiguous
page ranges per semaphore) — probes whether distinct semaphores map
to distinct DMA queues/engines.

Prints: `MODE chunk nslot us GB/s`.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import functools

import numpy as np


def main():
    mode = sys.argv[1]
    chunk_kb = int(sys.argv[2])
    nslot = int(sys.argv[3])
    total_mb = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    nsem = int(sys.argv[5]) if len(sys.argv) > 5 else 1

    import os
    import jax
    if os.environ.get("QT_CPU"):  # axon plugin re-pins JAX_PLATFORMS
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from quest_tpu.utils.benchmarking import bench_op

    PAGE = 8192 // 2  # 4096 bf16 elems = 8KB
    total = total_mb * 1024 * 1024 // 2          # bf16 elems
    chunk = chunk_kb * 1024 // 2                 # elems per chunk
    nchunk = total // chunk
    pages_per_chunk = chunk // PAGE
    npages = total // PAGE

    rng = np.random.default_rng(0)
    perm = rng.permutation(npages).astype(np.int32)

    hi = mode == "gather_hi"
    is_gather = mode.startswith("gather")

    assert pages_per_chunk % nsem == 0
    pps = pages_per_chunk // nsem            # pages per semaphore

    def kernel(idx_ref, x_hbm, o_ref, buf, sems, acc):
        def start(c):
            slot = c % nslot
            if is_gather:
                for i in range(pages_per_chunk):
                    pid = idx_ref[c * pages_per_chunk + i]
                    cp = pltpu.make_async_copy(
                        x_hbm.at[pid], buf.at[slot, i],
                        sems.at[slot, i // pps])
                    if hi:
                        cp.start(priority=0)
                    else:
                        cp.start()
            else:
                for s in range(nsem):
                    pltpu.make_async_copy(
                        x_hbm.at[pl.ds(c * pages_per_chunk + s * pps,
                                       pps)],
                        buf.at[slot, pl.ds(s * pps, pps)],
                        sems.at[slot, s]).start()

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
        for s in range(nsem):
            pltpu.make_async_copy(buf.at[slot, pl.ds(s * pps, pps)],
                                  buf.at[slot, pl.ds(s * pps, pps)],
                                  sems.at[slot, s]).wait()
        acc[...] += buf[slot, 0, :8, :].astype(jnp.float32)

        @pl.when(c == nchunk - 1)
        def _():
            o_ref[...] = acc[...]

    @jax.jit
    def run(x):
        xp = x.reshape(npages, PAGE // 128, 128)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nchunk,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((nslot, pages_per_chunk, PAGE // 128, 128),
                               jnp.bfloat16),
                    pltpu.SemaphoreType.DMA((nslot, nsem)),
                    pltpu.VMEM((8, 128), jnp.float32),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=jax.default_backend() != "tpu",
        )(jnp.asarray(perm), xp)

    x = jnp.asarray(rng.standard_normal(total).astype(np.float32),
                    dtype=jnp.bfloat16)

    if jax.default_backend() != "tpu":  # correctness smoke only
        out = np.asarray(run(x))
        xs = np.asarray(x).reshape(npages, PAGE // 128, 128)
        if is_gather:
            order = perm
        else:
            order = np.arange(npages)
        first = order[::pages_per_chunk]  # page 0 of each chunk
        want = xs[first, :8, :].astype(np.float32).sum(0)
        ok = np.allclose(out, want, rtol=1e-2, atol=1e-2)
        print(f"{mode} chunk={chunk_kb}KB nslot={nslot} nsem={nsem} interpret "
              f"{'OK' if ok else 'MISMATCH'}", flush=True)
        return

    def step(q, env):
        out = run(env)
        dep = jnp.tanh(jnp.sum(jnp.square(out))) * 1e-3
        return (q + dep).astype(q.dtype)

    q0 = jnp.zeros((8, 128), jnp.float32)
    t = bench_op(step, q0, iters=(4, 24), reps=4, env=x)
    nbytes = total * 2
    print(f"{mode} chunk={chunk_kb}KB nslot={nslot} nsem={nsem} {t*1e6:.1f} us "
          f"{nbytes/t/1e9:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
