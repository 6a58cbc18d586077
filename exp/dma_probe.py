"""Raw HBM->VMEM DMA bandwidth probe.

Usage: python exp/dma_probe.py MODE CHUNK_KB NSLOT [TOTAL_MB] [NSEM] [PAGE_KB]
  MODE: contig | gather | gather_hi
contig:   stream TOTAL_MB contiguously in CHUNK_KB chunks, NSLOT ring.
gather:   same bytes, but chunks picked by a random page permutation
          (PAGE_KB pages, default 8) -- CHUNK_KB//PAGE_KB descriptors
          per chunk-slot. PAGE_KB=16/32 simulates page_size=32/64 in
          the sparse-decode gather (one [2, page, D] descriptor per
          page is 8 KB at page 16).
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
    page_kb = int(sys.argv[6]) if len(sys.argv) > 6 else 8

    import os
    import jax
    if os.environ.get("QT_CPU"):  # axon plugin re-pins JAX_PLATFORMS
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from quest_tpu.utils.benchmarking import bench_op

    PAGE = page_kb * 1024 // 2  # bf16 elems per gather descriptor
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

    def kernel(idx_ref, q_ref, x_hbm, o_ref, buf, sems, acc):
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
            # The timing carry flows THROUGH the kernel (out = q +
            # tiny*acc): the chain's next iteration consumes this
            # output, so XLA structurally cannot hoist the kernel out
            # of the timing loop. (The earlier form returned a
            # q-independent value and was hoisted/elided on some
            # shapes — measured "890-17828 GB/s", above HBM peak.)
            o_ref[...] = q_ref[...] + acc[...] * 1e-6

    @jax.jit
    def run(q, x):
        xp = x.reshape(npages, PAGE // 128, 128)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nchunk,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pl.ANY)],
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
        )(jnp.asarray(perm), q, xp)

    x = jnp.asarray(rng.standard_normal(total).astype(np.float32),
                    dtype=jnp.bfloat16)

    if jax.default_backend() != "tpu":  # correctness smoke only
        out = np.asarray(run(jnp.zeros((8, 128), jnp.float32), x))
        xs = np.asarray(x).reshape(npages, PAGE // 128, 128)
        if is_gather:
            order = perm
        else:
            order = np.arange(npages)
        first = order[::pages_per_chunk]  # page 0 of each chunk
        want = xs[first, :8, :].astype(np.float32).sum(0) * 1e-6
        ok = np.allclose(out, want, rtol=1e-2, atol=1e-5)
        print(f"{mode} chunk={chunk_kb}KB nslot={nslot} nsem={nsem} "
              f"page={page_kb}KB interpret "
              f"{'OK' if ok else 'MISMATCH'}", flush=True)
        return

    def step(q, env):
        # The carry q flows THROUGH the kernel (see o_ref write): the
        # next iteration's input is the kernel's output, so the kernel
        # cannot be hoisted out of the timing loop. (Both a
        # q-independent kernel and an optimization_barrier-tied operand
        # were hoisted/elided on some shapes — measured "890-17828
        # GB/s", far above the 819 GB/s HBM peak.)
        return run(q, env)

    q0 = jnp.zeros((8, 128), jnp.float32)
    # iters must put the slope signal well above tunnel jitter: at
    # (4, 24) the 20-iter delta (~2.6 ms for a 64 MB stream) drowned in
    # per-dispatch latency noise — three consecutive runs of the SAME
    # variant read 24.5 us, 95.2 us, and "0.0 us" (clipped negative
    # slope). (8, 72) x 5 reps matches bench.py's proven settings.
    t = bench_op(step, q0, iters=(8, 72), reps=5, env=x)
    nbytes = total * 2
    print(f"{mode} chunk={chunk_kb}KB nslot={nslot} nsem={nsem} "
          f"page={page_kb}KB {t*1e6:.1f} us "
          f"{nbytes/t/1e9:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
