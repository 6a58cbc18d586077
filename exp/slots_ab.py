"""Re-verify the gather slot-ring default with the FIXED timer.

The 128/3 default was tuned before utils/benchmarking.py switched to
interleaved lo/hi pairs + median (the old consecutive-block form
under-read slopes by up to 2x). One process, 32K exact_fast pipeline,
num_slots in {2,3,4}, each measured twice for stability.

Usage: python exp/slots_ab.py
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import numpy as np

T0 = time.time()


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      _os.environ.get("QUEST_JAX_CACHE",
                                      "/tmp/quest_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from quest_tpu.config import ModelConfig, QuestConfig
    from quest_tpu.kv.paged_kv import LayerKV, append_prefill, init_cache
    from quest_tpu.ops.estimate import page_scores
    from quest_tpu.ops.sparse_decode import sparse_decode_attention
    from quest_tpu.ops.topk import select_pages
    from quest_tpu.utils.benchmarking import bench_op

    CTX = 32768
    log("imports done, backend", jax.default_backend())
    B, Hq, Hkv, D, page, BUDGET = 1, 32, 32, 128, 16, 2048
    model = ModelConfig(num_heads=Hq, num_kv_heads=Hkv, head_dim=D)
    quest = QuestConfig(page_size=page, token_budget=BUDGET,
                        max_seq_len=CTX)
    S = quest.page_budget
    sm = 1.0 / np.sqrt(D)
    rng = np.random.default_rng(0)
    cache = init_cache(model, quest, batch_size=B, num_layers=1)
    layer = cache.layer(0)
    fill = jax.jit(append_prefill, donate_argnums=(0,))
    CH = 8192
    for off in range(0, CTX, CH):
        kn = (rng.standard_normal((B, CH, Hkv, D)) * 0.3).astype(np.float32)
        vn = (rng.standard_normal((B, CH, Hkv, D)) * 0.3).astype(np.float32)
        layer = fill(layer, jnp.asarray(kn), jnp.asarray(vn))
        layer = LayerKV(layer.kv_pages, layer.k_max, layer.k_min,
                        jnp.asarray([off + CH], jnp.int32))
        np.asarray(layer.seq_lens)
        log(f"fill chunk @{off}")
    seq = jnp.asarray([CTX], jnp.int32)
    q = jnp.asarray((rng.standard_normal((B, Hq, D)) * 0.3).astype(np.float32))
    iters, reps = (8, 72), 3

    def fb(x, y):
        dep = jnp.tanh(jnp.sum(jnp.square(y.astype(jnp.float32)))) * 1e-3
        return (x + dep.astype(x.dtype)).astype(x.dtype)

    env = (layer.kv_pages, layer.k_max, layer.k_min)

    def pipe(nslots):
        def step(q, e):
            kv_pages, kmax, kmin = e
            scores = page_scores(q, kmax, kmin)
            idx, nv = select_pages(scores, seq, page, S,
                                   method="exact_fast")
            return fb(q, sparse_decode_attention(
                q, kv_pages, idx, nv, seq, sm_scale=sm,
                num_slots=nslots))
        return step

    for nslots in (2, 3, 4):
        for rep in range(2):
            t = bench_op(pipe(nslots), q, iters=iters, reps=reps, env=env)
            log(f"pipeline slots={nslots} rep{rep}: {t*1e6:8.1f} us")


if __name__ == "__main__":
    main()
