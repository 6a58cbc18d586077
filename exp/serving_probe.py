"""Decompose the 32K serving-cfg gap: approx+fp8 145us vs exact_fast
bf16 84.9us (exp/r3_chip/bench_r3b.log) — the CHEAPER config reading
60us slower. One process, same cache, slope-timed A/B of:

  dense | pipelines {exact_fast, approx} x {bf16, fp8 metadata}
  components: page_scores bf16 vs fp8; select exact_fast vs approx

Usage: python exp/serving_probe.py [CTX]
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
    from quest_tpu.ops.dense_decode import dense_decode_attention
    from quest_tpu.ops.estimate import page_scores
    from quest_tpu.ops.sparse_decode import sparse_decode_attention
    from quest_tpu.ops.topk import select_pages
    from quest_tpu.utils.benchmarking import bench_op

    CTX = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
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
    CH = min(8192, CTX)
    fill = jax.jit(append_prefill, donate_argnums=(0,))
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
    f8 = jnp.float8_e4m3fn

    def fb(x, y):
        dep = jnp.tanh(jnp.sum(jnp.square(y.astype(jnp.float32)))) * 1e-3
        return (x + dep.astype(x.dtype)).astype(x.dtype)

    def env(meta_dtype=None):
        km, kn_ = layer.k_max, layer.k_min
        if meta_dtype is not None:
            km, kn_ = km.astype(meta_dtype), kn_.astype(meta_dtype)
        return (layer.kv_pages, km, kn_)

    t = bench_op(lambda q, e: fb(q, dense_decode_attention(
        q, e, seq, sm_scale=sm)), q, iters=iters, reps=reps,
        env=layer.kv_pages)
    log(f"dense {t*1e6:8.1f} us")

    # -------- full pipelines: method x metadata dtype --------
    def pipe(method):
        def step(q, e):
            kv_pages, kmax, kmin = e
            scores = page_scores(q, kmax, kmin)
            idx, nv = select_pages(scores, seq, page, S, method=method)
            return fb(q, sparse_decode_attention(q, kv_pages, idx, nv,
                                                 seq, sm_scale=sm))
        return step

    for method in ("exact_fast", "approx"):
        for name, dt in (("bf16", None), ("fp8", f8)):
            t = bench_op(pipe(method), q, iters=iters, reps=reps,
                         env=env(dt))
            log(f"pipe {method:10s} meta={name}: {t*1e6:8.1f} us")

    # -------- components --------
    for name, dt in (("bf16", None), ("fp8", f8)):
        def est_step(q, e):
            _, kmax, kmin = e
            return fb(q, page_scores(q, kmax, kmin))
        t = bench_op(est_step, q, iters=iters, reps=reps, env=env(dt))
        log(f"page_scores meta={name}: {t*1e6:8.1f} us")

    scores0 = jax.jit(lambda q, e: page_scores(q, e[1], e[2]))(q, env())
    np.asarray(scores0)
    for method in ("exact_fast", "approx", "exact"):
        def sel_step(q, e):
            # The selection input must depend on the carried q, or XLA
            # hoists select_pages out of the timing fori_loop entirely
            # (the r3 probe recorded 0.0 us for all methods this way —
            # ADVICE r3). A q-derived perturbation ~1e-6 of the score
            # scale keeps the op inside the loop without changing what
            # is measured.
            s = e + jnp.tanh(jnp.sum(q.astype(jnp.float32))) * 1e-6
            idx, nv = select_pages(s, seq, page, S, method=method)
            return fb(q, idx)
        t = bench_op(sel_step, q, iters=iters, reps=reps, env=scores0)
        log(f"select {method}: {t*1e6:8.1f} us")


if __name__ == "__main__":
    main()
