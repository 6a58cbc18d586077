"""Same-process A/B: page_size 16 vs 32 full decode pipelines at equal
TOKEN budget (VERDICT r3 #2: 16 KB descriptors, half the metadata).

For each page size, builds a 32K cache and times the full unfused
pipeline (estimate -> verified-exact select -> sparse decode), its fp8-
metadata serving variant, and the shared dense baseline — all in ONE
process so ratios are valid (tunnel ±25% across processes).

Usage: python exp/page32_ab.py [CTX] [ROUNDS]
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from quest_tpu.config import ModelConfig, QuestConfig
    from quest_tpu.kv.paged_kv import LayerKV, append_prefill, init_cache
    from quest_tpu.ops.dense_decode import dense_decode_attention
    from quest_tpu.ops.estimate import page_scores
    from quest_tpu.ops.sparse_decode import sparse_decode_attention
    from quest_tpu.ops.topk import select_pages, serving_method
    from quest_tpu.utils.benchmarking import bench_op

    CTX = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    assert jax.default_backend() == "tpu"
    B, Hq, Hkv, D, BUDGET = 1, 32, 32, 128, 2048
    sm = 1.0 / np.sqrt(D)
    rng = np.random.default_rng(0)
    model = ModelConfig(num_heads=Hq, num_kv_heads=Hkv, head_dim=D)
    q = jnp.asarray((rng.standard_normal((B, Hq, D)) * 0.3)
                    .astype(np.float32))
    seq = jnp.asarray([CTX], jnp.int32)
    f8 = jnp.float8_e4m3fn

    def build(page):
        quest = QuestConfig(page_size=page, token_budget=BUDGET,
                            max_seq_len=CTX)
        cache = init_cache(model, quest, batch_size=B, num_layers=1)
        layer = cache.layer(0)
        CH = min(8192, CTX)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def fill(layer, key, off):
            k1, k2 = jax.random.split(key)
            kn = jax.random.normal(k1, (B, CH, Hkv, D), jnp.float32) * 0.3
            vn = jax.random.normal(k2, (B, CH, Hkv, D), jnp.float32) * 0.3
            layer = append_prefill(layer, kn, vn)
            return LayerKV(layer.kv_pages, layer.k_max, layer.k_min,
                           jnp.asarray([0], jnp.int32) + off + CH)

        key = jax.random.PRNGKey(0)
        for off in range(0, CTX, CH):
            key, sub = jax.random.split(key)
            layer = fill(layer, sub, jnp.int32(off))
        np.asarray(layer.seq_lens)
        return quest, layer

    def fb(x, y):
        dep = jnp.tanh(jnp.sum(jnp.square(y.astype(jnp.float32)))) * 1e-3
        return (x + dep.astype(x.dtype)).astype(x.dtype)

    builds = {p: build(p) for p in (16, 32)}
    print("caches filled", flush=True)

    def pipe(page, method, meta_dtype=None):
        quest, layer = builds[page]
        S = quest.page_budget
        km, kn_ = layer.k_max, layer.k_min
        if meta_dtype is not None:
            km, kn_ = km.astype(meta_dtype), kn_.astype(meta_dtype)
        env = (layer.kv_pages, km, kn_)

        def f(q, e):
            kv, kmax, kmin = e
            sc = page_scores(q, kmax, kmin, group_agg="sum")
            idx, nv = select_pages(sc, seq, page, S, method=method)
            return fb(q, sparse_decode_attention(q, kv, idx, nv, seq,
                                                 sm_scale=sm))
        return f, env

    def dense(page):
        _, layer = builds[page]
        return (lambda q, e: fb(q, dense_decode_attention(
            q, e, seq, sm_scale=sm))), layer.kv_pages

    variants = []
    for page in (16, 32):
        S = builds[page][0].page_budget
        m = serving_method(builds[page][0].max_pages, S)
        variants += [
            (f"exact_p{page}", pipe(page, "exact_fast")),
            (f"serving_fp8_p{page}", pipe(page, m, f8)),
        ]
    variants.append(("dense_p16", dense(16)))

    for r in range(ROUNDS):
        for name, (f, env) in variants:
            t = bench_op(f, q, iters=(8, 72), reps=5, env=env)
            print(f"round={r} {name}: {t*1e6:.1f} us", flush=True)


if __name__ == "__main__":
    main()
