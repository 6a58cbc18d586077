"""Same-process A/B: sparse-decode q rows at bf16/16 vs f32/8 tiles.

For MHA the [Gp, cols] per-block softmax work is all padding beyond
row 0; q_f32 halves Gp (f32 sublane tile is 8 vs bf16's 16). Times the
FULL pipeline (estimate -> exact_fast -> sparse) both ways at 32K/p32,
production layout, interleaved rounds.

Usage: python exp/qf32_ab.py [CTX] [PAGE]
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import sys

import numpy as np


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from quest_tpu.config import ModelConfig, QuestConfig
    from quest_tpu.kv.paged_kv import append_prefill_at, init_cache
    from quest_tpu.ops.estimate import page_scores_physical
    from quest_tpu.ops.sparse_decode import sparse_decode_attention
    from quest_tpu.ops.topk import select_pages
    from quest_tpu.utils.benchmarking import bench_op

    CTX = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    page = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    assert jax.default_backend() == "tpu"
    B, Hq, Hkv, D, BUDGET = 1, 32, 32, 128, 2048
    model = ModelConfig(num_heads=Hq, num_kv_heads=Hkv, head_dim=D)
    quest = QuestConfig(page_size=page, token_budget=BUDGET,
                        max_seq_len=CTX)
    S = quest.page_budget
    sm = 1.0 / np.sqrt(D)
    rng = np.random.default_rng(0)
    cache = init_cache(model, quest, batch_size=B, num_layers=1)
    bpp = cache.block_pages
    CH = min(8192, CTX)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill(cache, key, off):
        k1, k2 = jax.random.split(key)
        kn = jax.random.normal(k1, (B, CH, Hkv, D), jnp.float32) * 0.3
        vn = jax.random.normal(k2, (B, CH, Hkv, D), jnp.float32) * 0.3
        cache = append_prefill_at(cache, 0, kn, vn)
        return dataclasses.replace(
            cache, seq_lens=jnp.zeros((B,), jnp.int32) + off + CH)

    key = jax.random.PRNGKey(0)
    for off in range(0, CTX, CH):
        key, sub = jax.random.split(key)
        cache = fill(cache, sub, jnp.int32(off))
    np.asarray(cache.seq_lens)
    btab = cache.block_tab
    seq = jnp.asarray([CTX], jnp.int32)
    q = jnp.asarray((rng.standard_normal((B, Hq, D)) * 0.3)
                    .astype(np.float32))

    def fb(x, y):
        dep = jnp.tanh(jnp.sum(jnp.square(y.astype(jnp.float32)))) * 1e-3
        return (x + dep.astype(x.dtype)).astype(x.dtype)

    env = (cache.kv_pages, cache.k_max, cache.k_min, btab)

    def pipe(qf):
        def f(q, e):
            kv, km, kn_, tab = e
            s = page_scores_physical(q, km[0], kn_[0], tab,
                                     group_agg="sum")
            idx, nv = select_pages(s, seq, page, S, method="exact_fast")
            return fb(q, sparse_decode_attention(
                q, kv, idx, nv, seq, sm_scale=sm, layer=0,
                block_tab=tab, block_pages=bpp, q_f32=qf))
        return f

    for r in range(3):
        for qf in (False, True):
            t = bench_op(pipe(qf), q, iters=(8, 72), reps=5, env=env)
            print(f"round={r} q_f32={qf}: {t*1e6:.1f} us", flush=True)


if __name__ == "__main__":
    main()
