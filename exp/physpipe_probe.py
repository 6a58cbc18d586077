"""Decompose the whole-pool (production-layout) decode pipeline.

bench.py's switch from gathered logical views to the engine's real
layout (shared pool + block table + physical-block metadata) measured
the 32K/p32 pipeline at 482 us where the view-based A/B read 78-94 —
a constant ~+370 us somewhere in the physical path. This probe times
each stage in ONE process:

  full        estimate_phys -> select -> sparse(layer=0, block_tab)
  est_phys    the physical einsum + logical-score gather alone
  est_nogat   the physical einsum WITHOUT the take_along_axis gather
  est_logical page_scores on pre-materialized logical metadata (the
              old view path, metadata copies made once outside timing)
  sel_only    select_pages on (q-perturbed) precomputed scores
  sparse_only sparse decode with precomputed indices (whole-pool mode)
  sparse_view sparse decode with precomputed indices (view mode, on a
              pre-materialized [B,Hkv,P,...] copy)

Usage: python exp/physpipe_probe.py [CTX] [PAGE]
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
    from quest_tpu.kv.paged_kv import append_prefill_at, init_cache
    from quest_tpu.ops.estimate import page_scores, page_scores_physical
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
    import dataclasses
    import time

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
        t0 = time.perf_counter()
        cache = fill(cache, sub, jnp.int32(off))
        np.asarray(cache.seq_lens)
        print(f"fill@{off}: {time.perf_counter()-t0:.1f}s", flush=True)
    btab = cache.block_tab
    seq = jnp.asarray([CTX], jnp.int32)
    q = jnp.asarray((rng.standard_normal((B, Hq, D)) * 0.3)
                    .astype(np.float32))

    def fb(x, y):
        dep = jnp.tanh(jnp.sum(jnp.square(y.astype(jnp.float32)))) * 1e-3
        return (x + dep.astype(x.dtype)).astype(x.dtype)

    # Pre-materialized logical views (outside timing).
    view = cache.layer(0)
    km_l, kn_l = view.k_max, view.k_min
    kv_view = view.kv_pages
    scores0 = jax.jit(lambda q: page_scores_physical(
        q, cache.k_max[0], cache.k_min[0], btab, group_agg="sum"))(q)
    idx0, nv0 = jax.jit(lambda s: select_pages(
        s, seq, page, S, method="exact_fast"))(scores0)
    idx0, nv0 = jnp.asarray(idx0), jnp.asarray(nv0)

    env = (cache.kv_pages, cache.k_max, cache.k_min, btab)

    def full(q, e):
        kv, km, kn_, tab = e
        s = page_scores_physical(q, km[0], kn_[0], tab, group_agg="sum")
        idx, nv = select_pages(s, seq, page, S, method="exact_fast")
        return fb(q, sparse_decode_attention(
            q, kv, idx, nv, seq, sm_scale=sm, layer=0, block_tab=tab,
            block_pages=bpp))

    def est_phys(q, e):
        _, km, kn_, tab = e
        return fb(q, page_scores_physical(q, km[0], kn_[0], tab,
                                          group_agg="sum"))

    def est_nogat(q, e):
        _, km, kn_, tab = e
        Hk, NPB, bp_, D_ = km[0].shape
        kmf = km[0].reshape(Hk, NPB * bp_, D_).astype(jnp.float32)
        knf = kn_[0].reshape(Hk, NPB * bp_, D_).astype(jnp.float32)
        qf = q.astype(jnp.float32).reshape(B, Hk, Hq // Hk, D_)
        s = (jnp.einsum("bkgd,kpd->bkgp", jnp.maximum(qf, 0.0), kmf,
                        precision=jax.lax.Precision.HIGHEST)
             + jnp.einsum("bkgd,kpd->bkgp", jnp.minimum(qf, 0.0), knf,
                          precision=jax.lax.Precision.HIGHEST))
        return fb(q, s.sum(axis=2))

    def est_logical(q, e):
        return fb(q, page_scores(q, e[0], e[1], group_agg="sum"))

    def sel_only(q, e):
        s = e[0] + jnp.tanh(jnp.sum(q)) * 1e-6
        idx, nv = select_pages(s, seq, page, S, method="exact_fast")
        return fb(q, idx.astype(jnp.float32))

    def sparse_only(q, e):
        kv, idx, nv, tab = e
        return fb(q, sparse_decode_attention(
            q, kv, idx, nv, seq, sm_scale=sm, layer=0, block_tab=tab,
            block_pages=bpp))

    def sparse_view(q, e):
        kv, idx, nv = e
        return fb(q, sparse_decode_attention(
            q, kv, idx, nv, seq, sm_scale=sm))

    cases = [
        ("full", full, env),
        ("est_phys", est_phys, env),
        ("est_nogat", est_nogat, env),
        ("est_logical", est_logical, (km_l, kn_l)),
        ("sel_only", sel_only, (scores0,)),
        ("sparse_only", sparse_only,
         (cache.kv_pages, idx0, nv0, btab)),
        ("sparse_view", sparse_view, (kv_view, idx0, nv0)),
    ]
    for r in range(2):
        for name, f, e in cases:
            t = bench_op(f, q, iters=(8, 72), reps=5, env=e)
            print(f"round={r} {name}: {t*1e6:.1f} us", flush=True)


if __name__ == "__main__":
    main()
