"""Round-5 decode-pipeline stage decomposition (one process, chip).

After the fast-path kernel landed at ~45 us (the raw gather ceiling),
the full exact pipeline still reads ~110 us — this probe splits the
difference into estimate / selection / kernel / composition overhead,
and A/Bs the q-row policies and the serving config, interleaved.

  dense        dense paged decode (denominator)
  est          page_scores_physical only (sum-of-SQUARES feedback:
               sum(dot) is algebraically reducible and hides the matmul)
  est_sel      estimate + select_pages(exact_fast)
  k_fast1      kernel only, injected fixed selection
  k_qpad8      kernel only, q_pad8 (8-row bf16 score matmul)
  k_qf32       kernel only, q_f32
  pipe         est + sel + kernel (defaults)
  pipe_qpad8   pipe with q_pad8 kernel
  pipe_nosort  pipe without the sort-by-page (does the monotonic HBM
               walk still matter at the ceiling?)
  serving      fp8 metadata + serving_method + default kernel

Usage: python exp/r5_pipe_probe.py --page 32 [--rounds 5] [--aot]
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import os as _os
import statistics
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import numpy as np

T0 = time.time()


def log(*a):
    print(f"[{time.time()-T0:6.1f}s]", *a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--page", type=int, default=32)
    ap.add_argument("--ctx", type=int, default=32768)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--aot", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/quest_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp

    from quest_tpu.config import ModelConfig, QuestConfig
    from quest_tpu.kv.paged_kv import append_prefill_at, init_cache
    from quest_tpu.ops.dense_decode import dense_decode_attention
    from quest_tpu.ops.estimate import page_scores_physical
    from quest_tpu.ops.sparse_decode import sparse_decode_attention
    from quest_tpu.ops.topk import select_pages, serving_method
    from quest_tpu.utils.benchmarking import bench_op

    on_tpu = jax.default_backend() == "tpu"
    B, Hq, Hkv, D = 1, 32, 32, 128
    ctx = args.ctx if on_tpu else 2048
    BUDGET = 2048 if on_tpu else 256
    page = args.page
    model = ModelConfig(num_heads=Hq, num_kv_heads=Hkv, head_dim=D)
    quest = QuestConfig(page_size=page, token_budget=BUDGET,
                        max_seq_len=ctx)
    S = quest.page_budget
    sm = 1.0 / np.sqrt(D)
    rng = np.random.default_rng(0)

    cache = init_cache(model, quest, batch_size=B, num_layers=1)
    bpp, maxp = cache.block_pages, cache.max_pages
    CH = min(8192, ctx)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill(cache, key, off):
        k1, k2 = jax.random.split(key)
        k_new = jax.random.normal(k1, (B, CH, Hkv, D), jnp.float32) * 0.3
        v_new = jax.random.normal(k2, (B, CH, Hkv, D), jnp.float32) * 0.3
        cache = append_prefill_at(cache, 0, k_new, v_new)
        return dataclasses.replace(
            cache, seq_lens=jnp.zeros((B,), jnp.int32) + off + CH)

    key = jax.random.PRNGKey(0)
    for off in range(0, ctx, CH):
        key, sub = jax.random.split(key)
        cache = fill(cache, sub, jnp.int32(off))
    np.asarray(cache.seq_lens)
    btab = cache.block_tab
    log("cache filled")
    seq = jnp.asarray([ctx], jnp.int32)
    q = jnp.asarray(
        (rng.standard_normal((B, Hq, D)) * 0.3).astype(np.float32))
    f8 = jnp.float8_e4m3fn
    km8 = cache.k_max.astype(f8)
    kn8 = cache.k_min.astype(f8)

    scores0 = page_scores_physical(q, cache.k_max[0], cache.k_min[0],
                                   btab, group_agg="sum")
    idx0, nv0 = select_pages(scores0, seq, page, S, method="exact")
    idx0 = jax.block_until_ready(idx0)
    sm_method = serving_method(quest.max_pages, S)
    log(f"selection fixed; serving_method={sm_method}")

    def fb(x, y):
        dep = jnp.tanh(jnp.sum(y.astype(jnp.float32))) * 1e-3
        return (x + dep.astype(x.dtype)).astype(x.dtype)

    def fbsq(x, y):
        dep = jnp.tanh(jnp.sum(jnp.square(
            y.astype(jnp.float32)))) * 1e-3
        return (x + dep.astype(x.dtype)).astype(x.dtype)

    def est_step(q, env):
        km, kn = env[2], env[3]
        s = page_scores_physical(q, km[0], kn[0], env[1],
                                 group_agg="sum")
        return fbsq(q, s)

    def est_sel_step(method, sort=True):
        def step(q, env):
            km, kn = env[2], env[3]
            s = page_scores_physical(q, km[0], kn[0], env[1],
                                     group_agg="sum")
            ii, nv = select_pages(s, seq, page, S, method=method,
                                  sort_by_page=sort)
            return fb(q, ii + nv[:, None, None])
        return step

    def kern_step(**kw):
        def step(q, env):
            return fb(q, sparse_decode_attention(
                q, env[0], idx0, nv0, seq, sm_scale=sm, layer=0,
                block_tab=env[1], block_pages=bpp, **kw))
        return step

    def pipe_step(method, sort=True, **kw):
        def step(q, env):
            km, kn = env[2], env[3]
            s = page_scores_physical(q, km[0], kn[0], env[1],
                                     group_agg="sum")
            ii, nv = select_pages(s, seq, page, S, method=method,
                                  sort_by_page=sort)
            return fb(q, sparse_decode_attention(
                q, env[0], ii, nv, seq, sm_scale=sm, layer=0,
                block_tab=env[1], block_pages=bpp, **kw))
        return step

    def dense_step(q, env):
        return fb(q, dense_decode_attention(
            q, env[0], seq, sm_scale=sm, layer=0, block_tab=env[1],
            block_pages=bpp, max_pages=maxp))

    env = (cache.kv_pages, btab, cache.k_max, cache.k_min)
    env8 = (cache.kv_pages, btab, km8, kn8)
    variants = [
        ("dense", dense_step, env, (8, 72)),
        ("est", est_step, env, (16, 264)),
        ("est8", est_step, env8, (16, 264)),
        ("est_sel", est_sel_step("exact_fast"), env, (16, 264)),
        ("est_sel_exact", est_sel_step("exact"), env, (16, 200)),
        ("k_fast1", kern_step(), env, (16, 264)),
        ("k_qpad8", kern_step(q_pad8=True), env, (16, 264)),
        ("k_qf32", kern_step(q_f32=True), env, (16, 264)),
        ("pipe", pipe_step("exact_fast"), env, (8, 144)),
        ("pipe_qpad8", pipe_step("exact_fast", q_pad8=True), env,
         (8, 144)),
        ("pipe_nosort", pipe_step("exact_fast", sort=False), env,
         (8, 144)),
        ("serving", pipe_step(sm_method, q_pad8=True), env8, (8, 144)),
    ]
    if not on_tpu:
        variants = [(n, s, e, (2, 6)) for n, s, e, _ in variants]

    if args.aot:
        for name, step, venv, _ in variants:
            t0 = time.time()
            jax.jit(step).lower(q, venv).compile()
            log(f"AOT {name}: ok in {time.time()-t0:.1f}s")
        print(json.dumps({"aot": "ok", "page": page}))
        return

    for name, step, venv, _ in variants:
        np.asarray(jax.jit(step)(q, venv))
        log(f"warm {name} ok")

    samples: dict[str, list] = {n: [] for n, _, _, _ in variants}
    for r in range(args.rounds):
        for name, step, venv, it in variants:
            t = bench_op(step, q, iters=it, reps=3, env=venv) * 1e6
            samples[name].append(t)
        log(f"round {r+1}/{args.rounds}: " + "  ".join(
            f"{n}={samples[n][-1]:.1f}" for n, _, _, _ in variants))

    out = {"page": page, "ctx": ctx}
    for name, vals in samples.items():
        out[name] = round(statistics.median(vals), 1)
        out[f"{name}_all"] = [round(v, 1) for v in vals]
    d = out.get("dense", 0)
    for name in ("pipe", "pipe_qpad8", "pipe_nosort", "serving"):
        if out.get(name):
            out[f"speedup_{name}"] = round(d / out[name], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
