"""Probe: Pallas streaming estimate inside the composed pipeline.

r4 measured page_scores_kernel faster standalone (794 GB/s vs the XLA
einsum's ~515) but +180 us of operand copies when composed with the
OLD sparse-decode custom call. The round-5 fast-path kernel has a
different operand layout; re-measure the composition. B=1 identity
block layout lets the physical metadata reshape [Hkv,NPB,bpp,D] ->
[1,Hkv,NP,D] for the kernel and the slot's logical scores are the
slice [bpp : bpp+P].

Usage: python exp/r5_pipe2.py --page 32 [--rounds 5] [--aot]
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
    import jax.numpy as jnp

    from quest_tpu.config import ModelConfig, QuestConfig
    from quest_tpu.kv.paged_kv import append_prefill_at, init_cache
    from quest_tpu.ops.dense_decode import dense_decode_attention
    from quest_tpu.ops.estimate import (page_scores_kernel,
                                        page_scores_physical)
    from quest_tpu.ops.sparse_decode import sparse_decode_attention
    from quest_tpu.ops.topk import select_pages, serving_method
    from quest_tpu.utils.benchmarking import bench_op

    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu
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
    sm_method = serving_method(quest.max_pages, S)

    def fb(x, y):
        dep = jnp.tanh(jnp.sum(y.astype(jnp.float32))) * 1e-3
        return (x + dep.astype(x.dtype)).astype(x.dtype)

    def fbsq(x, y):
        dep = jnp.tanh(jnp.sum(jnp.square(y.astype(jnp.float32)))) * 1e-3
        return (x + dep.astype(x.dtype)).astype(x.dtype)

    def est_pallas(q, km, kn, block_p):
        km, kn = km[0], kn[0]               # [Hkv, NPB, bpp, D]
        NP = km.shape[1] * km.shape[2]
        kml = km.reshape(Hkv, NP, D)[None]
        knl = kn.reshape(Hkv, NP, D)[None]
        s = page_scores_kernel(q, kml, knl, group_agg="sum",
                               block_p=block_p, interpret=interpret)
        return s[:, :, bpp:bpp + maxp]          # identity block layout

    def pipe_pallas(method, block_p=1024, **kw):
        def step(q, env):
            kv_pages, tab, km, kn = env
            s = est_pallas(q, km, kn, block_p)
            ii, nv = select_pages(s, seq, page, S, method=method)
            return fb(q, sparse_decode_attention(
                q, kv_pages, ii, nv, seq, sm_scale=sm, layer=0,
                block_tab=tab, block_pages=bpp, **kw))
        return step

    def pipe_xla(method, **kw):
        def step(q, env):
            kv_pages, tab, km, kn = env
            s = page_scores_physical(q, km[0], kn[0], tab,
                                     group_agg="sum")
            ii, nv = select_pages(s, seq, page, S, method=method)
            return fb(q, sparse_decode_attention(
                q, kv_pages, ii, nv, seq, sm_scale=sm, layer=0,
                block_tab=tab, block_pages=bpp, **kw))
        return step

    def est_pallas_only(q, env):
        kv_pages, tab, km, kn = env
        return fbsq(q, est_pallas(q, km, kn, 1024))

    def dense_step(q, env):
        return fb(q, dense_decode_attention(
            q, env[0], seq, sm_scale=sm, layer=0, block_tab=env[1],
            block_pages=bpp, max_pages=maxp))

    env = (cache.kv_pages, btab, cache.k_max, cache.k_min)
    env8 = (cache.kv_pages, btab, km8, kn8)
    variants = [
        ("dense", dense_step, env, (8, 72)),
        ("est_pallas", est_pallas_only, env, (16, 288)),
        ("pipe_xla", pipe_xla("exact_fast"), env, (16, 288)),
        ("pipe_pallas", pipe_pallas("exact_fast"), env, (16, 288)),
        ("pipe_pallas_bp512", pipe_pallas("exact_fast", block_p=512),
         env, (16, 288)),
        ("serving_xla", pipe_xla(sm_method), env8, (16, 288)),
        ("serving_pallas", pipe_pallas(sm_method), env8, (16, 288)),
    ]
    if not on_tpu:
        variants = [(n, s, e, (2, 6)) for n, s, e, _ in variants]

    if args.aot:
        for name, step, venv, _ in variants:
            t0 = time.time()
            jax.jit(step).lower(q, venv).compile()
            log(f"AOT {name}: ok in {time.time()-t0:.1f}s")
        print(json.dumps({"aot": "ok"}))
        return

    for name, step, venv, _ in variants:
        np.asarray(jax.jit(step)(q, venv))
        log(f"warm {name} ok")

    samples = {n: [] for n, _, _, _ in variants}
    for r in range(args.rounds):
        for name, step, venv, it in variants:
            t = bench_op(step, q, iters=it, reps=5, env=venv) * 1e6
            samples[name].append(t)
        log(f"round {r+1}/{args.rounds}: " + "  ".join(
            f"{n}={samples[n][-1]:.1f}" for n, _, _, _ in variants))

    out = {"page": page, "ctx": ctx}
    for n, v in samples.items():
        out[n] = round(statistics.median(v), 1)
        out[n + "_all"] = [round(x, 1) for x in v]
    d = out["dense"]
    for n in samples:
        if n != "dense":
            out[f"speedup_{n}"] = round(d / out[n], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
