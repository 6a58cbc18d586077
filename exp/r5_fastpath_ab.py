"""Round-5 sparse-decode fast-path A/B (one process, interleaved).

The r4 sparse kernel ran the headline geometry (whole selection in one
block, nb==1) through the general online-softmax kernel at ~450 GB/s
effective vs the ~700 GB/s raw gather ceiling — compute/step-overhead
bound. Round 5 adds `_kernel_1blk` (ops/sparse_decode.py): one-shot
softmax, hb heads per grid step, VPU work on an 8-row f32 slice.

This probe measures, at 32K ctx / 2048 token budget / 32 MHA heads on
the real chip, interleaved within ONE process (R rounds, median):
  dense     dense paged decode (the ratio's denominator)
  gen       general kernel forced via pages_per_block = S//2 (nb=2)
  fast1     _kernel_1blk, heads_per_block=1
  fast2     _kernel_1blk, heads_per_block=2
  fast4     _kernel_1blk, heads_per_block=4, num_slots=2 (8 MB ring)
  fast2_qf32  fast2 with the f32-query MXU operand mix
  pipe      full pipeline (estimate -> topk -> fast-path kernel, auto)

Usage:  python exp/r5_fastpath_ab.py --page 32 [--aot] [--rounds 5]
  --aot: AOT-compile every variant (lower+compile, nothing executes —
         the safe way to smoke Mosaic; a kernel fault on this chip
         wedges the worker for ~30 min).
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
    ap.add_argument("--fp8", action="store_true",
                    help="also probe an fp8 KV pool variant")
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
    from quest_tpu.ops.topk import select_pages
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
    iters, reps = ((8, 72), 3) if on_tpu else ((2, 6), 2)

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

    # Fixed injected selection (same set for every kernel variant): a
    # REAL selection from the estimate, so the gather pattern matches
    # production (sorted by page id, junk-free).
    scores = page_scores_physical(q, cache.k_max[0], cache.k_min[0],
                                  btab, group_agg="sum")
    idx, num_valid = select_pages(scores, seq, page, S, method="exact")
    idx = jax.block_until_ready(idx)
    log("selection fixed")

    def fb(x, y):
        dep = jnp.tanh(jnp.sum(y.astype(jnp.float32))) * 1e-3
        return (x + dep.astype(x.dtype)).astype(x.dtype)

    def kern_step(**kw):
        def step(q, env):
            kv_pages, tab, sel = env
            return fb(q, sparse_decode_attention(
                q, kv_pages, sel, num_valid, seq, sm_scale=sm,
                layer=0, block_tab=tab, block_pages=bpp, **kw))
        return step

    def dense_step(q, env):
        kv_pages, tab, sel = env
        return fb(q, dense_decode_attention(
            q, kv_pages, seq, sm_scale=sm, layer=0, block_tab=tab,
            block_pages=bpp, max_pages=maxp))

    def pipe_step(q, env):
        kv_pages, tab, sel = env
        scores = page_scores_physical(q, cache.k_max[0], cache.k_min[0],
                                      tab, group_agg="sum")
        ii, nv = select_pages(scores, seq, page, S, method="exact_fast")
        return fb(q, sparse_decode_attention(
            q, kv_pages, ii, nv, seq, sm_scale=sm, layer=0,
            block_tab=tab, block_pages=bpp))

    env = (cache.kv_pages, btab, idx)
    variants = [
        ("dense", dense_step, env),
        ("gen", kern_step(pages_per_block=max(8, S // 2)), env),
        ("fast1", kern_step(heads_per_block=1), env),
        ("fast2", kern_step(heads_per_block=2), env),
        ("fast4", kern_step(heads_per_block=4, num_slots=2), env),
        ("fast2_qf32", kern_step(heads_per_block=2, q_f32=True), env),
        ("pipe", pipe_step, env),
    ]
    if args.fp8:
        kv8 = cache.kv_pages.astype(jnp.float8_e4m3fn)
        variants.append(("fast2_fp8", kern_step(heads_per_block=2),
                         (kv8, btab, idx)))

    if args.aot:
        for name, step, venv in variants:
            t0 = time.time()
            jax.jit(step).lower(q, venv).compile()
            log(f"AOT {name}: ok in {time.time()-t0:.1f}s")
        print(json.dumps({"aot": "ok", "page": page}))
        return

    # Pinned warm-up (compile + one run each), then interleaved rounds.
    for name, step, venv in variants:
        r = jax.jit(step)(q, venv)
        np.asarray(r)
        log(f"warm {name} ok")

    samples: dict[str, list] = {name: [] for name, _, _ in variants}
    # Light kernels (~30-80 us/iter) need LONGER chains: at (8,72) the
    # hi run is ~2-4 ms total, below the tunnel's dispatch jitter, and
    # slopes read 0.5-60 us on an unchanged kernel. Scale the trip
    # counts so the hi chain is >= ~15 ms of device work.
    heavy = {"dense", "pipe"}
    light_iters = (16, 264) if on_tpu else iters
    for r in range(args.rounds):
        for name, step, venv in variants:
            it = iters if name in heavy else light_iters
            t = bench_op(step, q, iters=it, reps=reps, env=venv) * 1e6
            samples[name].append(t)
        log(f"round {r+1}/{args.rounds}: " + "  ".join(
            f"{n}={samples[n][-1]:.1f}" for n, _, _ in variants))

    out = {"page": page, "ctx": ctx}
    for name, vals in samples.items():
        out[name] = round(statistics.median(vals), 1)
        out[f"{name}_all"] = [round(v, 1) for v in vals]
    d = out.get("dense", 0)
    for name in samples:
        if name != "dense" and out[name]:
            out[f"speedup_{name}"] = round(d / out[name], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
