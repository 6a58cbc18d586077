"""Probe: round-5 glue cuts (sorted_selection static lastslot +
in-kernel block-table translation) and a stacked-metadata single-einsum
estimate emulation.

  dense          baseline
  pipe_old       exact pipeline, sorted_selection=False (r4 glue)
  pipe_new       exact pipeline, sorted_selection=True (new default)
  serving_new    serving cfg with the same
  est_split      current two-einsum estimate (f32-HI)
  est_stacked    single einsum over a PRE-STACKED [Hkv, NP, 2, D]
                 metadata array (emulates an interleaved storage
                 layout; 256-deep contraction, one stream pass)

Usage: python exp/r5_pipe4.py [--rounds 5] [--aot]
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
    sm_method = serving_method(quest.max_pages, S)

    # Pre-stacked metadata [Hkv, NP, 2, D] (emulated storage layout).
    NPB, bpp_, D_ = cache.k_max.shape[2], cache.k_max.shape[3], D
    NP = NPB * bpp_
    kmm = jnp.stack([cache.k_max[0].reshape(Hkv, NP, D),
                     cache.k_min[0].reshape(Hkv, NP, D)], axis=2)
    kmm = jax.block_until_ready(kmm)

    def fb(x, y):
        dep = jnp.tanh(jnp.sum(y.astype(jnp.float32))) * 1e-3
        return (x + dep.astype(x.dtype)).astype(x.dtype)

    def fbsq(x, y):
        dep = jnp.tanh(jnp.sum(jnp.square(y.astype(jnp.float32)))) * 1e-3
        return (x + dep.astype(x.dtype)).astype(x.dtype)

    HI = jax.lax.Precision.HIGHEST

    def est_split_step(q, e):
        s = page_scores_physical(q, e[2][0], e[3][0], e[1],
                                 group_agg="sum")
        return fbsq(q, s)

    def est_stacked_step(q, e):
        kmm = e[4]
        qf = q.astype(jnp.float32).reshape(B, Hkv, 1, D)
        qc = jnp.concatenate([jnp.maximum(qf, 0.0),
                              jnp.minimum(qf, 0.0)], axis=2)  # [B,Hkv,2,D]
        s = jnp.einsum("bkrd,kprd->bkp", qc, kmm, precision=HI,
                       preferred_element_type=jnp.float32)
        sel = jax.nn.one_hot(e[1], NPB, dtype=s.dtype)
        s_log = jnp.einsum("bhNp,bnN->bhnp",
                           s.reshape(B, Hkv, NPB, bpp_), sel,
                           precision=HI)
        return fbsq(q, s_log.reshape(B, Hkv, -1))

    def pipe_step(method, sorted_sel, env8=False, **kw):
        def step(q, e):
            s = page_scores_physical(q, e[2][0], e[3][0], e[1],
                                     group_agg="sum")
            ii, nv = select_pages(s, seq, page, S, method=method)
            return fb(q, sparse_decode_attention(
                q, e[0], ii, nv, seq, sm_scale=sm, layer=0,
                block_tab=e[1], block_pages=bpp,
                sorted_selection=sorted_sel, **kw))
        return step

    def dense_step(q, e):
        return fb(q, dense_decode_attention(
            q, e[0], seq, sm_scale=sm, layer=0, block_tab=e[1],
            block_pages=bpp, max_pages=maxp))

    env = (cache.kv_pages, btab, cache.k_max, cache.k_min, kmm)
    env8 = (cache.kv_pages, btab, km8, kn8, kmm)
    variants = [
        ("dense", dense_step, env, (8, 72)),
        ("est_split", est_split_step, env, (16, 288)),
        ("est_stacked", est_stacked_step, env, (16, 288)),
        ("pipe_old", pipe_step("exact_fast", False), env, (16, 288)),
        ("pipe_new", pipe_step("exact_fast", True), env, (16, 288)),
        ("serving_new", pipe_step(sm_method, True), env8, (16, 288)),
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
