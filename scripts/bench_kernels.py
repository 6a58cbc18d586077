"""Kernel-level benchmark suite — the NVBench analogue.

Reference counterpart: `kernels/src/bench/bench_*.cu` driven by
`scripts/bench_kernels.sh` (`/root/reference/kernels/src/bench/`,
axes per `bench_batch_decode.cu:135-142`: seqlen {4k..64k} x
page_budget {64..512}; every bench reports bytes moved -> achieved
bandwidth).

Each stage of the Quest decode pipeline is timed on-device with the
slope method (utils/benchmarking.py) and reported with its bytes-moved
accounting so achieved bandwidth can be compared against HBM speed of
light (~819 GB/s on v5e).

Usage:
    python scripts/bench_kernels.py [--ctx 32768] [--budget 2048]
        [--heads 32] [--kv-heads 32] [--stages all|estimate,topk,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=32768)
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--page", type=int, default=16)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--kv-heads", type=int, default=32)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--stages", type=str, default="all")
    ap.add_argument("--iters", type=str, default="4,36",
                    help="fori_loop trip counts for the slope method "
                         "(big kernels; cheap stages use 8x these)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from quest_tpu.config import ModelConfig, QuestConfig
    from quest_tpu.kv.paged_kv import (LayerKV, append_decode,
                                       append_prefill, init_cache)
    from quest_tpu.ops.dense_decode import dense_decode_attention
    from quest_tpu.ops.estimate import page_scores
    from quest_tpu.ops.sparse_decode import sparse_decode_attention
    from quest_tpu.ops.topk import select_pages
    from quest_tpu.utils.benchmarking import bench_op

    B, Hq, Hkv, D = args.batch, args.heads, args.kv_heads, args.head_dim
    page, CTX, BUDGET = args.page, args.ctx, args.budget
    iters = tuple(int(x) for x in args.iters.split(","))
    # Cheap stages (<100 us) need ~8x the trip count to rise above the
    # tunnel's per-dispatch noise floor.
    iters_cheap = (iters[0] * 8, iters[1] * 8)
    model = ModelConfig(num_heads=Hq, num_kv_heads=Hkv, head_dim=D)
    quest = QuestConfig(page_size=page, token_budget=BUDGET,
                        max_seq_len=CTX)
    S = quest.page_budget
    P = quest.max_pages
    sm = 1.0 / np.sqrt(D)
    bpe = 2  # bf16
    log(f"backend={jax.default_backend()} B={B} Hq={Hq} Hkv={Hkv} D={D} "
        f"ctx={CTX} pages={P} budget={BUDGET} ({S} page slots)")

    rng = np.random.default_rng(0)
    cache = init_cache(model, quest, batch_size=B, num_layers=1)
    layer = cache.layer(0)
    k_new = (rng.standard_normal((B, CTX, Hkv, D)) * 0.3).astype(np.float32)
    v_new = (rng.standard_normal((B, CTX, Hkv, D)) * 0.3).astype(np.float32)
    layer = append_prefill(layer, jnp.asarray(k_new), jnp.asarray(v_new))
    seq = jnp.full((B,), CTX, jnp.int32)
    layer = LayerKV(layer.kv_pages, layer.k_max, layer.k_min, seq)
    q0 = jnp.asarray(
        (rng.standard_normal((B, Hq, D)) * 0.3).astype(np.float32))
    scores0 = page_scores(q0, layer.k_max, layer.k_min)
    idx0, nv0 = select_pages(scores0, seq, page, S)

    meta_bytes = 2 * B * Hkv * P * D * bpe
    pages_bytes = 2 * B * Hkv * S * page * D * bpe
    dense_bytes = 2 * B * Hkv * CTX * D * bpe

    results = {}

    def report(name, t, nbytes):
        results[name] = t
        log(f"{name:16s} {t*1e6:9.1f} us   {nbytes/t/1e9:7.1f} GB/s "
            f"({nbytes/1e6:.1f} MB)")

    want = (set(args.stages.split(","))
            if args.stages != "all" else
            {"estimate", "topk", "sparse", "dense", "append", "prefill",
             "pipeline"})

    def fb(x, y):  # scalar feedback so the loop body can't be elided
        # sum(square(y)) — NOT sum(y): for linear stages (estimate) XLA
        # rewrites reduce(dot) -> dot(reduce), eliding the HBM traffic
        # being measured (see verify SKILL.md).
        dep = jnp.tanh(jnp.sum(jnp.square(y.astype(jnp.float32)))) * 1e-3
        return (x + dep.astype(x.dtype)).astype(x.dtype)

    if "estimate" in want:
        t = bench_op(
            lambda q, env: fb(q, page_scores(q, env[0], env[1])),
            q0, iters=iters_cheap, env=(layer.k_max, layer.k_min))
        report("estimate", t, meta_bytes)

    if "topk" in want:
        def topk_step(s):
            idx, nv = select_pages(s, seq, page, S)
            return fb(s, idx)
        t = bench_op(topk_step, scores0, iters=iters_cheap)
        report("topk", t, B * Hkv * P * 4)

    if "sparse" in want:
        t = bench_op(
            lambda q, env: fb(q, sparse_decode_attention(
                q, env[0], env[1], env[2], seq, sm_scale=sm)),
            q0, iters=iters, env=(layer.kv_pages, idx0, nv0))
        report("sparse_attn", t, pages_bytes)

    if "dense" in want:
        t = bench_op(
            lambda q, env: fb(q, dense_decode_attention(
                q, env, seq, sm_scale=sm)),
            q0, iters=iters, env=layer.kv_pages)
        report("dense_attn", t, dense_bytes)

    if "append" in want:
        kv1 = q0[:, :Hkv, :]

        def append_step(lay):
            out = append_decode(lay, kv1, kv1)
            return LayerKV(out.kv_pages, out.k_max, out.k_min,
                           lay.seq_lens)
        t = bench_op(append_step, layer, iters=iters_cheap)
        report("append_decode", t, 2 * B * Hkv * (page + 2) * D * bpe)

    if "prefill" in want:
        # NVBench analogue of `bench_prefill.cu`: causal flash-prefill
        # of a CHUNK tokens chunk at the END of the full context (the
        # hardest window: it attends to everything). Reports achieved
        # MXU throughput; FLOPs = 2 matmuls x 2 MACs x CHUNK x CTX x D
        # per head.
        from quest_tpu.ops.prefill import prefill_attention
        CHUNK = min(2048, CTX)
        qp = jnp.asarray(
            (rng.standard_normal((B, CHUNK, Hq, D)) * 0.3).astype(
                np.float32))
        offs = jnp.full((B,), CTX - CHUNK, jnp.int32)

        def prefill_step(qp, env):
            o = prefill_attention(qp, env, offs, seq, sm_scale=sm)
            return fb(qp, o)
        t = bench_op(prefill_step, qp, iters=iters_cheap,
                     env=layer.kv_pages)
        flops = 2 * 2 * B * Hq * CHUNK * (CTX - CHUNK / 2) * D
        log(f"{'prefill':16s} {t*1e6:9.1f} us   "
            f"{flops/t/1e12:7.1f} TFLOP/s (chunk {CHUNK} @ end of {CTX})")
        results["prefill"] = t

    if "pipeline" in want:
        def pipe_step(q, env):
            kv_pages, kmax, kmin = env
            s = page_scores(q, kmax, kmin)
            idx, nv = select_pages(s, seq, page, S)
            o = sparse_decode_attention(q, kv_pages, idx, nv, seq,
                                        sm_scale=sm)
            return fb(q, o)
        t = bench_op(pipe_step, q0, iters=iters,
                     env=(layer.kv_pages, layer.k_max, layer.k_min))
        report("sparse_pipeline", t, meta_bytes + pages_bytes)

    print(json.dumps({k: round(v * 1e6, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
