"""Headline benchmark: Quest sparse self-attention vs dense paged decode.

Mirrors the reference's headline protocol (`BASELINE.md`: up to 7.03x
self-attention speedup vs FlashInfer dense at 32K ctx / 2048 token
budget / page 16 / 32 heads / fp16 on RTX 4090;
`/root/reference/kernels/src/bench/bench_batch_decode.cu:135-142`).

Measures, on one real TPU chip with bf16 KV cache:
  dense  = dense paged flash-decode over the full 32K cache
  sparse = estimate -> top-k -> sparse paged flash-decode (full Quest
           decode-attention pipeline, jitted as one function)
and reports speedup = t_dense / t_sparse.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from quest_tpu.config import ModelConfig, QuestConfig
    from quest_tpu.kv.paged_kv import LayerKV, append_prefill, init_cache
    from quest_tpu.ops.dense_decode import dense_decode_attention
    from quest_tpu.ops.estimate import page_scores
    from quest_tpu.ops.fused_decode import fused_sparse_decode
    from quest_tpu.ops.sparse_decode import sparse_decode_attention
    from quest_tpu.ops.topk import select_pages
    from quest_tpu.utils.benchmarking import bench_op

    on_tpu = jax.default_backend() == "tpu"
    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    # Slope-timed on device (utils/benchmarking.py): a fori_loop chain
    # with data-dependent feedback at two trip counts; fixed dispatch /
    # fetch costs cancel exactly. Big arrays ride `env`, not closures.
    def fb(x, y):
        dep = jnp.tanh(jnp.sum(y.astype(jnp.float32))) * 1e-3
        return (x + dep.astype(x.dtype)).astype(x.dtype)

    iters, reps = ((8, 72), 5) if on_tpu else ((2, 6), 2)
    rng = np.random.default_rng(0)

    def measure(CTX, BUDGET):
        B, Hq, Hkv, D, page = 1, 32, 32, 128, 16
        model = ModelConfig(num_heads=Hq, num_kv_heads=Hkv, head_dim=D)
        quest = QuestConfig(page_size=page, token_budget=BUDGET,
                            max_seq_len=CTX)
        S = quest.page_budget
        sm = 1.0 / np.sqrt(D)
        cache = init_cache(model, quest, batch_size=B, num_layers=1)
        layer = cache.layer(0)
        # Fill in chunks: a single bulk append's page-window RMW spans
        # the whole pool at 128K and OOMs alongside the staging arrays.
        CH = min(8192, CTX)
        fill = jax.jit(append_prefill, donate_argnums=(0,))
        for off in range(0, CTX, CH):
            k_new = (rng.standard_normal((B, CH, Hkv, D)) * 0.3).astype(
                np.float32)
            v_new = (rng.standard_normal((B, CH, Hkv, D)) * 0.3).astype(
                np.float32)
            layer = fill(layer, jnp.asarray(k_new), jnp.asarray(v_new))
            layer = LayerKV(layer.kv_pages, layer.k_max, layer.k_min,
                            jnp.asarray([off + CH], jnp.int32))
        seq = jnp.asarray([CTX], jnp.int32)
        q = jnp.asarray(
            (rng.standard_normal((B, Hq, D)) * 0.3).astype(np.float32))

        t_dense = bench_op(
            lambda q, env: fb(q, dense_decode_attention(q, env, seq,
                                                        sm_scale=sm)),
            q, iters=iters, reps=reps, env=layer.kv_pages)

        def make_sparse_step(method):
            def sparse_step(q, env):
                kv_pages, kmax, kmin = env
                scores = page_scores(q, kmax, kmin)
                idx, num_valid = select_pages(scores, seq, page, S,
                                              method=method)
                return fb(q, sparse_decode_attention(q, kv_pages, idx,
                                                     num_valid, seq,
                                                     sm_scale=sm))
            return sparse_step

        # Headline: the default engine configuration — the fused
        # decode megakernel (ops/fused_decode.py): estimate -> EXACT
        # in-kernel top-k -> gather -> flash decode in one Pallas
        # call, bf16 metadata. Same semantics as the unfused exact
        # pipeline (tests/test_fused_decode.py); the two memory
        # phases overlap instead of serializing.
        def fused_step(q, env):
            kv_pages, kmax, kmin = env
            return fb(q, fused_sparse_decode(q, kv_pages, kmax, kmin,
                                             seq, sm_scale=sm,
                                             budget_pages=S))
        # The unattended driver run must survive a megakernel compile
        # failure on an unseen Mosaic version — fall back to the
        # unfused pipeline's number rather than record nothing.
        try:
            t_fused = bench_op(fused_step, q, iters=iters, reps=reps,
                               env=(layer.kv_pages, layer.k_max,
                                    layer.k_min))
        except Exception as e:  # noqa: BLE001
            log(f"fused megakernel failed ({type(e).__name__}): {e}")
            t_fused = float("inf")

        # Unfused exact pipeline (estimate + select_pages + sparse
        # decode as separate calls). "exact_fast" is verified-exact:
        # approx_max_k + an exactness certificate with a lax.cond
        # fallback to the full sort — same selected set as lax.top_k
        # (ops/topk.py), ~2x faster selection.
        t_unfused = bench_op(make_sparse_step("exact_fast"), q,
                             iters=iters, reps=reps,
                             env=(layer.kv_pages, layer.k_max,
                                  layer.k_min))
        t_sparse = min(t_fused, t_unfused)
        log(f"fused {t_fused*1e6:.1f} us vs unfused {t_unfused*1e6:.1f}"
            f" us at {CTX}")

        # Secondary: the long-context serving configuration — fp8
        # (e4m3) metadata (meta_dtype, halves the estimate's HBM
        # traffic; tests/test_estimate_topk.py). Two implementations:
        # the fused megakernel (still EXACT selection) and the unfused
        # approx-top-k pipeline; report the faster.
        t_sparse_fast = None
        if on_tpu:
            f8 = jnp.float8_e4m3fn
            envf8 = (layer.kv_pages, layer.k_max.astype(f8),
                     layer.k_min.astype(f8))
            t_fast_unfused = bench_op(
                make_sparse_step("approx"), q, iters=iters, reps=reps,
                env=envf8)
            try:
                t_fast_fused = bench_op(fused_step, q, iters=iters,
                                        reps=reps, env=envf8)
            except Exception as e:  # noqa: BLE001
                log(f"fused fp8 failed ({type(e).__name__}): {e}")
                t_fast_fused = float("inf")
            log(f"serving: fused+fp8 {t_fast_fused*1e6:.1f} us vs "
                f"approx+fp8 {t_fast_unfused*1e6:.1f} us at {CTX}")
            t_sparse_fast = min(t_fast_unfused, t_fast_fused)
        return t_dense, t_sparse, t_sparse_fast

    # Reference headline config: 32K ctx, budget 2048, page 16, 32 heads.
    CTX = 32768 if on_tpu else 2048          # CPU smoke fallback
    BUDGET = 2048 if on_tpu else 256
    page, Hkv, D = 16, 32, 128
    t_dense, t_sparse, t_sparse_fast = measure(CTX, BUDGET)
    speedup = t_dense / t_sparse

    # Bytes-moved accounting (NVBench analogue,
    # `bench_batch_decode.cu:82-86`).
    bpe = 2  # bf16
    dense_bytes = 2 * Hkv * CTX * D * bpe
    sparse_bytes = (2 * Hkv * BUDGET * D * bpe            # selected pages
                    + 2 * Hkv * (CTX // page) * D * bpe)  # metadata
    log(f"dense:  {t_dense*1e6:8.1f} us  ({dense_bytes/t_dense/1e9:.0f} GB/s)")
    log(f"sparse: {t_sparse*1e6:8.1f} us  ({sparse_bytes/t_sparse/1e9:.0f} GB/s)")
    log(f"speedup: {speedup:.2f}x (reference headline: 7.03x)")

    result = {
        "metric": "self_attention_speedup_32k_budget2048",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup / 7.03, 3),
    }

    if on_tpu:
        log(f"serving config (approx topk + fp8 meta): "
            f"{t_sparse_fast*1e6:.1f} us ({t_dense/t_sparse_fast:.2f}x)")
        result["speedup_32k_serving_cfg"] = round(
            t_dense / t_sparse_fast, 3)
        # Long-context point (the reference's bench axes reach 131072;
        # its published headline is the 32K point above).
        td128, ts128, ts128f = measure(131072, 2048)
        log(f"128K: dense {td128*1e6:.0f} us, sparse {ts128*1e6:.0f} us, "
            f"speedup {td128/ts128:.2f}x (serving cfg "
            f"{td128/ts128f:.2f}x)")
        result["speedup_128k_budget2048"] = round(td128 / ts128, 3)
        result["speedup_128k_serving_cfg"] = round(td128 / ts128f, 3)
        result["dense_us_32k"] = round(t_dense * 1e6, 1)
        result["sparse_us_32k"] = round(t_sparse * 1e6, 1)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
