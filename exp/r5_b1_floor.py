"""Batch-1 128K decode-step floor decomposition (VERDICT r4 #8).

The b1 e2e ratio is stuck at 1.90-1.94x across rounds (6.95 ms/tok vs
13.2 control) while the attention kernel got 20% faster — so the step
is NOT attention-bound. This probe splits the 6.95 ms into:

  compute floor   frozen-cache step (weights + attention reads, no
                  append, no host dispatch) via the device-side slope
                  timer — the cache rides `env` so the fori_loop chain
                  carries only [B, hid] activations (a cache-carrying
                  chain would copy the pool every iteration).
  + append        measured separately as floor(with append through a
                  donated single-dispatch jit) is not loopable; instead
                  the HOST-LOOP per-token time minus the compute floor
                  bounds append + dispatch overhead together.

Variants: serving config (2 dense skip layers at 128K) and all-sparse
(skip=0) to price the dense skip layers; weights-only (attention
removed) to price the int8 weight stream.

Usage: python exp/r5_b1_floor.py [--cpu]
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
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=131072)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/quest_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from quest_tpu.config import llama31_8b, serving_quest_config
    from quest_tpu.engine import QuestEngine
    from quest_tpu.models.llama import QuestModel
    from quest_tpu.models.quantize import init_params_quantized
    from quest_tpu.utils.benchmarking import bench_op

    on_tpu = jax.default_backend() == "tpu"
    ctx = args.ctx if on_tpu else 2048
    L = args.layers if on_tpu else 2
    cfg = dataclasses.replace(llama31_8b(), num_layers=L)
    quest = serving_quest_config(max_seq_len=ctx + 512, page_size=32)
    params = init_params_quantized(cfg, jax.random.PRNGKey(0), 8)
    engine = QuestEngine(cfg, quest, params, batch_size=1,
                         prefill_bucket=2048, prefill_chunk=4096)
    rng = np.random.default_rng(0)
    prompt = rng.integers(1, cfg.vocab_size, size=(1, ctx)).astype(np.int32)
    engine.prefill([p.tolist() for p in prompt])
    log("prefilled")

    model = QuestModel(cfg, quest)
    model0 = QuestModel(cfg, dataclasses.replace(quest, skip_layers=0))
    cache = engine.cache

    # Frozen-cache compute step: full layer stack reading the REAL
    # 128K cache, appends skipped; x [B, hid] f32 carried.
    def make_step(m, attn: bool):
        def step(x, env):
            params, cache = env
            B = x.shape[0]
            h = x.astype(cfg.dtype)[:, None]          # [B, 1, hid]
            from quest_tpu.models.quantize import slice_layer
            from quest_tpu.ops.rms_norm import rms_norm
            from quest_tpu.models.llama import Params  # noqa: F401
            import math
            seq = cache.seq_lens + 1
            for l in range(L):
                lp = {k: slice_layer(v, l)
                      for k, v in params["layers"].items()}
                from quest_tpu.models.quantize import qdot
                hh = rms_norm(h, lp["ln_attn"], cfg.rms_norm_eps)
                q = qdot(hh, lp["wq"]).reshape(
                    B, 1, cfg.num_heads, cfg.head_dim)
                k = qdot(hh, lp["wk"])
                v = qdot(hh, lp["wv"])
                if attn:
                    a = m._attn_decode(q[:, 0], cache, l,
                                       l >= m.quest.skip_layers, seq)
                else:
                    a = q[:, 0] + (jnp.sum(k) + jnp.sum(v)) * 1e-9
                a = a.astype(h.dtype).reshape(B, 1, -1)
                h = h + qdot(a, lp["wo"])
                h2 = rms_norm(h, lp["ln_mlp"], cfg.rms_norm_eps)
                mlp = qdot(jax.nn.silu(qdot(h2, lp["w_gate"]))
                           * qdot(h2, lp["w_up"]), lp["w_down"])
                h = h + mlp
            logits = qdot(h[:, 0].astype(jnp.float32), params["lm_head"],
                          dtype=jnp.float32)
            dep = jnp.tanh(jnp.sum(jnp.square(logits)) * 1e-6) * 1e-3
            return x + dep.astype(x.dtype)
        return step

    x0 = jnp.zeros((1, cfg.hidden_size), jnp.float32)
    env = (params, cache)
    variants = [
        ("full_serving", make_step(model, True)),
        ("all_sparse", make_step(model0, True)),
        ("weights_only", make_step(model, False)),
    ]
    iters = (4, 24) if on_tpu else (2, 4)
    for name, step in variants:
        np.asarray(jax.jit(step)(x0, env))
        log(f"warm {name} ok")
    samples = {n: [] for n, _ in variants}
    for r in range(args.rounds):
        for name, step in variants:
            t = bench_op(step, x0, iters=iters, reps=3, env=env) * 1e3
            samples[name].append(t)
        log(f"round {r+1}: " + "  ".join(
            f"{n}={samples[n][-1]:.3f}ms" for n, _ in variants))

    out = {"ctx": ctx, "layers": L}
    for n, v in samples.items():
        out[n + "_ms"] = round(statistics.median(v), 3)
        out[n + "_all"] = [round(x, 3) for x in v]
    # Host-loop per-token time for the SAME engine state (128 async
    # dispatches + one fetch), to expose dispatch+append overhead.
    tok = jnp.asarray([7], jnp.int32)
    tok, engine.cache = engine._tok_fn(engine.params, engine.cache, tok)
    np.asarray(tok)
    N = 128 if on_tpu else 4
    t0 = time.perf_counter()
    for _ in range(N):
        tok, engine.cache = engine._tok_fn(engine.params, engine.cache,
                                           tok)
    np.asarray(tok)
    out["host_loop_ms"] = round((time.perf_counter() - t0) / N * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
