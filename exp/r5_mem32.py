"""AOT memory analysis of the 32-layer int4 + fp8-KV config (no
device memory touched: abstract params/cache via eval_shape, remote
compile only). Finds what blows the 16 GB budget in the full-depth
prefill (the r5 e2e attempt OOM'd at the first prefill chunk).

Usage: python exp/r5_mem32.py [--chunk 4096] [--layers 32] [--cpu]
"""

from __future__ import annotations

import argparse
import functools
import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

T0 = time.time()


def log(*a):
    print(f"[{time.time()-T0:6.1f}s]", *a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--ctx", type=int, default=32768)
    ap.add_argument("--decode-tokens", type=int, default=64)
    ap.add_argument("--page", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/quest_jax_cache")
    import dataclasses

    import jax.numpy as jnp

    from quest_tpu.config import QuestConfig, llama31_8b
    from quest_tpu.kv.paged_kv import init_cache
    from quest_tpu.models.llama import QuestModel
    from quest_tpu.models.quantize import init_params_quantized

    cfg = dataclasses.replace(llama31_8b(), num_layers=args.layers)
    quest = QuestConfig(page_size=args.page, token_budget=2048,
                        max_seq_len=(args.ctx + 2 * args.decode_tokens
                                     + 2 + args.page),
                        kv_dtype=jnp.float8_e4m3fn,
                        meta_dtype=jnp.float8_e4m3fn,
                        topk_method="exact_fast")
    model = QuestModel(cfg, quest)

    params_shape = jax.eval_shape(
        lambda: init_params_quantized(cfg, jax.random.PRNGKey(0),
                                      args.bits))
    cache_shape = jax.eval_shape(
        lambda: init_cache(cfg, quest, batch_size=1))

    def tree_bytes(t):
        return sum(x.size * x.dtype.itemsize
                   for x in jax.tree.leaves(t)) / 1e9

    log(f"params {tree_bytes(params_shape):.2f} GB, "
        f"cache {tree_bytes(cache_shape):.2f} GB")

    B, T = 1, args.chunk
    toks = jax.ShapeDtypeStruct((B, T), jnp.int32)
    lens = jax.ShapeDtypeStruct((B,), jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def prefill(params, cache, toks, lens):
        return model.prefill_last(params, cache, toks, new_lens=lens)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def decode(params, cache, tok):
        return model.decode_token_step(params, cache, tok)

    for name, fn, sargs in (
            ("prefill", prefill, (params_shape, cache_shape, toks, lens)),
            ("decode", decode, (params_shape, cache_shape,
                                jax.ShapeDtypeStruct((B,), jnp.int32)))):
        t0 = time.time()
        compiled = fn.lower(*sargs).compile()
        ma = compiled.memory_analysis()
        log(f"{name}: compiled in {time.time()-t0:.0f}s")
        print(f"{name}: args={ma.argument_size_in_bytes/1e9:.2f} GB  "
              f"out={ma.output_size_in_bytes/1e9:.2f} GB  "
              f"temp={ma.temp_size_in_bytes/1e9:.2f} GB  "
              f"alias={ma.alias_size_in_bytes/1e9:.2f} GB", flush=True)


if __name__ == "__main__":
    main()
