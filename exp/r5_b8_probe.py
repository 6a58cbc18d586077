"""Isolate the B=8 serving failure: run the round-5 fast-path kernels
at batch 8 on hardware, kernel by kernel, with host fetches after each
(bounded blast radius under `timeout`; a wedge costs one process).

Usage: python exp/r5_b8_probe.py [--cpu] [--batch 8]
"""

from __future__ import annotations

import argparse
import dataclasses
import os as _os
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
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/quest_jax_cache")
    import jax.numpy as jnp

    from quest_tpu.config import ModelConfig, QuestConfig
    from quest_tpu.kv.paged_kv import (append_decode_at,
                                       append_prefill_at, init_cache)
    from quest_tpu.ops.dense_decode import dense_decode_attention
    from quest_tpu.ops.estimate import page_scores_physical
    from quest_tpu.ops.sparse_decode import sparse_decode_attention
    from quest_tpu.ops.topk import select_pages

    B, Hq, Hkv, D = args.batch, 32, 8, 128
    ctx = 2048
    model = ModelConfig(num_heads=Hq, num_kv_heads=Hkv, head_dim=D)
    quest = QuestConfig(page_size=16, token_budget=512, max_seq_len=4096)
    S = quest.page_budget
    sm = 1.0 / np.sqrt(D)
    cache = init_cache(model, quest, batch_size=B, num_layers=1)
    bpp, maxp = cache.block_pages, cache.max_pages

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    k_new = jax.random.normal(k1, (B, ctx, Hkv, D), jnp.float32) * 0.3
    v_new = jax.random.normal(k2, (B, ctx, Hkv, D), jnp.float32) * 0.3
    cache = jax.jit(lambda c, k, v: append_prefill_at(c, 0, k, v),
                    donate_argnums=(0,))(cache, k_new, v_new)
    cache = dataclasses.replace(
        cache, seq_lens=jnp.full((B,), ctx, jnp.int32))
    np.asarray(cache.seq_lens)
    log("filled")
    seq = cache.seq_lens
    q = jax.random.normal(jax.random.PRNGKey(7), (B, Hq, D), jnp.float32)

    s = page_scores_physical(q, cache.k_max[0], cache.k_min[0],
                             cache.block_tab, group_agg="sum")
    assert np.isfinite(np.asarray(s)).all()
    log("estimate ok")
    idx, nv = select_pages(s, seq, quest.page_size, S,
                           method="exact_fast")
    np.asarray(idx)
    log("select ok")
    o = sparse_decode_attention(q, cache.kv_pages, idx, nv, seq,
                                sm_scale=sm, layer=0,
                                block_tab=cache.block_tab,
                                block_pages=bpp, sorted_selection=True)
    assert np.isfinite(np.asarray(o)).all()
    log("sparse fast-path ok")
    o2 = dense_decode_attention(q, cache.kv_pages, seq, sm_scale=sm,
                                layer=0, block_tab=cache.block_tab,
                                block_pages=bpp, max_pages=maxp)
    assert np.isfinite(np.asarray(o2)).all()
    log("dense ok")
    cache = jax.jit(lambda c, k, v: append_decode_at(
        c, 0, k, v, active=jnp.ones((B,), bool)),
        donate_argnums=(0,))(cache, q[:, :Hkv], q[:, :Hkv])
    seq = cache.seq_lens          # old seq array was donated away
    np.asarray(seq)
    log("append_decode ok")
    # Cross-check sparse vs oracle at one row
    from quest_tpu.ops.reference import sparse_decode_attention_reference
    lay = cache.layer(0)
    want = sparse_decode_attention_reference(
        q, lay.kv_pages[:, :, :, 0].astype(jnp.float32),
        lay.kv_pages[:, :, :, 1].astype(jnp.float32), idx, nv, seq, sm)
    rel = (np.linalg.norm(np.asarray(o) - np.asarray(want))
           / np.linalg.norm(np.asarray(want)))
    log(f"oracle rel_err {rel:.5f}")
    assert rel < 2e-2
    print("b8 probe OK")


if __name__ == "__main__":
    main()
