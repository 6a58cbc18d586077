"""Round-5 kernel-vs-oracle drive on the real chip.

Verifies the NEW single-block fast path (`_kernel_1blk`) and the fp8
pool upcast under Mosaic (interpret-mode tests cannot): builds a layer
with append_prefill, runs estimate -> select -> sparse_decode_attention
(interpret=False) and compares to ops/reference.py oracles across
MHA / GQA / short-seq / per_q_head / fp8 / hb / q-row-policy
geometries. Pass: rel err < 2e-2 (bf16 pool) / 4e-2 (fp8 pool).

Usage: python exp/r5_oracle_drive.py [--cpu]
"""

from __future__ import annotations

import argparse
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
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/quest_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from quest_tpu.kv.paged_kv import LayerKV, append_prefill
    from quest_tpu.ops.estimate import page_scores, page_scores_per_qhead
    from quest_tpu.ops.reference import sparse_decode_attention_reference
    from quest_tpu.ops.sparse_decode import sparse_decode_attention
    from quest_tpu.ops.topk import select_pages

    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu
    failures = []

    # (name, seq, page, budget_pages, Hq, Hkv, kw, fp8, tol)
    CASES = [
        ("mha_p32", 4081, 32, 16, 8, 8, {}, False, 2e-2),
        ("mha_p32_hb2", 4081, 32, 16, 8, 8, dict(heads_per_block=2),
         False, 2e-2),
        ("mha_p16_qf32", 2017, 16, 32, 8, 8, dict(q_f32=True),
         False, 2e-2),
        ("mha_p16_qpad8", 2017, 16, 32, 8, 8, dict(q_pad8=True),
         False, 2e-2),
        ("gqa4_p32", 2001, 32, 16, 8, 2, {}, False, 2e-2),
        ("gqa4_p32_hb2", 2001, 32, 16, 8, 2, dict(heads_per_block=2),
         False, 2e-2),
        ("short_dense_fallback", 95, 16, 32, 8, 8, {}, False, 2e-2),
        ("per_q_head", 1537, 16, 16, 8, 2, dict(per_q_head=True),
         False, 2e-2),
        ("mha_p32_fp8", 4081, 32, 16, 8, 8, {}, True, 4e-2),
        ("general_nb4", 4081, 16, 64, 8, 8, dict(pages_per_block=16),
         False, 2e-2),
    ]
    D = 128
    for name, seq, page, S, Hq, Hkv, kw, fp8, tol in CASES:
        rng = np.random.default_rng(hash(name) % 2**31)
        P = (seq + page - 1) // page + 1
        B = 1
        dt = jnp.float8_e4m3fn if fp8 else jnp.bfloat16
        layer = LayerKV(
            kv_pages=jnp.zeros((B, Hkv, P, 2, page, D), dt),
            k_max=jnp.zeros((B, Hkv, P, D), dt),
            k_min=jnp.zeros((B, Hkv, P, D), dt),
            seq_lens=jnp.zeros((B,), jnp.int32))
        k_new = jnp.asarray(rng.standard_normal(
            (B, seq, Hkv, D)).astype(np.float32) * 0.3)
        v_new = jnp.asarray(rng.standard_normal(
            (B, seq, Hkv, D)).astype(np.float32) * 0.3)
        layer = jax.jit(append_prefill)(layer, k_new, v_new)
        layer = LayerKV(layer.kv_pages, layer.k_max, layer.k_min,
                        jnp.asarray([seq], jnp.int32))
        q = jnp.asarray(rng.standard_normal(
            (B, Hq, D)).astype(np.float32) * 0.3)
        sm = 1.0 / np.sqrt(D)
        if kw.get("per_q_head"):
            scores = page_scores_per_qhead(q, layer.k_max, layer.k_min)
        else:
            scores = page_scores(q, layer.k_max, layer.k_min,
                                 group_agg="sum")
        idx, nv = select_pages(scores, layer.seq_lens, page, S)
        got = sparse_decode_attention(
            q, layer.kv_pages, idx, nv, layer.seq_lens, sm_scale=sm,
            interpret=interpret, **kw)
        got = np.asarray(got)

        kp = layer.kv_pages[:, :, :, 0].astype(jnp.float32)
        vp = layer.kv_pages[:, :, :, 1].astype(jnp.float32)
        if kw.get("per_q_head"):
            G = Hq // Hkv
            kp = jnp.repeat(kp, G, axis=1)
            vp = jnp.repeat(vp, G, axis=1)
        want = np.asarray(sparse_decode_attention_reference(
            q, kp, vp, idx, nv, layer.seq_lens, sm))
        rel = (np.linalg.norm(got - want)
               / max(np.linalg.norm(want), 1e-9))
        ok = rel < tol and np.isfinite(got).all()
        log(f"{name:24s} rel_err={rel:.5f} {'OK' if ok else 'FAIL'}")
        if not ok:
            failures.append((name, rel))

    if failures:
        log("FAILURES:", failures)
        sys.exit(1)
    print("oracle drive OK " + ("(chip)" if on_tpu else "(cpu)"))


if __name__ == "__main__":
    main()
