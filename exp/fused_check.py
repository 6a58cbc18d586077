"""On-chip correctness check of the fused megakernel at small shapes.

Runs fused_sparse_decode vs the unfused exact pipeline (page_scores ->
select_pages(exact) -> sparse_decode_attention) on the REAL chip and
compares. Small pool (P=256) so a fault/hang costs little and the
comparison is fast. Usage:

    python exp/fused_check.py [SG ...]     # default: 1 2 4 8
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from quest_tpu.ops.estimate import page_scores
    from quest_tpu.ops.fused_decode import fused_sparse_decode
    from quest_tpu.ops.sparse_decode import sparse_decode_attention
    from quest_tpu.ops.topk import select_pages

    sgs = [int(x) for x in sys.argv[1:]] or [1, 2, 4, 8]
    B, Hkv, G, P, page, D, K = 1, 8, 1, 256, 16, 128, 24
    sgs = [s for s in sgs if Hkv % s == 0]   # groups must divide heads
    Hq = Hkv * G
    rng = np.random.default_rng(3)
    kv = jnp.asarray(
        rng.standard_normal((B, Hkv, P, 2, page, D)).astype(np.float32),
        jnp.bfloat16)
    k_max = jnp.max(kv[:, :, :, 0].astype(jnp.float32), axis=3).astype(
        jnp.bfloat16)
    k_min = jnp.min(kv[:, :, :, 0].astype(jnp.float32), axis=3).astype(
        jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)).astype(np.float32))
    seq = jnp.asarray([3503], jnp.int32)
    sm = 1.0 / np.sqrt(D)

    scores = page_scores(q, k_max, k_min, group_agg="sum")
    idx, nv = select_pages(scores, seq, page, K, method="exact")
    want = np.asarray(sparse_decode_attention(q, kv, idx, nv, seq,
                                              sm_scale=sm))
    print("unfused reference ok", flush=True)
    for sg in sgs:
        got = np.asarray(fused_sparse_decode(
            q, kv, k_max, k_min, seq, sm_scale=sm, budget_pages=K,
            select_group=sg, gather_slots=sg + 1))
        err = float(np.max(np.abs(got - want)))
        rel = err / (float(np.max(np.abs(want))) + 1e-9)
        status = "OK" if rel < 2e-2 else "MISMATCH"
        print(f"SG={sg}: max abs err {err:.2e} (rel {rel:.2e}) "
              f"{status}", flush=True)


if __name__ == "__main__":
    main()
