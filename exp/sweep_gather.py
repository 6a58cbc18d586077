"""TPU sweep: sparse_decode_attention (pages_per_block, num_slots).

Usage: python exp/sweep_gather.py PPB NSLOT [CTX BUDGET]
Prints one line: `ppb nslot us GB/s` on stdout.
Run one config per process under `timeout` (kernel hangs poison the chip).
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys

import numpy as np


def main():
    ppb, nslot = int(sys.argv[1]), int(sys.argv[2])
    CTX = int(sys.argv[3]) if len(sys.argv) > 3 else 32768
    BUDGET = int(sys.argv[4]) if len(sys.argv) > 4 else 2048

    import os
    import jax
    if os.environ.get("QT_CPU"):  # axon plugin re-pins JAX_PLATFORMS
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from quest_tpu.config import ModelConfig, QuestConfig
    from quest_tpu.kv.paged_kv import LayerKV, append_prefill, init_cache
    from quest_tpu.ops.sparse_decode import sparse_decode_attention
    from quest_tpu.ops.estimate import page_scores
    from quest_tpu.ops.topk import select_pages
    from quest_tpu.utils.benchmarking import bench_op

    B, Hq, Hkv, D, page = 1, 32, 32, 128, 16
    model = ModelConfig(num_heads=Hq, num_kv_heads=Hkv, head_dim=D)
    quest = QuestConfig(page_size=page, token_budget=BUDGET,
                        max_seq_len=CTX)
    S = quest.page_budget
    sm = 1.0 / np.sqrt(D)
    rng = np.random.default_rng(0)
    cache = init_cache(model, quest, batch_size=B, num_layers=1)
    layer = cache.layer(0)
    CH = 8192
    fill = jax.jit(append_prefill, donate_argnums=(0,))
    for off in range(0, CTX, CH):
        k_new = (rng.standard_normal((B, CH, Hkv, D)) * 0.3).astype(np.float32)
        v_new = (rng.standard_normal((B, CH, Hkv, D)) * 0.3).astype(np.float32)
        layer = fill(layer, jnp.asarray(k_new), jnp.asarray(v_new))
        layer = LayerKV(layer.kv_pages, layer.k_max, layer.k_min,
                        jnp.asarray([off + CH], jnp.int32))
    seq = jnp.asarray([CTX], jnp.int32)
    q = jnp.asarray((rng.standard_normal((B, Hq, D)) * 0.3).astype(np.float32))
    scores = page_scores(q, layer.k_max, layer.k_min)
    idx, num_valid = select_pages(scores, seq, page, S)
    idx = jax.block_until_ready(idx)

    def step(q, env):
        kv_pages, idx, num_valid = env
        out = sparse_decode_attention(q, kv_pages, idx, num_valid, seq,
                                      sm_scale=sm, pages_per_block=ppb,
                                      num_slots=nslot)
        dep = jnp.tanh(jnp.sum(jnp.square(out))) * 1e-3
        return (q + dep.astype(q.dtype)).astype(q.dtype)

    t = bench_op(step, q, iters=(8, 72), reps=5,
                 env=(layer.kv_pages, idx, num_valid))
    nbytes = 2 * Hkv * BUDGET * D * 2
    print(f"ppb={ppb} nslot={nslot} {t*1e6:.1f} us {nbytes/t/1e9:.0f} GB/s",
          flush=True)


if __name__ == "__main__":
    main()
