"""Tune the UNFUSED decode pipeline at 32K on chip.

Sweeps the sparse kernel's gather knobs (pages_per_block x num_slots x
gather-semaphore stripes) and A/Bs the estimate implementations
(XLA einsum vs Pallas streaming page_scores_kernel) INSIDE the full
composed pipeline (estimate -> exact_fast select -> sparse decode).
Usage: python exp/unfused_tune.py [CTX]
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys

import numpy as np


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from quest_tpu.config import ModelConfig, QuestConfig
    from quest_tpu.kv.paged_kv import LayerKV, append_prefill, init_cache
    from quest_tpu.ops.estimate import page_scores, page_scores_kernel
    from quest_tpu.ops.sparse_decode import sparse_decode_attention
    from quest_tpu.ops.topk import select_pages
    from quest_tpu.utils.benchmarking import bench_op

    CTX = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    assert jax.default_backend() == "tpu"
    B, Hq, Hkv, D, page, BUDGET = 1, 32, 32, 128, 16, 2048
    model = ModelConfig(num_heads=Hq, num_kv_heads=Hkv, head_dim=D)
    quest = QuestConfig(page_size=page, token_budget=BUDGET,
                        max_seq_len=CTX)
    S = quest.page_budget
    sm = 1.0 / np.sqrt(D)
    rng = np.random.default_rng(0)
    cache = init_cache(model, quest, batch_size=B, num_layers=1)
    layer = cache.layer(0)
    CH = min(8192, CTX)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill(layer, key, off):
        k1, k2 = jax.random.split(key)
        kn = jax.random.normal(k1, (B, CH, Hkv, D), jnp.float32) * 0.3
        vn = jax.random.normal(k2, (B, CH, Hkv, D), jnp.float32) * 0.3
        layer = append_prefill(layer, kn, vn)
        return LayerKV(layer.kv_pages, layer.k_max, layer.k_min,
                       jnp.asarray([0], jnp.int32) + off + CH)

    key = jax.random.PRNGKey(0)
    for off in range(0, CTX, CH):
        key, sub = jax.random.split(key)
        layer = fill(layer, sub, jnp.int32(off))
        np.asarray(layer.seq_lens)
    seq = jnp.asarray([CTX], jnp.int32)
    q = jnp.asarray((rng.standard_normal((B, Hq, D)) * 0.3)
                    .astype(np.float32))
    iters, reps = (8, 72), 4

    def fb(x, y):
        dep = jnp.tanh(jnp.sum(jnp.square(y.astype(jnp.float32)))) * 1e-3
        return (x + dep.astype(x.dtype)).astype(x.dtype)

    env = (layer.kv_pages, layer.k_max, layer.k_min)

    def pipe(est, ppb, nslot, nsem):
        def f(q, e):
            kv, kmax, kmin = e
            if est == "pallas":
                sc = page_scores_kernel(q, kmax, kmin, group_agg="sum")
            else:
                sc = page_scores(q, kmax, kmin, group_agg="sum")
            idx, nv = select_pages(sc, seq, page, S,
                                   method="exact_fast")
            return fb(q, sparse_decode_attention(
                q, kv, idx, nv, seq, sm_scale=sm, pages_per_block=ppb,
                num_slots=nslot, num_sems=nsem))
        return f

    grid = [("einsum", 128, 3, 1),     # current default
            ("einsum", 128, 4, 1),
            ("einsum", 128, 6, 1),
            ("einsum", 64, 6, 1),
            ("einsum", 64, 8, 1),
            ("einsum", 32, 8, 1),
            ("einsum", 128, 6, 4),
            ("einsum", 64, 8, 4),
            ("pallas", 128, 6, 1),
            ("pallas", 64, 8, 1)]
    # Override, e.g. QT_GRID="einsum:64:6:1,einsum:128:3:1" — repeats
    # allowed (re-measuring a config in one process separates a real
    # sweet spot from a timing fluke).
    if _os.environ.get("QT_GRID"):
        grid = [(e, int(p), int(n), int(s))
                for e, p, n, s in (c.split(":")
                                   for c in _os.environ["QT_GRID"]
                                   .split(","))]
    for est, ppb, nslot, nsem in grid:
        try:
            t = bench_op(pipe(est, ppb, nslot, nsem), q, iters=iters,
                         reps=reps, env=env)
            print(f"unfused est={est} ppb={ppb} nslot={nslot} "
                  f"nsem={nsem}: {t*1e6:8.1f} us", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"unfused est={est} ppb={ppb} nslot={nslot} "
                  f"nsem={nsem}: FAILED {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
