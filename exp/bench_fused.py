"""Slope-timed A/B of the fused decode megakernel's knobs on chip.

Usage: python exp/bench_fused.py [CTX] [SG,GSEMS,GSLOTS,MSLOTS ...]
Defaults: CTX=32768 and a small grid over select_group / gather_sems /
gather_slots / meta_slots. Prints one line per config:
  fused CTX=.. SG=.. gsem=.. gslot=.. mslot=.. <us> (<GB/s effective>)
plus the unfused pipeline and dense baselines for the same arrays.

Run each invocation in its own process under timeout (a deadlock hangs
the TPU worker ~30 min; the issue/wait balance is verified in
interpret mode by tests/test_fused_decode.py, but first Mosaic drives
stay guarded).
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import sys

import numpy as np


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

    CTX = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    if len(sys.argv) > 2:
        grid = [tuple(int(x) for x in a.split(",")) for a in sys.argv[2:]]
    else:
        grid = [(1, 1, 2, 6), (1, 2, 3, 6), (2, 1, 3, 6), (4, 1, 5, 6),
                (4, 2, 5, 8), (8, 1, 9, 6)]

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
    # Fill ON DEVICE (host->device staging through the tunnel relay
    # runs ~10 MB/s; 128K of KV is ~1 GB — see bench.py).
    CH = min(8192, CTX)
    import functools

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
    q = jnp.asarray((rng.standard_normal((B, Hq, D)) * 0.3).astype(np.float32))
    iters, reps = (8, 72), 4

    def fb(x, y):
        dep = jnp.tanh(jnp.sum(jnp.square(y.astype(jnp.float32)))) * 1e-3
        return (x + dep.astype(x.dtype)).astype(x.dtype)

    km, kn_ = layer.k_max, layer.k_min
    if os.environ.get("QF_META") == "fp8":
        # fp8 metadata A/B (with QF_ABLATE this isolates WHERE the
        # fused_fp8 cost lives: the scoring path's in-kernel fp8->bf16
        # upcast vs the select/gather stages).
        km = km.astype(jnp.float8_e4m3fn)
        kn_ = kn_.astype(jnp.float8_e4m3fn)
    env = (layer.kv_pages, km, kn_)
    if os.environ.get("BF_SKIP_BASE"):
        # A Mosaic compiler crash (SIGABRT) kills the whole process, so
        # sweeps run one config per process; skip re-timing baselines.
        t_dense = float(os.environ.get("BF_DENSE_US", "728")) * 1e-6
    else:
        t_dense = bench_op(
            lambda q, e: fb(q, dense_decode_attention(q, e[0], seq,
                                                      sm_scale=sm)),
            q, iters=iters, reps=reps, env=env)
        print(f"dense {t_dense*1e6:8.1f} us", flush=True)

        def unfused(q, e):
            kv, kmax, kmin = e
            sc = page_scores(q, kmax, kmin)
            idx, nv = select_pages(sc, seq, page, S, method="exact")
            return fb(q, sparse_decode_attention(q, kv, idx, nv, seq,
                                                 sm_scale=sm))
        t_un = bench_op(unfused, q, iters=iters, reps=reps, env=env)
        print(f"unfused {t_un*1e6:8.1f} us ({t_dense/t_un:.2f}x)",
              flush=True)

    total_mb = (2 * Hkv * BUDGET * D * 2
                + 2 * Hkv * (CTX // page) * D * 2) / 1e6
    for cfg in grid:
        sg, gsem, gslot, mslot = cfg[:4]
        bp = cfg[4] if len(cfg) > 4 else 128

        def fused(q, e, sg=sg, gsem=gsem, gslot=gslot, mslot=mslot,
                  bp=bp):
            kv, kmax, kmin = e
            return fb(q, fused_sparse_decode(
                q, kv, kmax, kmin, seq, sm_scale=sm, budget_pages=S,
                select_group=sg, gather_sems=gsem, gather_slots=gslot,
                meta_slots=mslot, block_p=bp))
        t = bench_op(fused, q, iters=iters, reps=reps, env=env)
        print(f"fused CTX={CTX} SG={sg} gsem={gsem} gslot={gslot} "
              f"mslot={mslot} bp={bp}: {t*1e6:8.1f} us "
              f"({t_dense/t:.2f}x, "
              f"{total_mb*1e6/t/1e9:.0f} GB/s eff)", flush=True)


if __name__ == "__main__":
    main()
