"""Fused decode megakernel vs the unfused pipeline and eager oracles.

The fused kernel must reproduce the unfused pipeline EXACTLY at the
selection level (same top-K set — both are exact by construction) and
match the eager sparse-attention oracle numerically. Geometry sweep
covers MHA/GQA, ragged last pages, short rows (num_pages < budget),
multi-block metadata streams, and batch > 1.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from quest_tpu.ops.estimate import page_scores
from quest_tpu.ops.fused_decode import (_compact_ids, _exact_topk_select,
                                        fused_sparse_decode)
from quest_tpu.ops.reference import sparse_decode_attention_reference
from quest_tpu.ops.sparse_decode import sparse_decode_attention
from quest_tpu.ops.topk import select_pages


def _mk(rng, B, Hkv, G, P, page, D, dt):
    kv = rng.standard_normal((B, Hkv, P, 2, page, D)).astype(np.float32)
    kv_pages = jnp.asarray(kv * 0.3, dt)
    k_pages = kv_pages[:, :, :, 0].astype(jnp.float32)
    k_max = jnp.max(k_pages, axis=3).astype(dt)
    k_min = jnp.min(k_pages, axis=3).astype(dt)
    q = jnp.asarray(rng.standard_normal((B, G * Hkv, D)).astype(np.float32)
                    * 0.5)
    return q, kv_pages, k_max, k_min


def test_exact_topk_select_matches_select_pages():
    rng = np.random.default_rng(7)
    page = 16
    for _ in range(24):
        P = int(rng.choice([128, 256, 512, 2048]))
        K = int(rng.integers(2, min(P, 200)))
        seq = int(rng.integers(1, P * page))
        s = rng.standard_normal(P).astype(np.float32) * 10
        num_pages = (seq + page - 1) // page

        sel, slot, nv = _exact_topk_select(
            jnp.asarray(s.reshape(P // 128, 128)), 1,
            jnp.int32(num_pages), jnp.int32(num_pages - 1), K)
        Kp = ((K + 127) // 128) * 128
        ids = np.asarray(_compact_ids(sel, slot,
                                      Kp)).astype(np.int64)[0]
        got = ids[:int(nv)].tolist()

        idx, nv2 = select_pages(jnp.asarray(s)[None, None],
                                jnp.asarray([seq], jnp.int32), page, K,
                                method="exact")
        want = np.asarray(idx)[0, 0, :int(nv2[0])].tolist()
        assert int(nv) == int(nv2[0])
        assert got == want, (P, K, seq)  # ascending page order, same set
        assert got == sorted(got)


CFGS = [
    # B, Hkv, G, P, page, D, K, seqs, dtype
    (1, 4, 1, 256, 16, 128, 32, (3000,), jnp.float32),
    (1, 2, 4, 256, 16, 128, 32, (3900,), jnp.float32),   # GQA sum-agg
    (2, 2, 1, 128, 16, 64, 16, (1790, 311), jnp.bfloat16),
    (1, 1, 8, 128, 8, 128, 24, (1000,), jnp.float32),
    (2, 2, 2, 256, 16, 128, 40, (95, 4081), jnp.bfloat16),  # short row
    pytest.param(1, 2, 1, 512, 4, 128, 130, (2001,), jnp.float32,
                 marks=pytest.mark.slow),  # K > 128 slots (622 s interp)
]


@pytest.mark.parametrize("B,Hkv,G,P,page,D,K,seqs,dt", CFGS, ids=str)
def test_fused_matches_unfused_pipeline(B, Hkv, G, P, page, D, K, seqs,
                                        dt):
    rng = np.random.default_rng(hash((B, Hkv, G, P, K)) % 2**31)
    q, kv_pages, k_max, k_min = _mk(rng, B, Hkv, G, P, page, D, dt)
    seq = jnp.asarray(np.array(seqs, np.int32))
    sm = 1.0 / np.sqrt(D)

    scores = page_scores(q, k_max, k_min, group_agg="sum")
    idx, nv = select_pages(scores, seq, page, K, method="exact")
    want_pipe = sparse_decode_attention(q, kv_pages, idx, nv, seq,
                                        sm_scale=sm)
    want_ref = sparse_decode_attention_reference(
        q, kv_pages[:, :, :, 0].astype(jnp.float32),
        kv_pages[:, :, :, 1].astype(jnp.float32), idx, nv, seq, sm)

    got = fused_sparse_decode(q, kv_pages, k_max, k_min, seq,
                              sm_scale=sm, budget_pages=K,
                              group_agg="sum")
    tol = 2e-2 if dt == jnp.bfloat16 else 2e-3
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_pipe),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_ref),
                               rtol=tol, atol=tol)


def test_fused_max_agg_and_dense_equivalence():
    """K >= num_pages selects every valid page -> dense attention."""
    rng = np.random.default_rng(3)
    B, Hkv, G, P, page, D = 1, 2, 2, 128, 16, 128
    q, kv_pages, k_max, k_min = _mk(rng, B, Hkv, G, P, page, D,
                                    jnp.float32)
    seq = jnp.asarray([700], jnp.int32)     # 44 pages < K
    sm = 1.0 / np.sqrt(D)
    got = fused_sparse_decode(q, kv_pages, k_max, k_min, seq,
                              sm_scale=sm, budget_pages=64,
                              group_agg="max")
    from quest_tpu.ops.reference import dense_decode_attention_reference
    k_flat = kv_pages[:, :, :, 0].reshape(B, Hkv, P * page, D)
    v_flat = kv_pages[:, :, :, 1].reshape(B, Hkv, P * page, D)
    want = dense_decode_attention_reference(q, k_flat, v_flat, seq, sm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_engine_fused_flag_matches_unfused():
    """Model decode through the shared whole-pool cache: the fused
    megakernel (layer + block-table mode) must reproduce the unfused
    engine path's logits (same exact selection; tiny numeric slack for
    the different matmul groupings)."""
    import dataclasses

    import jax

    from quest_tpu.config import ModelConfig, QuestConfig
    from quest_tpu.kv.paged_kv import init_cache
    from quest_tpu.models.llama import QuestModel, init_params

    cfg = ModelConfig(vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_layers=2, num_heads=4,
                      num_kv_heads=2, head_dim=32, dtype=jnp.float32)
    quest = QuestConfig(page_size=4, token_budget=128, max_seq_len=1024,
                        skip_layers=1, kv_dtype=jnp.float32)
    assert quest.max_pages >= 128  # fused path engages
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(5)
    toks = rng.integers(0, 128, size=(2, 280)).astype(np.int32)
    dec = rng.integers(0, 128, size=(2, 2)).astype(np.int32)

    outs = []
    for fused in (False, True):
        q2 = dataclasses.replace(quest, fused_decode=fused)
        model = QuestModel(cfg, q2)
        cache = init_cache(cfg, q2, batch_size=2)
        _, cache = model.prefill_last(params, cache, jnp.asarray(toks))
        step_logits = []
        for t in range(dec.shape[0]):
            lg, cache = model.decode_step(params, cache,
                                          jnp.asarray(dec[t]))
            step_logits.append(np.asarray(lg))
        outs.append(np.stack(step_logits))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-3, atol=2e-3)


def test_fused_fp8_metadata_runs_and_selects_like_unfused():
    """fp8 (e4m3) metadata through the fused kernel: the fused kernel
    and the unfused pipeline see the SAME fp8-quantized scores (both
    upcast q no lower than bf16, ops/estimate.py), so at matched meta
    dtype the attention outputs must agree."""
    rng = np.random.default_rng(11)
    B, Hkv, G, P, page, D, K = 1, 2, 1, 256, 16, 128, 32
    q, kv_pages, k_max, k_min = _mk(rng, B, Hkv, G, P, page, D,
                                    jnp.bfloat16)
    seq = jnp.asarray([3900], jnp.int32)
    sm = 1.0 / np.sqrt(D)
    f8 = jnp.float8_e4m3fn
    got8 = fused_sparse_decode(q, kv_pages, k_max.astype(f8),
                               k_min.astype(f8), seq, sm_scale=sm,
                               budget_pages=K)
    # Unfused with the same fp8 metadata and the same bf16 query
    # rounding as the fused kernel's in-kernel cast.
    qb = q.astype(jnp.bfloat16).astype(jnp.float32)
    scores = page_scores(qb, k_max.astype(f8), k_min.astype(f8),
                         group_agg="sum")
    idx, nv = select_pages(scores, seq, page, K, method="exact")
    want = sparse_decode_attention(q, kv_pages, idx, nv, seq,
                                   sm_scale=sm)
    err = (np.abs(np.asarray(got8) - np.asarray(want)).max()
           / (np.abs(np.asarray(want)).max() + 1e-9))
    assert err < 0.05, err


@pytest.mark.slow
def test_sharded_fused_matches_single_device():
    """Fused megakernel inside shard_map (tp over KV heads, dp over
    batch) == single-device fused output."""
    import jax

    from quest_tpu.config import ModelConfig, QuestConfig, RopeConfig
    from quest_tpu.kv.paged_kv import init_cache
    from quest_tpu.models.llama import QuestModel, init_params
    from quest_tpu.parallel import (init_sharded_cache, make_mesh,
                                    make_sharded_fns, shard_params)

    cfg = ModelConfig(vocab_size=256, hidden_size=64,
                      intermediate_size=128, num_layers=2, num_heads=8,
                      num_kv_heads=4, head_dim=16, rope=RopeConfig(),
                      dtype=jnp.float32)
    quest = QuestConfig(page_size=4, token_budget=96, max_seq_len=1024,
                        skip_layers=1, kv_dtype=jnp.float32,
                        fused_decode=True)
    assert quest.max_pages >= 128
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    B = 2
    rng = np.random.default_rng(2)
    toks = rng.integers(0, 256, size=(B, 500)).astype(np.int32)
    lens = np.full((B,), 500, np.int32)

    model = QuestModel(cfg, quest)
    cache0 = init_cache(cfg, quest, B)
    _, cache0 = model.prefill(params, cache0, jnp.asarray(toks),
                              jnp.asarray(lens))
    dec0, cache0 = model.decode_step(params, cache0,
                                     jnp.asarray([3] * B, jnp.int32))

    mesh = make_mesh(2, 2)
    prefill_fn, decode_fn = make_sharded_fns(cfg, quest, mesh)
    sparams = shard_params(params, mesh)
    cache = init_sharded_cache(cfg, quest, mesh, B)
    _, cache = prefill_fn(sparams, cache, jnp.asarray(toks),
                          jnp.asarray(lens))
    dec, cache = decode_fn(sparams, cache, jnp.asarray([3] * B, jnp.int32))
    np.testing.assert_allclose(np.asarray(dec), np.asarray(dec0),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
@pytest.mark.parametrize("sg", [2, 4])
def test_select_group_batched_matches_sg1(sg):
    """Group-batched selection (radix shared across SG heads) must be
    bit-identical to per-head selection."""
    rng = np.random.default_rng(21)
    B, Hkv, G, P, page, D, K = 2, 4, 2, 256, 16, 128, 24
    q, kv_pages, k_max, k_min = _mk(rng, B, Hkv, G, P, page, D,
                                    jnp.float32)
    seq = jnp.asarray([3500, 977], jnp.int32)
    sm = 1.0 / np.sqrt(D)
    base = fused_sparse_decode(q, kv_pages, k_max, k_min, seq,
                               sm_scale=sm, budget_pages=K,
                               select_group=1)
    got = fused_sparse_decode(q, kv_pages, k_max, k_min, seq,
                              sm_scale=sm, budget_pages=K,
                              select_group=sg)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(base))


def test_fused_pool_not_multiple_of_block_p():
    """P = 192 (a 64-multiple that 128 does not divide — the flagship
    32K engine pool is 2112) must pick bp=64, not assert."""
    rng = np.random.default_rng(17)
    B, Hkv, G, P, page, D, K = 1, 2, 1, 192, 16, 128, 16
    q, kv_pages, k_max, k_min = _mk(rng, B, Hkv, G, P, page, D,
                                    jnp.float32)
    seq = jnp.asarray([2500], jnp.int32)
    sm = 1.0 / np.sqrt(D)
    got = fused_sparse_decode(q, kv_pages, k_max, k_min, seq,
                              sm_scale=sm, budget_pages=K)
    scores = page_scores(q, k_max, k_min, group_agg="sum")
    idx, nv = select_pages(scores, seq, page, K, method="exact")
    want = sparse_decode_attention(q, kv_pages, idx, nv, seq, sm_scale=sm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_exact_topk_boundary_ties_match_lax_topk():
    """Exact f32 score ties across the K boundary resolve to the same
    SET as lax.top_k (lowest page id wins among equal scores), incl.
    single-page rows and all-equal scores."""
    import jax

    page = 16
    cases = []
    # All-equal scores: ties everywhere.
    cases.append((np.full(256, 1.5, np.float32), 40, 256 * page))
    # Dense tie band straddling the boundary.
    s = np.zeros(256, np.float32)
    s[:10] = 7.0
    s[10:200] = 3.25          # 190-way tie, K cuts through it
    cases.append((s, 64, 256 * page))
    # Negative ties + zeros.
    s = np.concatenate([np.full(128, -2.5, np.float32),
                        np.zeros(128, np.float32)])
    cases.append((s, 130, 256 * page - 3))
    # Single-page row.
    cases.append((np.linspace(0, 1, 128).astype(np.float32), 8, 5))

    for s, K, seq in cases:
        P = len(s)
        num_pages = (seq + page - 1) // page
        sel, slot, nv = _exact_topk_select(
            jnp.asarray(s.reshape(P // 128, 128)), 1,
            jnp.int32(num_pages), jnp.int32(num_pages - 1), K)
        Kp = ((K + 127) // 128) * 128
        ids = np.asarray(_compact_ids(sel, slot, Kp))[0]
        got = sorted(ids[:int(nv)].astype(np.int64).tolist())
        idx, nv2 = select_pages(jnp.asarray(s)[None, None],
                                jnp.asarray([seq], jnp.int32), page, K,
                                method="exact")
        want = sorted(np.asarray(idx)[0, 0, :int(nv2[0])].tolist())
        assert int(nv) == int(nv2[0]), (K, seq)
        assert got == want, (K, seq, got[:8], want[:8])
