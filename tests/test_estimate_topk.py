"""Estimate (page criticality) + top-K selection semantics.

Estimate oracle mirrors the reference's double-loop CPU check
(`/root/reference/kernels/src/test/test_max_possible.cu:81-106`); top-k
checks the unified "+inf last page" selection against the reference's
{last} ∪ top-(K-1)(rest) semantics
(`/root/reference/quest/utils/controller.py:99-120`).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from quest_tpu.ops.estimate import page_scores, page_scores_per_qhead
from quest_tpu.ops.reference import estimate_reference
from quest_tpu.ops.topk import select_pages


@pytest.mark.parametrize("Hq,Hkv", [(4, 4), (8, 2)])
def test_estimate_matches_double_loop(Hq, Hkv):
    rng = np.random.default_rng(0)
    B, P, D = 2, 11, 32
    q = jnp.asarray(rng.standard_normal((B, Hq, D)).astype(np.float32))
    kmin_ = rng.standard_normal((B, Hkv, P, D)).astype(np.float32)
    kmax_ = kmin_ + np.abs(rng.standard_normal((B, Hkv, P, D))).astype(np.float32)
    kmin, kmax = jnp.asarray(kmin_), jnp.asarray(kmax_)

    want = estimate_reference(q, kmin, kmax)        # [B, Hq, P]
    got = page_scores_per_qhead(q, kmax, kmin)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # Group aggregation equals numpy agg of per-head scores.
    for agg, npfn in [("max", np.max), ("sum", np.sum)]:
        got_g = np.asarray(page_scores(q, kmax, kmin, group_agg=agg))
        want_g = npfn(np.asarray(want).reshape(B, Hkv, Hq // Hkv, P), axis=2)
        np.testing.assert_allclose(got_g, want_g, rtol=1e-5, atol=1e-5)


def test_serving_quest_config_factory():
    """serving_quest_config pins the measured serving choices and keeps
    the static selection rule in sync with ops/topk.serving_method."""
    from quest_tpu.config import serving_quest_config

    c = serving_quest_config(32768)
    assert c.page_size == 32 and c.page_budget == 64
    assert c.meta_dtype == jnp.float8_e4m3fn
    assert c.topk_method == "exact_fast"      # pool 1024 <= 16*64
    c2 = serving_quest_config(131072)
    assert c2.topk_method == "approx"         # pool 4096 > 16*64
    c3 = serving_quest_config(32768, page_size=16, topk_method="exact")
    assert c3.page_size == 16 and c3.topk_method == "exact"


@pytest.mark.parametrize("per_q", [False, True])
def test_page_scores_physical_matches_logical_view(per_q):
    """The serving estimate (physical-pool einsum + block-table score
    gather, ops/estimate.py:page_scores_physical) must equal scoring
    the materialized logical metadata view — including through aliased
    (prefix-shared) and scratch-pointing table rows."""
    from quest_tpu.config import ModelConfig, QuestConfig
    from quest_tpu.kv.paged_kv import append_prefill_at, init_cache
    from quest_tpu.ops.estimate import page_scores_physical

    rng = np.random.default_rng(7)
    page, Hkv, D, B, G = 8, 2, 32, 2, (2 if per_q else 1)
    Hq = Hkv * G
    quest = QuestConfig(page_size=page, max_seq_len=page * 64,
                        kv_dtype=jnp.float32, block_pages=4)
    model = ModelConfig(num_kv_heads=Hkv, num_heads=Hq, head_dim=D)
    cache = init_cache(model, quest, batch_size=B, num_layers=1)
    T1, T2 = 70, 29
    k = rng.standard_normal((B, max(T1, T2), Hq // G, D)).astype(np.float32)
    v = rng.standard_normal((B, max(T1, T2), Hq // G, D)).astype(np.float32)
    lens = jnp.asarray([T1, T2], jnp.int32)
    cache = append_prefill_at(cache, 0, jnp.asarray(k), jnp.asarray(v),
                              new_lens=lens)
    import dataclasses as dc
    cache = dc.replace(cache, seq_lens=lens)

    q = jnp.asarray(rng.standard_normal((B, Hq, D)).astype(np.float32))
    view = cache.layer(0)
    for agg in ("max", "sum"):
        got = page_scores_physical(q, cache.k_max[0], cache.k_min[0],
                                   cache.block_tab, group_agg=agg,
                                   per_q_head=per_q)
        if per_q:
            want = page_scores_per_qhead(q, view.k_max, view.k_min)
        else:
            want = page_scores(q, view.k_max, view.k_min, group_agg=agg)
        # Compare only valid pages: the logical view's invalid rows
        # hold zero-init metadata, the physical gather may surface a
        # different (scratch/stale) row — both are masked downstream.
        for b, t in enumerate([T1, T2]):
            n = (t + page - 1) // page
            np.testing.assert_allclose(np.asarray(got)[b, :, :n],
                                       np.asarray(want)[b, :, :n],
                                       rtol=1e-5, atol=1e-5)
        if per_q:
            break                       # agg is ignored per_q_head


@pytest.mark.parametrize("sort_by_page", [True, False])
def test_topk_forces_last_page_and_matches_reference_set(sort_by_page):
    rng = np.random.default_rng(1)
    B, H, P, page, K = 2, 3, 16, 8, 5
    scores = rng.standard_normal((B, H, P)).astype(np.float32)
    seq_lens = np.array([12 * page, 3 * page - 2], np.int32)  # 12 and 3 pages
    idx, num_valid = select_pages(jnp.asarray(scores), jnp.asarray(seq_lens),
                                  page, K, sort_by_page=sort_by_page)
    idx = np.asarray(idx)
    num_valid = np.asarray(num_valid)

    for b in range(B):
        n_pages = int(np.ceil(seq_lens[b] / page))
        last = n_pages - 1
        nv = min(K, n_pages)
        assert num_valid[b] == nv
        for h in range(H):
            sel = idx[b, h, :nv].tolist()
            assert len(set(sel)) == nv, "selected pages must be distinct"
            assert last in sel, "last page must always be selected"
            if sort_by_page:
                assert sel == sorted(sel), "slots ascend by page id"
            else:
                assert sel[0] == last, "+inf puts last page in slot 0"
            assert all(0 <= p < n_pages for p in sel)
            assert (idx[b, h] >= 0).all() and (idx[b, h] < P).all(), \
                "junk slots must stay in-bounds"
            # Reference semantics: {last} ∪ top-(K-1) of the other pages.
            others = [p for p in range(n_pages) if p != last]
            want = set(np.array(others)[
                np.argsort(scores[b, h, others])[::-1][:nv - 1]].tolist())
            assert set(sel) == want | {last}


def test_topk_short_sequence_selects_all_pages():
    """When pages <= budget the selection is exactly all valid pages —
    this is the dense fallback (`QuestAttention.py:125-133`) unified."""
    B, H, P, page, K = 1, 2, 10, 4, 8
    scores = jnp.zeros((B, H, P), jnp.float32)
    seq_lens = jnp.asarray([3 * page + 1])  # 4 pages < budget 8
    idx, num_valid = select_pages(scores, seq_lens, page, K)
    assert int(num_valid[0]) == 4
    for h in range(H):
        assert set(np.asarray(idx)[0, h, :4].tolist()) == {0, 1, 2, 3}


def test_topk_approx_mixed_batch_matches_exact_set():
    """A batch mixing long rows with a short row (num_pages near the
    budget) must select the same page SET under method="approx" as
    under "exact": the runtime lax.cond guard forces the exact sort
    whenever any row is short (ADVICE r1; bin collisions in
    approx_max_k would otherwise drop valid pages of the short row).
    Off-TPU approx statically falls back to exact; on TPU this
    exercises the cond path."""
    rng = np.random.default_rng(9)
    B, H, P, page, K = 2, 4, 1024, 16, 128
    scores = jnp.asarray(rng.standard_normal((B, H, P)).astype(np.float32))
    # Row 0 long (1024 pages >> 4*128); row 1 short (130 pages ~ budget).
    seq_lens = jnp.asarray([P * page, 130 * page - 3], jnp.int32)
    ex_idx, ex_nv = select_pages(scores, seq_lens, page, K, method="exact")
    ap_idx, ap_nv = select_pages(scores, seq_lens, page, K, method="approx")
    np.testing.assert_array_equal(np.asarray(ex_nv), np.asarray(ap_nv))
    for b in range(B):
        nv = int(ex_nv[b])
        for h in range(H):
            assert (set(np.asarray(ap_idx)[b, h, :nv].tolist())
                    == set(np.asarray(ex_idx)[b, h, :nv].tolist()))


def test_topk_exact_fast_matches_exact_set():
    """"exact_fast" (approx_max_k + exactness certificate + cond
    fallback) must return the same page SET as "exact" — its
    certificate guarantees it; on TPU this exercises the certified
    branch, off-TPU the static fallback."""
    rng = np.random.default_rng(17)
    B, H, P, page, K = 2, 4, 1024, 16, 128
    scores = jnp.asarray(rng.standard_normal((B, H, P)).astype(np.float32))
    seq_lens = jnp.asarray([P * page, 517 * page - 5], jnp.int32)
    ex_idx, ex_nv = select_pages(scores, seq_lens, page, K, method="exact")
    ef_idx, ef_nv = select_pages(scores, seq_lens, page, K,
                                 method="exact_fast")
    np.testing.assert_array_equal(np.asarray(ex_nv), np.asarray(ef_nv))
    for b in range(B):
        nv = int(ex_nv[b])
        for h in range(H):
            assert (set(np.asarray(ef_idx)[b, h, :nv].tolist())
                    == set(np.asarray(ex_idx)[b, h, :nv].tolist()))


def test_pallas_estimate_kernel_matches_einsum():
    from quest_tpu.ops.estimate import page_scores_kernel
    rng = np.random.default_rng(4)
    B, Hq, Hkv, P, D = 2, 8, 2, 24, 128
    q = jnp.asarray(rng.standard_normal((B, Hq, D)).astype(np.float32))
    kmax = jnp.asarray(rng.standard_normal((B, Hkv, P, D)).astype(np.float32))
    kmin = kmax - jnp.asarray(
        np.abs(rng.standard_normal((B, Hkv, P, D))).astype(np.float32))
    for agg in ("max", "sum"):
        want = page_scores(q, kmax, kmin, group_agg=agg)
        got = page_scores_kernel(q, kmax, kmin, group_agg=agg, block_p=8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-3)
    # whole-pool mode with a static layer index
    kmaxL = jnp.stack([kmax, kmax * 0.5], axis=0)
    kminL = jnp.stack([kmin, kmin * 0.5], axis=0)
    got = page_scores_kernel(q, kmaxL, kminL, layer=1, block_p=8)
    want = page_scores(q, kmax * 0.5, kmin * 0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_fp8_metadata_selection_overlap():
    """meta_dtype=float8_e4m3fn: criticality is a ranking heuristic, so
    fp8 metadata must produce near-identical selections (and the engine
    must run end-to-end with it)."""
    import jax
    from quest_tpu.config import ModelConfig, QuestConfig, RopeConfig
    from quest_tpu.engine import QuestEngine
    from quest_tpu.kv.paged_kv import LayerKV, append_prefill, init_cache
    from quest_tpu.models.llama import init_params

    rng = np.random.default_rng(6)
    B, H, D, page, T = 1, 4, 128, 8, 256
    model = ModelConfig(num_heads=H, num_kv_heads=H, head_dim=D)
    base = QuestConfig(page_size=page, token_budget=64, max_seq_len=512,
                       kv_dtype=jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, H, D)).astype(np.float32))
    seq = jnp.asarray([T], jnp.int32)

    sels = {}
    for name, mdt in (("f32", None), ("fp8", jnp.float8_e4m3fn)):
        quest = QuestConfig(page_size=page, token_budget=64,
                            max_seq_len=512, kv_dtype=jnp.float32,
                            meta_dtype=mdt)
        layer = init_cache(model, quest, batch_size=B, num_layers=1).layer(0)
        layer = append_prefill(layer, k_new, k_new)
        scores = page_scores(q, layer.k_max, layer.k_min)
        idx, nv = select_pages(scores, seq, page, 8)
        sels[name] = np.asarray(idx)[0, :, :int(nv[0])]
    overlap = np.mean([
        len(set(sels["f32"][h]) & set(sels["fp8"][h])) / len(sels["f32"][h])
        for h in range(H)])
    assert overlap >= 0.75, overlap   # random data is the worst case

    # engine end-to-end with fp8 metadata
    cfg = ModelConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=4,
                      head_dim=16, rope=RopeConfig(), dtype=jnp.float32)
    quest = QuestConfig(page_size=8, token_budget=32, max_seq_len=128,
                        skip_layers=1, kv_dtype=jnp.float32,
                        meta_dtype=jnp.float8_e4m3fn)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    eng = QuestEngine(cfg, quest, params, prefill_bucket=16)
    out = eng.generate([rng.integers(1, 256, size=20).tolist()],
                       max_new_tokens=4)
    assert len(out[0]) == 4


def test_repair_approx_rows():
    """Per-row soundness repair for approx selection (ops/topk.py):
    rows with -inf below num_valid or short rows get their last
    min(K, num_pages) pages; healthy long rows keep approx output."""
    import jax.numpy as jnp
    from quest_tpu.ops.topk import _repair_approx

    K = 4
    # [B=3, H=1, K]: row 0 healthy-long (num_pages=32), row 1 has an
    # -inf surfaced below num_valid (num_pages=16), row 2 short
    # (num_pages=3 <= K).
    av = jnp.asarray([[[9.0, 8.0, 7.0, 6.0]],
                      [[9.0, -jnp.inf, 7.0, 6.0]],
                      [[jnp.inf, 1.0, -jnp.inf, -jnp.inf]]])
    ai = jnp.asarray([[[31, 2, 17, 5]],
                      [[15, 0, 3, 7]],
                      [[2, 0, 9, 9]]], dtype=jnp.int32)
    num_pages = jnp.asarray([32, 16, 3], jnp.int32)
    out = np.asarray(_repair_approx(av, ai, num_pages, K))
    assert out[0, 0].tolist() == [31, 2, 17, 5]        # untouched
    assert out[1, 0].tolist() == [12, 13, 14, 15]      # last-K window
    assert out[2, 0].tolist() == [0, 1, 2, 3]          # == all pages
