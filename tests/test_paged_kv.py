"""Paged KV append + min/max metadata vs naive recompute.

Mirrors the reference's `test_page.cu` strategy (683 LoC,
`/root/reference/kernels/src/test/test_page.cu`): prefill appends,
decode appends, and mixed sequences must produce both correct KV pages
and correct per-page min/max metadata over *valid* entries only.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from quest_tpu.config import ModelConfig, QuestConfig, tiny_test_model
from quest_tpu.kv.paged_kv import (LayerKV, append_decode, append_prefill,
                                   init_cache)


def naive_metadata(k_tokens, seq_len, page_size, max_pages):
    """k_tokens [B, T, Hkv, D] (first seq_len valid) -> min/max [B,Hkv,P,D]."""
    B, T, H, D = k_tokens.shape
    kmin = np.zeros((B, H, max_pages, D), np.float32)
    kmax = np.zeros((B, H, max_pages, D), np.float32)
    for b in range(B):
        n = seq_len[b]
        for p in range((n + page_size - 1) // page_size):
            lo, hi = p * page_size, min((p + 1) * page_size, n)
            seg = k_tokens[b, lo:hi]  # [t, H, D]
            kmin[b, :, p] = seg.min(axis=0)
            kmax[b, :, p] = seg.max(axis=0)
    return kmin, kmax


def run_appends(B, page_size, max_pages, H, D, steps, seed=0):
    """steps: list of ints (tokens per append; 1 => decode append)."""
    rng = np.random.default_rng(seed)
    quest = QuestConfig(page_size=page_size,
                        max_seq_len=page_size * max_pages,
                        kv_dtype=jnp.float32)
    model = ModelConfig(num_kv_heads=H, num_heads=H, head_dim=D)
    cache = init_cache(model, quest, batch_size=B, num_layers=1)
    layer = cache.layer(0)

    all_k = np.zeros((B, 0, H, D), np.float32)
    all_v = np.zeros((B, 0, H, D), np.float32)
    seq_len = np.zeros((B,), np.int32)
    for t in steps:
        k = rng.standard_normal((B, t, H, D)).astype(np.float32)
        v = rng.standard_normal((B, t, H, D)).astype(np.float32)
        all_k = np.concatenate([all_k, k], axis=1)
        all_v = np.concatenate([all_v, v], axis=1)
        if t == 1:
            layer = append_decode(layer, jnp.asarray(k[:, 0]),
                                  jnp.asarray(v[:, 0]))
        else:
            layer = append_prefill(layer, jnp.asarray(k), jnp.asarray(v))
        seq_len = seq_len + t
        layer = LayerKV(layer.kv_pages, layer.k_max, layer.k_min,
                        jnp.asarray(seq_len))
    return layer, all_k, all_v, seq_len


@pytest.mark.parametrize("steps", [
    [37],                 # single prefill, partial last page
    [16],                 # exactly one page
    [1] * 5,              # pure decode from empty
    [33, 1, 1, 1],        # prefill then decode across a page boundary
    [16, 1],              # decode opens a fresh page
    [5, 12, 1, 30, 1],    # chunked prefill mixed with decode
])
def test_append_and_metadata(steps):
    B, page_size, max_pages, H, D = 2, 8, 12, 3, 16
    layer, all_k, all_v, seq_len = run_appends(B, page_size, max_pages, H, D,
                                               steps)
    T = all_k.shape[1]

    # KV contents: flattened token view must equal the appended stream.
    B_, H_, P_, page_, D_ = layer.k_pages.shape
    k_flat = layer.k_pages.reshape(B_, H_, P_ * page_, D_)
    v_flat = layer.v_pages.reshape(B_, H_, P_ * page_, D_)
    got_k = np.asarray(k_flat)[:, :, :T]          # [B, H, T, D]
    want_k = all_k.transpose(0, 2, 1, 3)
    np.testing.assert_allclose(got_k, want_k, rtol=0, atol=0)
    got_v = np.asarray(v_flat)[:, :, :T]
    np.testing.assert_allclose(got_v, all_v.transpose(0, 2, 1, 3))

    # Metadata over valid entries.
    want_min, want_max = naive_metadata(all_k, seq_len, page_size, max_pages)
    num_pages = (seq_len + page_size - 1) // page_size
    for b in range(B):
        for_p = num_pages[b]
        np.testing.assert_allclose(np.asarray(layer.k_min)[b, :, :for_p],
                                   want_min[b, :, :for_p], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(layer.k_max)[b, :, :for_p],
                                   want_max[b, :, :for_p], rtol=1e-6)


def test_mixed_seq_lens_padded_prefill():
    """Batched prefill with per-sequence real lengths below padded T."""
    B, page_size, max_pages, H, D = 2, 8, 8, 2, 16
    rng = np.random.default_rng(3)
    quest = QuestConfig(page_size=page_size,
                        max_seq_len=page_size * max_pages,
                        kv_dtype=jnp.float32)
    model = ModelConfig(num_kv_heads=H, num_heads=H, head_dim=D)
    cache = init_cache(model, quest, batch_size=B, num_layers=1)
    layer = cache.layer(0)

    T = 20
    new_lens = np.array([20, 13], np.int32)
    k = rng.standard_normal((B, T, H, D)).astype(np.float32)
    v = rng.standard_normal((B, T, H, D)).astype(np.float32)
    layer = append_prefill(layer, jnp.asarray(k), jnp.asarray(v),
                           new_lens=jnp.asarray(new_lens))
    want_min, want_max = naive_metadata(k, new_lens, page_size, max_pages)
    for b in range(B):
        npages = (new_lens[b] + page_size - 1) // page_size
        np.testing.assert_allclose(np.asarray(layer.k_min)[b, :, :npages],
                                   want_min[b, :, :npages], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(layer.k_max)[b, :, :npages],
                                   want_max[b, :, :npages], rtol=1e-6)


def test_fp8_kv_cache_roundtrip_and_attention():
    """fp8 (e4m3) KV storage (QuestConfig.kv_dtype): appends quantize
    on write, attention kernels read fp8 pages directly; output matches
    an oracle fed the same fp8-stored values (storage rounding is the
    only error source)."""
    from quest_tpu.ops.dense_decode import dense_decode_attention
    from quest_tpu.ops.reference import (dense_decode_attention_reference,
                                         sparse_decode_attention_reference)
    from quest_tpu.ops.sparse_decode import sparse_decode_attention
    from quest_tpu.ops.topk import select_pages
    from quest_tpu.ops.estimate import page_scores

    B, page_size, max_pages, H, D = 1, 8, 16, 2, 64
    rng = np.random.default_rng(11)
    quest = QuestConfig(page_size=page_size,
                        max_seq_len=page_size * max_pages,
                        token_budget=4 * page_size,
                        kv_dtype=jnp.float8_e4m3fn)
    model = ModelConfig(num_kv_heads=H, num_heads=H, head_dim=D)
    cache = init_cache(model, quest, batch_size=B, num_layers=1)
    layer = cache.layer(0)

    T = 100
    k = (rng.standard_normal((B, T, H, D)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((B, T, H, D)) * 0.3).astype(np.float32)
    layer = append_prefill(layer, jnp.asarray(k), jnp.asarray(v))
    assert layer.kv_pages.dtype == jnp.float8_e4m3fn

    # Round-trip: stored pages match an fp8 cast of the inputs.
    stored_k = np.asarray(
        layer.kv_pages[0, :, :, 0].astype(jnp.float32))  # [H, P, page, D]
    want_k = np.asarray(
        jnp.asarray(k).astype(jnp.float8_e4m3fn).astype(jnp.float32))
    got_flat = stored_k.transpose(1, 2, 0, 3).reshape(-1, H, D)[:T]
    np.testing.assert_allclose(got_flat, want_k[0], rtol=0, atol=0)

    seq = jnp.asarray([T], jnp.int32)
    q = jnp.asarray((rng.standard_normal((B, H, D)) * 0.3).astype(np.float32))
    sm = 1.0 / np.sqrt(D)
    kf = layer.kv_pages[:, :, :, 0].astype(jnp.float32)
    vf = layer.kv_pages[:, :, :, 1].astype(jnp.float32)

    dense = dense_decode_attention(q, layer.kv_pages, seq, sm_scale=sm)
    # oracle over the flat fp8-stored values
    k_flat = kf.transpose(0, 1, 2, 3, 4).reshape(B, H, -1, D)[:, :, :T]
    v_flat = vf.reshape(B, H, -1, D)[:, :, :T]
    want = dense_decode_attention_reference(q, k_flat, v_flat, seq, sm)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(want),
                               rtol=3e-3, atol=3e-3)

    scores = page_scores(q, layer.k_max, layer.k_min)
    idx, nv = select_pages(scores, seq, page_size, quest.page_budget)
    sparse = sparse_decode_attention(q, layer.kv_pages, idx, nv, seq,
                                     sm_scale=sm, pages_per_block=2)
    want_s = sparse_decode_attention_reference(q, kf, vf, idx, nv, seq, sm)
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(want_s),
                               rtol=3e-3, atol=3e-3)


def test_shared_blocks_carry_metadata():
    """Metadata is keyed by PHYSICAL block (kv/paged_kv.py), so a
    prefix-cache borrower that aliases a donor's blocks into its table
    row sees the donor's append-time min/max metadata bit-exactly, with
    zero device work at admission (round 3 recomputed it from KV data
    per admission — machinery this layout deletes)."""
    import dataclasses as dc

    from quest_tpu.kv.paged_kv import append_prefill_at

    rng = np.random.default_rng(4)
    page, H, D, B = 8, 2, 32, 2
    quest = QuestConfig(page_size=page, max_seq_len=page * 64,
                        kv_dtype=jnp.float32, block_pages=4)
    model = ModelConfig(num_kv_heads=H, num_heads=H, head_dim=D)
    cache = init_cache(model, quest, batch_size=B, num_layers=2)
    T = 80                               # 10 full pages = 2.5 blocks
    k = rng.standard_normal((B, T, H, D)).astype(np.float32)
    v = rng.standard_normal((B, T, H, D)).astype(np.float32)
    # Only slot 0 (the donor) prefills; slot 1 stays empty.
    lens = jnp.asarray([T, 0], jnp.int32)
    for l in range(2):
        cache = append_prefill_at(cache, l, jnp.asarray(k),
                                  jnp.asarray(v), new_lens=lens)
    cache = dc.replace(cache, seq_lens=jnp.asarray([T, 0], jnp.int32))

    donor = np.asarray(cache.block_tab)[0]
    n_shared_blocks = 2                  # 8 full pages
    # "Admission": alias the donor's first blocks into slot 1's row.
    row1 = np.asarray(cache.block_tab)[1].copy()
    row1[:n_shared_blocks] = donor[:n_shared_blocks]
    cache = dc.replace(
        cache,
        block_tab=cache.block_tab.at[1].set(jnp.asarray(row1)),
        seq_lens=jnp.asarray([T, n_shared_blocks * 4 * page], jnp.int32))

    view = cache.layer(1)
    n_pages = n_shared_blocks * 4
    view0 = cache.layer(0)
    np.testing.assert_array_equal(
        np.asarray(view.k_max)[1, :, :n_pages],
        np.asarray(view0.k_max)[0, :, :n_pages])
    np.testing.assert_array_equal(
        np.asarray(view.k_min)[1, :, :n_pages],
        np.asarray(view0.k_min)[0, :, :n_pages])
    # And the borrower's scores over shared pages equal the donor's.
    from quest_tpu.ops.estimate import page_scores_physical
    q = jnp.asarray(rng.standard_normal((B, H, D)).astype(np.float32))
    qq = jnp.stack([q[0], q[0]])         # same query in both slots
    s = page_scores_physical(qq, cache.k_max[0], cache.k_min[0],
                             cache.block_tab, group_agg="sum")
    np.testing.assert_allclose(np.asarray(s)[1, :, :n_pages],
                               np.asarray(s)[0, :, :n_pages], rtol=1e-6)
