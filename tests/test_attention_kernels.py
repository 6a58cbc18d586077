"""Pallas attention kernels vs eager oracles.

Test strategy mirrors the reference's gtest sweeps
(`/root/reference/kernels/src/test/test_batch_decode.cu:215-265`):
randomized inputs over seq-len × page-size × budget × head-dim grids,
checked against the `selected_single_mha`-style oracles, including the
"injected indices" trick (`test_approx_attention.py:179-190`) that
decouples top-k tie-breaking from attention correctness.

Kernels consume the packed pool layout ``[B, H, P, 2, page, D]``
(kv/paged_kv.py); oracles take unpacked views so they stay independent
of the serving layout. Runs in Pallas interpreter mode on the CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quest_tpu.ops.dense_decode import dense_decode_attention
from quest_tpu.ops.prefill import prefill_attention
from quest_tpu.ops.reference import (dense_decode_attention_reference,
                                     prefill_attention_reference,
                                     sparse_decode_attention_reference)
from quest_tpu.ops.sparse_decode import sparse_decode_attention
from quest_tpu.ops.topk import select_pages


def make_packed(rng, B, Hkv, P, page, D, dtype=np.float32):
    """Returns (kv_pages [B,H,P,2,page,D], k_pages, v_pages views)."""
    kv = rng.standard_normal((B, Hkv, P, 2, page, D)).astype(dtype)
    kv = jnp.asarray(kv)
    return kv, kv[:, :, :, 0], kv[:, :, :, 1]


def flat_to_packed(k_flat, v_flat, page):
    """[B,H,T,D] pair -> packed pages (T padded up to a page multiple)."""
    B, H, T, D = k_flat.shape
    pad = (-T) % page
    k = jnp.pad(k_flat, ((0, 0), (0, 0), (0, pad), (0, 0)))
    v = jnp.pad(v_flat, ((0, 0), (0, 0), (0, pad), (0, 0)))
    P = (T + pad) // page
    return jnp.stack([k.reshape(B, H, P, page, D),
                      v.reshape(B, H, P, page, D)], axis=3)


@pytest.mark.parametrize("seq_lens,page,budget,Hq,Hkv,D,ppb,nslot", [
    ([63], 16, 4, 4, 4, 64, 2, 2),        # MHA, partial last page
    ([129, 47], 16, 4, 4, 4, 64, 2, 2),   # batch of 2, different lengths
    ([257], 16, 8, 8, 2, 64, 4, 2),       # GQA group of 4
    ([95], 8, 3, 2, 2, 128, 2, 2),        # page 8, head_dim 128
    ([33], 16, 16, 4, 4, 64, 8, 2),       # budget > pages: dense fallback
    ([16], 16, 4, 2, 2, 64, 2, 2),        # exactly one full page
    ([500], 4, 7, 2, 1, 64, 3, 2),        # small pages, odd budget/ppb
    ([129, 47, 200], 16, 4, 4, 4, 64, 2, 4),  # deep slot ring, batch 3
    ([257], 16, 8, 4, 4, 64, 2, 3),       # odd slot ring
])
def test_sparse_decode_matches_oracle(seq_lens, page, budget, Hq, Hkv, D,
                                      ppb, nslot):
    rng = np.random.default_rng(hash((tuple(seq_lens), page, budget)) % 2**31)
    B = len(seq_lens)
    P = max((s + page - 1) // page for s in seq_lens) + 2
    kv_pages, k_pages, v_pages = make_packed(rng, B, Hkv, P, page, D)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)).astype(np.float32))
    seq = jnp.asarray(np.array(seq_lens, np.int32))
    sm = 1.0 / np.sqrt(D)

    # Inject indices from random scores (tie-break independent of kernel).
    scores = jnp.asarray(rng.standard_normal((B, Hkv, P)).astype(np.float32))
    idx, num_valid = select_pages(scores, seq, page, budget)

    want = sparse_decode_attention_reference(q, k_pages, v_pages, idx,
                                             num_valid, seq, sm)
    got = sparse_decode_attention(q, kv_pages, idx, num_valid, seq,
                                  sm_scale=sm, pages_per_block=ppb,
                                  num_slots=nslot)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("seq_lens,Hq,Hkv,D,block_t", [
    ([63], 4, 4, 64, 32),
    ([129, 47], 4, 2, 64, 64),
    ([255], 8, 8, 128, 128),
    ([1], 2, 2, 64, 16),
])
def test_dense_decode_matches_oracle(seq_lens, Hq, Hkv, D, block_t):
    rng = np.random.default_rng(0)
    B = len(seq_lens)
    T = max(seq_lens) + 17
    page = 16
    k = jnp.asarray(rng.standard_normal((B, Hkv, T, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, Hkv, T, D)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, Hq, D)).astype(np.float32))
    seq = jnp.asarray(np.array(seq_lens, np.int32))
    sm = 1.0 / np.sqrt(D)

    want = dense_decode_attention_reference(q, k, v, seq, sm)
    got = dense_decode_attention(q, flat_to_packed(k, v, page), seq,
                                 sm_scale=sm, block_t=block_t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("seq_lens,page,budget,Hq,Hkv,D,hb,nslot,kvdt", [
    # Single-block fast path (pages_per_block >= budget -> nb == 1,
    # ops/sparse_decode.py:_kernel_1blk), incl. multi-head blocks and
    # fp8 pool storage (k/v upcast post-load; q stays >= bf16).
    ([63], 16, 4, 4, 4, 64, 0, 3, np.float32),     # MHA, auto hb
    ([129, 47], 16, 4, 4, 4, 64, 2, 3, np.float32),  # hb=2, batch 2
    ([257], 16, 8, 8, 2, 64, 2, 2, np.float32),    # GQA group 4, hb=2
    ([95, 200, 33], 8, 6, 2, 2, 128, 1, 2, np.float32),  # hb=1, batch 3
    ([500], 4, 7, 3, 3, 64, 1, 3, np.float32),     # odd head count
    ([129, 47], 16, 4, 4, 4, 64, 2, 3, jnp.float8_e4m3fn),  # fp8 pool
])
def test_sparse_decode_single_block_fast_path(seq_lens, page, budget, Hq,
                                              Hkv, D, hb, nslot, kvdt):
    rng = np.random.default_rng(hash((tuple(seq_lens), page, budget, hb,
                                      str(kvdt))) % 2**31)
    B = len(seq_lens)
    P = max((s + page - 1) // page for s in seq_lens) + 2
    kv_pages, _, _ = make_packed(rng, B, Hkv, P, page, D)
    kv_pages = kv_pages.astype(kvdt)
    # Oracle sees the SAME stored values under the kernels' declared
    # upcast semantics (integer-ops fp8->bf16 with flush-to-zero for
    # e4m3 denormals; exact for normals — ops/pallas_utils.upcast_fp8).
    from quest_tpu.ops.pallas_utils import upcast_fp8
    k_pages = upcast_fp8(kv_pages[:, :, :, 0]).astype(jnp.float32)
    v_pages = upcast_fp8(kv_pages[:, :, :, 1]).astype(jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)).astype(np.float32))
    seq = jnp.asarray(np.array(seq_lens, np.int32))
    sm = 1.0 / np.sqrt(D)

    scores = jnp.asarray(rng.standard_normal((B, Hkv, P)).astype(np.float32))
    idx, num_valid = select_pages(scores, seq, page, budget)

    want = sparse_decode_attention_reference(q, k_pages, v_pages, idx,
                                             num_valid, seq, sm)
    got = sparse_decode_attention(q, kv_pages, idx, num_valid, seq,
                                  sm_scale=sm, num_slots=nslot,
                                  heads_per_block=hb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=4e-3, atol=4e-3)


def test_dense_and_prefill_fp8_pool():
    """fp8 KV pages through the dense-decode and prefill kernels: the
    query stays bf16 (itemsize guard) and k/v upcast post-load; checked
    against f32 oracles over the SAME fp8-rounded stored values."""
    from quest_tpu.ops.reference import prefill_attention_reference
    rng = np.random.default_rng(5)
    B, Hq, Hkv, D, page = 2, 4, 2, 64, 16
    seq_lens = [63, 129]
    T = max(seq_lens)
    k = rng.standard_normal((B, Hkv, T + 15, D)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, T + 15, D)).astype(np.float32)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)).astype(np.float32))
    seq = jnp.asarray(np.array(seq_lens, np.int32))
    sm = 1.0 / np.sqrt(D)
    packed = flat_to_packed(jnp.asarray(k), jnp.asarray(v), page)
    from quest_tpu.ops.pallas_utils import upcast_fp8
    packed8 = packed.astype(jnp.float8_e4m3fn)
    k8 = np.asarray(upcast_fp8(packed8[:, :, :, 0]).astype(jnp.float32))
    v8 = np.asarray(upcast_fp8(packed8[:, :, :, 1]).astype(jnp.float32))
    kf = k8.reshape(B, Hkv, -1, D)
    vf = v8.reshape(B, Hkv, -1, D)

    want = dense_decode_attention_reference(q, jnp.asarray(kf),
                                            jnp.asarray(vf), seq, sm)
    got = dense_decode_attention(q, packed8, seq, sm_scale=sm, block_t=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=4e-3, atol=4e-3)

    # Prefill: fresh queries over the fp8 cache (offsets 0).
    Tq = 32
    qp = jnp.asarray(rng.standard_normal((B, Tq, Hq, D)).astype(np.float32))
    off = jnp.zeros((B,), jnp.int32)
    want_p = prefill_attention_reference(qp, jnp.asarray(kf),
                                         jnp.asarray(vf), off, seq, sm)
    got_p = prefill_attention(qp, packed8, off, seq, sm_scale=sm,
                              block_q=16, block_k=32)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               rtol=4e-3, atol=4e-3)


def test_sparse_decode_without_last_page():
    """Hand-injected selections that EXCLUDE the current page (the
    kernel's lastslot=-1 path: no partial-fill masking applies) and
    have junk tail slots, vs the oracle."""
    rng = np.random.default_rng(11)
    B, Hq, Hkv, D, page, P = 2, 4, 2, 64, 16, 9
    seq = jnp.asarray([int(P * page - 5), 70])   # last pages: 8 and 4
    kv_pages, k_pages, v_pages = make_packed(rng, B, Hkv, P, page, D)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)).astype(np.float32))
    sm = 1.0 / np.sqrt(D)

    S = 4
    idx = np.zeros((B, Hkv, S), np.int32)
    idx[0, :, :] = [0, 2, 5, 7]      # excludes page 8 (the last)
    idx[1, :, :] = [1, 3, 3, 3]      # excludes page 4; junk tail repeats
    num_valid = jnp.asarray([4, 2], jnp.int32)
    idx = jnp.asarray(idx)

    want = sparse_decode_attention_reference(q, k_pages, v_pages, idx,
                                             num_valid, seq, sm)
    got = sparse_decode_attention(q, kv_pages, idx, num_valid, seq,
                                  sm_scale=sm, pages_per_block=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_sparse_with_all_pages_equals_dense():
    """Budget >= num_pages must reproduce dense attention exactly —
    the unified dense fallback (`QuestAttention.py:125-133`)."""
    rng = np.random.default_rng(7)
    B, Hq, Hkv, D, page, P = 1, 4, 4, 64, 8, 6
    seq = jnp.asarray([int(P * page - 3)])
    kv_pages, _, _ = make_packed(rng, B, Hkv, P, page, D)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)).astype(np.float32))
    sm = 1.0 / np.sqrt(D)

    scores = jnp.asarray(rng.standard_normal((B, Hkv, P)).astype(np.float32))
    idx, num_valid = select_pages(scores, seq, page, P + 2)
    sparse = sparse_decode_attention(q, kv_pages, idx, num_valid,
                                     seq, sm_scale=sm, pages_per_block=4)
    dense = dense_decode_attention(q, kv_pages, seq, sm_scale=sm,
                                   block_t=16)
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense),
                               rtol=2e-3, atol=2e-3)


def test_sparse_decode_per_q_head_selection():
    """``per_q_head=True``: reference-faithful per-QUERY-head page sets
    (`/root/reference/quest/utils/controller.py:106,119`; indices
    [B, Hq, S]) — checked against the oracle with each KV head expanded
    to its G query heads, so every query head gets its own page set."""
    rng = np.random.default_rng(3)
    B, Hq, Hkv, D, page, P = 2, 8, 2, 64, 16, 9
    G = Hq // Hkv
    seq = jnp.asarray([int(P * page - 5), 70])
    kv_pages, k_pages, v_pages = make_packed(rng, B, Hkv, P, page, D)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)).astype(np.float32))
    sm = 1.0 / np.sqrt(D)

    scores = jnp.asarray(rng.standard_normal((B, Hq, P)).astype(np.float32))
    idx, num_valid = select_pages(scores, seq, page, 4)

    k_exp = jnp.repeat(k_pages, G, axis=1)
    v_exp = jnp.repeat(v_pages, G, axis=1)
    want = sparse_decode_attention_reference(q, k_exp, v_exp, idx,
                                             num_valid, seq, sm)
    got = sparse_decode_attention(q, kv_pages, idx, num_valid, seq,
                                  sm_scale=sm, pages_per_block=2,
                                  per_q_head=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("T,offset,Hq,Hkv,D,bq,bk", [
    (33, 0, 4, 4, 64, 16, 32),       # fresh prefill, ragged T
    (64, 0, 4, 2, 64, 32, 32),       # GQA
    (17, 23, 2, 2, 64, 16, 16),      # chunked prefill with past
    (128, 0, 2, 2, 128, 128, 64),    # D=128
    (1, 40, 2, 1, 64, 16, 16),       # single-token chunk
    (48, 0, 6, 2, 64, 1024, 32),     # G=3: default block_q cap must
                                     # round to the 16-row tile
    (48, 0, 16, 2, 64, 1024, 32),    # G=8: fused rows capped at 1024
])
def test_prefill_matches_oracle(T, offset, Hq, Hkv, D, bq, bk):
    rng = np.random.default_rng(T * 31 + offset)
    B = 1
    page = 8
    Tkv = offset + T + 9          # cache has padding tail
    k = jnp.asarray(rng.standard_normal((B, Hkv, Tkv, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, Hkv, Tkv, D)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, T, Hq, D)).astype(np.float32))
    q_off = jnp.asarray([offset], jnp.int32)
    kv_lens = jnp.asarray([offset + T], jnp.int32)
    sm = 1.0 / np.sqrt(D)

    want = prefill_attention_reference(q, k, v, q_off, kv_lens, sm)
    got = prefill_attention(q, flat_to_packed(k, v, page), q_off, kv_lens,
                            sm_scale=sm, block_q=bq, block_k=bk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_prefill_batched_mixed_offsets():
    rng = np.random.default_rng(5)
    B, T, Hq, Hkv, D = 2, 24, 4, 2, 64
    page = 8
    offsets = np.array([0, 31], np.int32)
    Tkv = int(offsets.max()) + T + 5
    k = jnp.asarray(rng.standard_normal((B, Hkv, Tkv, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, Hkv, Tkv, D)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, T, Hq, D)).astype(np.float32))
    kv_lens = jnp.asarray(offsets + T, jnp.int32)
    sm = 1.0 / np.sqrt(D)
    want = prefill_attention_reference(q, k, v, jnp.asarray(offsets),
                                       kv_lens, sm)
    got = prefill_attention(q, flat_to_packed(k, v, page),
                            jnp.asarray(offsets), kv_lens,
                            sm_scale=sm, block_q=16, block_k=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_sorted_selection_flag_matches_default():
    """sorted_selection=True (static lastslot = num_valid-1, in-kernel
    table translation skipped-search path) must equal the default path
    on select_pages output (which sorts by page id and force-includes
    the current page)."""
    rng = np.random.default_rng(21)
    B, Hq, Hkv, D, page, P = 2, 4, 4, 64, 16, 11
    seq = jnp.asarray([int(P * page - 7), 90])
    kv_pages, _, _ = make_packed(rng, B, Hkv, P, page, D)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)).astype(np.float32))
    sm = 1.0 / np.sqrt(D)
    scores = jnp.asarray(rng.standard_normal((B, Hkv, P)).astype(np.float32))
    idx, nv = select_pages(scores, seq, page, 4)
    a = sparse_decode_attention(q, kv_pages, idx, nv, seq, sm_scale=sm)
    b = sparse_decode_attention(q, kv_pages, idx, nv, seq, sm_scale=sm,
                                sorted_selection=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)
