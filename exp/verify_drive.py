"""On-chip verify drive: estimate -> select -> sparse decode vs oracles.

Covers the round-2 changes: per_q_head selection mode, approx-topk
runtime cond guard (mixed long/short batch), fp8-metadata query dtype,
group_agg=sum default. Run under timeout on the real chip.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from quest_tpu.ops.estimate import page_scores, page_scores_kernel
    from quest_tpu.ops.reference import (
        sparse_decode_attention_reference)
    from quest_tpu.ops.sparse_decode import sparse_decode_attention
    from quest_tpu.ops.topk import select_pages

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)

    def relerr(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return np.abs(a - b).max() / (np.abs(b).max() + 1e-9)

    # Geometry sweep: (B, Hq, Hkv, D, page, P, budget, seq_lens)
    cases = [
        ("mha", 1, 8, 8, 128, 16, 64, 8, [64 * 16 - 5]),
        ("gqa", 2, 8, 2, 128, 16, 64, 8, [900, 230]),
        ("short", 1, 4, 4, 128, 16, 16, 8, [40]),
    ]
    for name, B, Hq, Hkv, D, page, P, S, seqs in cases:
        kv = jnp.asarray(rng.standard_normal(
            (B, Hkv, P, 2, page, D)).astype(np.float32), jnp.bfloat16)
        q = jnp.asarray(rng.standard_normal((B, Hq, D)).astype(np.float32))
        seq = jnp.asarray(seqs, jnp.int32)
        sm = 1.0 / np.sqrt(D)
        kmax = kv[:, :, :, 0].max(axis=3)
        kmin = kv[:, :, :, 0].min(axis=3)
        scores = page_scores(q, kmax, kmin, group_agg="sum")
        idx, nv = select_pages(scores, seq, page, S)
        got = sparse_decode_attention(q, kv, idx, nv, seq, sm_scale=sm,
                                      interpret=False)
        want = sparse_decode_attention_reference(
            q, kv[:, :, :, 0].astype(jnp.float32),
            kv[:, :, :, 1].astype(jnp.float32), idx, nv, seq, sm)
        e = relerr(got, want)
        print(f"{name}: rel_err {e:.2e}", flush=True)
        assert e < 2e-2, name

        # per-q-head mode vs expanded oracle
        G = Hq // Hkv
        sq = jnp.asarray(rng.standard_normal((B, Hq, P)).astype(np.float32))
        idxq, nvq = select_pages(sq, seq, page, S)
        gotq = sparse_decode_attention(q, kv, idxq, nvq, seq, sm_scale=sm,
                                       per_q_head=True, interpret=False)
        k_exp = jnp.repeat(kv[:, :, :, 0], G, axis=1).astype(jnp.float32)
        v_exp = jnp.repeat(kv[:, :, :, 1], G, axis=1).astype(jnp.float32)
        wantq = sparse_decode_attention_reference(q, k_exp, v_exp, idxq,
                                                  nvq, seq, sm)
        eq = relerr(gotq, wantq)
        print(f"{name} per_q_head: rel_err {eq:.2e}", flush=True)
        assert eq < 2e-2, name

    # approx-topk per-row repair: a mixed batch must be SOUND on every
    # row (valid distinct ids, forced last page); the num_pages <= K
    # row must equal the exact (= all-pages) selection. Rows slightly
    # above the budget keep approx semantics (score-based, sound) —
    # the r2 cond guard made them exact at a ~40 us/step fusion
    # barrier, r3 trades that back (ops/topk.py:_repair_approx).
    B, H, P, page, K = 2, 4, 1024, 16, 128
    sc = jnp.asarray(rng.standard_normal((B, H, P)).astype(np.float32))
    seq = jnp.asarray([P * page, 100 * page - 3], jnp.int32)
    exi, exn = select_pages(sc, seq, page, K, method="exact")
    api, apn = select_pages(sc, seq, page, K, method="approx")
    assert (np.asarray(exn) == np.asarray(apn)).all()
    for b in range(B):
        nvb = int(exn[b])
        npg = (int(seq[b]) + page - 1) // page
        for h in range(H):
            got = np.asarray(api)[b, h, :nvb].tolist()
            assert len(set(got)) == nvb, (b, h)          # distinct
            assert all(0 <= g < npg for g in got), (b, h)  # valid
            assert (npg - 1) in got, (b, h)              # last page
            if npg <= K:                                  # == exact
                assert (set(got)
                        == set(np.asarray(exi)[b, h, :nvb].tolist())), (b, h)
    print("approx per-row repair (mixed batch) sound: ok", flush=True)
    # All-long batch takes the approx branch; last page must survive.
    seq2 = jnp.asarray([P * page, P * page - 7], jnp.int32)
    ap2, nv2 = select_pages(sc, seq2, page, K, method="approx")
    for b in range(B):
        last = (int(seq2[b]) + page - 1) // page - 1
        for h in range(H):
            assert last in np.asarray(ap2)[b, h, :int(nv2[b])].tolist()
    print("approx branch (all-long batch): ok", flush=True)

    # fp8 metadata: kernel vs einsum selection overlap.
    f8 = jnp.float8_e4m3fn
    B, Hq, Hkv, D, P = 1, 8, 8, 128, 256
    q = jnp.asarray(rng.standard_normal((B, Hq, D)).astype(np.float32))
    kmax = jnp.asarray(rng.standard_normal(
        (B, Hkv, P, D)).astype(np.float32), f8)
    kmin = -jnp.abs(kmax)
    s_ein = page_scores(q, kmax, kmin, group_agg="sum")
    s_ker = page_scores_kernel(q, kmax, kmin, group_agg="sum",
                               interpret=False, block_p=128)
    seq = jnp.asarray([P * 16], jnp.int32)
    i1, _ = select_pages(s_ein, seq, 16, 32)
    i2, _ = select_pages(s_ker, seq, 16, 32)
    ov = np.mean([len(set(np.asarray(i1)[0, h].tolist())
                      & set(np.asarray(i2)[0, h].tolist())) / 32
                  for h in range(Hkv)])
    print(f"fp8 meta kernel/einsum selection overlap: {ov:.3f}", flush=True)
    assert ov > 0.9, ov
    print("ALL OK", flush=True)


def fused():
    """Fused megakernel vs oracle, Mosaic-compiled on the chip."""
    import jax
    import jax.numpy as jnp

    from quest_tpu.ops.estimate import page_scores
    from quest_tpu.ops.fused_decode import fused_sparse_decode
    from quest_tpu.ops.reference import sparse_decode_attention_reference
    from quest_tpu.ops.topk import select_pages

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(1)

    def relerr(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return np.abs(a - b).max() / (np.abs(b).max() + 1e-9)

    cases = [
        ("mha", 1, 8, 8, 128, 16, 256, 32, [256 * 16 - 5]),
        ("gqa", 2, 8, 2, 128, 16, 256, 32, [3900, 700]),
        ("short", 1, 4, 4, 128, 16, 128, 64, [500]),
    ]
    for name, B, Hq, Hkv, D, page, P, S, seqs in cases:
        kv = jnp.asarray(rng.standard_normal(
            (B, Hkv, P, 2, page, D)).astype(np.float32), jnp.bfloat16)
        q = jnp.asarray(rng.standard_normal((B, Hq, D)).astype(np.float32))
        seq = jnp.asarray(seqs, jnp.int32)
        sm = 1.0 / np.sqrt(D)
        kmax = kv[:, :, :, 0].max(axis=3)
        kmin = kv[:, :, :, 0].min(axis=3)
        scores = page_scores(q, kmax, kmin, group_agg="sum")
        idx, nv = select_pages(scores, seq, page, S)
        want = sparse_decode_attention_reference(
            q, kv[:, :, :, 0].astype(jnp.float32),
            kv[:, :, :, 1].astype(jnp.float32), idx, nv, seq, sm)
        for sg in sorted({1, Hkv}):       # serial + batched selection
            got = fused_sparse_decode(q, kv, kmax, kmin, seq,
                                      sm_scale=sm, budget_pages=S,
                                      select_group=sg, gather_slots=3,
                                      interpret=False)
            e = relerr(got, want)
            print(f"fused {name} SG={sg}: rel_err {e:.2e}", flush=True)
            assert e < 2e-2, (name, sg, e)
    print("FUSED OK", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "fused":
        fused()
    else:
        main()
