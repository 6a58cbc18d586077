"""Quantify the per-KV-head (group-aggregated) page-selection deviation.

The reference selects pages PER QUERY HEAD
(`/root/reference/quest/utils/controller.py:106,119`; sim path
`evaluation/quest_attention.py:139-184`). quest_tpu selects per KV head
with group aggregation (ops/estimate.py:page_scores group_agg max|sum) so
that GQA groups share gathered pages (G-fold gather-bandwidth reuse).
Identical for MHA; this experiment measures the cost for GQA (G=4).

Protocol (no checkpoints in this environment -> structured synthetic
data; caveat stated in docs/gqa_selection.md):
  keys[t] = per-kv-head channel bias + cluster direction + noise, with
  attention-sink tokens; each query head aligns with a random planted
  cluster subset, giving genuinely sparse, head-heterogeneous relevance
  (the hard case for sharing a selection across the group).

Metrics per (budget, method):
  overlap  = |S_method ^ S_perq| / |S_perq| per query head
  rel_err  = ||attn_restricted - attn_dense|| / ||attn_dense||
where attn_restricted is exact softmax attention over the selected
pages' tokens (page 16). Methods: perq (reference), agg_max, agg_sum.

Usage: python exp/gqa_selection.py [--seeds 8] [--ctx 8192]
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from __future__ import annotations

import argparse

import numpy as np


def make_inputs(rng, T, Hkv, G, D, n_clusters=24, n_sinks=4, seg=64,
                shared=0):
    """Span-structured relevance: the context is contiguous segments,
    each belonging to one topic cluster; each query head strongly
    prefers a few clusters OF ITS OWN (head-heterogeneous relevance
    inside the GQA group — the hard case for sharing a selection).
    Scales are set so matched-span logits dominate noise (peaked
    attention, like real long-context retrieval)."""
    Hq = Hkv * G
    # Per-kv-head channel bias (massive-activation analogue).
    bias = rng.standard_normal((Hkv, 1, D)) * 0.5
    heavy = rng.choice(D, size=8, replace=False)
    bias[:, :, heavy] *= 4.0
    # Cluster directions shared within a kv head.
    dirs = rng.standard_normal((Hkv, n_clusters, D))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    assign = np.repeat(rng.integers(0, n_clusters, size=T // seg), seg)
    k = (bias + 3.0 * dirs[:, assign, :]
         + 0.3 * rng.standard_normal((Hkv, T, D)))
    k[:, :n_sinks, :] *= 2.5                      # sink tokens
    v = rng.standard_normal((Hkv, T, D)).astype(np.float32)
    q = np.zeros((Hq, D))
    group_pick = {kv: rng.choice(n_clusters, size=3, replace=False)
                  for kv in range(Hkv)}
    for h in range(Hq):
        kv = h // G
        own = rng.choice(n_clusters, size=3, replace=False)
        pick = np.concatenate([group_pick[kv][:shared], own[shared:]])
        q[h] = (10.0 * dirs[kv, pick].sum(0)
                + 0.3 * rng.standard_normal(D))
    return (q.astype(np.float32), k.astype(np.float32), v)


def page_minmax(k, page):
    Hkv, T, D = k.shape
    P = T // page
    kp = k.reshape(Hkv, P, page, D)
    return kp.max(axis=2), kp.min(axis=2)


def page_scores_perq(q, kmax, kmin, G):
    # [Hq, D] x [Hkv, P, D] -> [Hq, P]  (sign-trick upper bound)
    Hq, D = q.shape
    kv = np.repeat(np.arange(kmax.shape[0]), G)
    qp, qn = np.maximum(q, 0), np.minimum(q, 0)
    return (np.einsum("hd,hpd->hp", qp, kmax[kv])
            + np.einsum("hd,hpd->hp", qn, kmin[kv]))


def select(scores, K, force_last=True):
    # scores [H, P] -> bool keep [H, P], last page always kept.
    H, P = scores.shape
    s = scores.copy()
    if force_last:
        s[:, -1] = np.inf
    idx = np.argpartition(-s, K - 1, axis=1)[:, :K]
    keep = np.zeros((H, P), bool)
    np.put_along_axis(keep, idx, True, axis=1)
    return keep


def attn(q, k, v, keep_tok, G, sm):
    # q [Hq,D], k/v [Hkv,T,D], keep_tok [Hq,T] -> [Hq,D]
    kv = np.repeat(np.arange(k.shape[0]), G)
    s = np.einsum("hd,htd->ht", q, k[kv]) * sm
    s = np.where(keep_tok, s, -np.inf)
    m = s.max(axis=1, keepdims=True)
    p = np.exp(s - m)
    p /= p.sum(axis=1, keepdims=True)
    return np.einsum("ht,htd->hd", p, v[kv])


def run_seed(seed, T, Hkv, G, D, page, budgets, shared=0):
    rng = np.random.default_rng(seed)
    q, k, v = make_inputs(rng, T, Hkv, G, D, shared=shared)
    Hq = Hkv * G
    sm = 1.0 / np.sqrt(D)
    kmax, kmin = page_minmax(k, page)
    P = T // page
    sq = page_scores_perq(q, kmax, kmin, G)         # [Hq, P]
    sg = sq.reshape(Hkv, G, P)
    dense = attn(q, k, v, np.ones((Hq, T), bool), G, sm)
    dn = np.linalg.norm(dense, axis=1)
    rows = {}
    for B in budgets:
        K = max(1, B // page)
        keep_q = select(sq, K)                       # per-q-head (reference)
        keep_max = np.repeat(select(sg.max(axis=1), K), G, axis=0)
        keep_sum = np.repeat(select(sg.sum(axis=1), K), G, axis=0)
        # Equal-gather-bytes alternative: per-q-head selection at K/G
        # pages per head (Hq*(K/G) = Hkv*K pages fetched, same as agg).
        keep_div = select(sq, max(1, K // G))
        for name, keep in [("perq", keep_q), ("agg_max", keep_max),
                           ("agg_sum", keep_sum), ("perq_div", keep_div)]:
            keep_tok = np.repeat(keep, page, axis=1)[:, :T]
            out = attn(q, k, v, keep_tok, G, sm)
            err = np.linalg.norm(out - dense, axis=1) / np.maximum(dn, 1e-9)
            ov = ((keep & keep_q).sum(1) / keep_q.sum(1))
            rows[(B, name)] = (float(err.mean()), float(err.max()),
                               float(ov.mean()))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=8192)
    ap.add_argument("--g", type=int, default=4)
    ap.add_argument("--hkv", type=int, default=8)
    ap.add_argument("--shared", type=int, default=0, help="clusters (of 3) shared across the GQA group")
    args = ap.parse_args()
    T, Hkv, G, D, page = args.ctx, args.hkv, args.g, 128, 16
    budgets = [256, 512, 1024, 2048]
    acc = {}
    for s in range(args.seeds):
        for key, val in run_seed(s, T, Hkv, G, D, page, budgets,
                         args.shared).items():
            acc.setdefault(key, []).append(val)
    print(f"ctx={T} page={page} Hkv={Hkv} G={G} D={D} "
          f"seeds={args.seeds} shared={args.shared}/3")
    print(f"{'budget':>7} {'method':>8} {'rel_err':>9} {'max_err':>9} "
          f"{'overlap':>8}")
    for B in budgets:
        for name in ["perq", "agg_max", "agg_sum", "perq_div"]:
            a = np.array(acc[(B, name)])
            print(f"{B:>7} {name:>8} {a[:,0].mean():9.4f} "
                  f"{a[:,1].mean():9.4f} {a[:,2].mean():8.3f}")


if __name__ == "__main__":
    main()
