"""Interpretable accuracy proxies for Quest selection (VERDICT r3 #6b).

The environment has no model checkpoints (zero egress), so instead of
uninterpretable random-weight perplexities this harness measures the
*selection mechanism itself* on structured, low-entropy inputs — the
regime the paper's accuracy claims live in (attention concentrated on
a few positions; reference protocol `evaluation/quest_attention.py`,
paper §4.2):

  inputs   keys follow an AR(1) drifting mean (pages are internally
           coherent, like real K caches) plus ``n_needles`` positions
           whose keys align with the query (the passkey-style signal).

  metrics  per (page_size, token_budget, metadata dtype):
    mass_coverage   sum of the FULL attention distribution captured by
                    the selected pages (1.0 = lossless; the paper's
                    "negligible accuracy loss" corresponds to ~1.0)
    needle_recall   fraction of needle tokens inside selected pages
    oracle_overlap  |selected ∩ true-top-K-pages| / K, oracle = pages
                    ranked by true attention mass
    out_rel_err     relative L2 error of sparse vs dense attention out
    rand_coverage   mass a random same-size selection captures
                    (the floor that makes mass_coverage interpretable)

  cross-check  kernel-path selection (ops/estimate + ops/topk,
           per-query-head mode) vs the simulation path
           (evals/sim_attention.py, the reference algorithm):
           page-set overlap and output agreement on the same inputs.

Pure f32 math, CPU-runnable, deterministic seeds. Writes one JSON.

Usage: python scripts/accuracy_proxies.py [--out FILE] [--ctx 16384]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def structured_kv(rng, H, T, D, n_needles=8, needle_gain=3.0, rho=0.98):
    """Low-entropy K/V: AR(1) drifting mean + noise, plus needle keys
    aligned with the (returned) query. Returns q [H,D], k/v [H,T,D],
    needle positions [n_needles]."""
    q = rng.standard_normal((H, D)).astype(np.float32)
    drift = np.zeros((H, T, D), np.float32)
    eta = rng.standard_normal((H, T, D)).astype(np.float32)
    drift[:, 0] = eta[:, 0]
    a = np.sqrt(1.0 - rho * rho)
    for t in range(1, T):
        drift[:, t] = rho * drift[:, t - 1] + a * eta[:, t]
    k = 0.7 * drift + 0.5 * rng.standard_normal((H, T, D)).astype(np.float32)
    v = rng.standard_normal((H, T, D)).astype(np.float32)
    needles = (rng.choice(T - 64, size=n_needles, replace=False)
               if n_needles else np.zeros((0,), np.int64))
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    for pos in needles:
        k[:, pos] = needle_gain * qn + 0.2 * rng.standard_normal(
            (H, D)).astype(np.float32)
    return q, k, v, np.sort(needles)


def full_attention(q, k, v, sm):
    s = np.einsum("hd,htd->ht", q, k) * sm
    s -= s.max(axis=-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(axis=-1, keepdims=True)
    out = np.einsum("ht,htd->hd", p, v)
    return p, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=16384)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--out", default="exp/r4_chip/accuracy_proxies.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from quest_tpu.evals.sim_attention import quest_sim_attention
    from quest_tpu.ops.estimate import page_scores_per_qhead
    from quest_tpu.ops.topk import select_pages

    H, T, D = args.heads, args.ctx, 128
    sm = 1.0 / np.sqrt(D)
    rows = []
    sim_rows = []
    gqa_rows = []
    # Four attention regimes (VERDICT r4 #4: beyond peaked retrieval):
    #   diffuse  needles ~3 sigma over an AR(1) background — mass
    #            spread over thousands of tokens; the hard case, where
    #            ANY budget-limited method must lose mass.
    #   peaked   needles ~7 sigma — retrieval-style concentrated
    #            attention, the regime the paper's lossless claims
    #            live in (passkey/needle tasks).
    #   flat     NO needles — pure AR(1) background, the flattest
    #            LongBench-summarization-like score distribution.
    #   multi    32 needles at ~4.5 sigma — multi-needle / multi-hop
    #            retrieval (LongBench hotpotqa-like).
    REGIMES = {"diffuse": dict(needle_gain=3.0, rho=0.98),
               "peaked": dict(needle_gain=7.0, rho=0.98),
               "flat": dict(n_needles=0, rho=0.98),
               "multi": dict(n_needles=32, needle_gain=4.5, rho=0.98)}
    # Dtype configs: production bf16, the fp8-metadata serving config,
    # and the fp8-KV capacity config (data AND metadata fp8; metadata
    # is folded from the STORED keys, exactly as append_decode_at does).
    f8 = jnp.float8_e4m3fn

    def cast(x, dt):
        return np.asarray(jnp.asarray(x).astype(dt).astype(jnp.float32))

    DTYPES = {"bf16": (jnp.bfloat16, jnp.bfloat16),
              "fp8meta": (jnp.bfloat16, f8),
              "fp8kv": (f8, f8)}
    for regime, rkw in REGIMES.items():
      for seed in range(args.seeds):
        rng = np.random.default_rng(100 + seed)
        q, k, v, needles = structured_kv(rng, H, T, D, **rkw)
        p_full, out_full = full_attention(q, k, v, sm)

        for page in (16, 32):
            P = T // page
            page_mass = p_full.reshape(H, P, page).sum(-1)   # [H, P]
            needle_pages = needles // page
            for budget in (512, 1024, 2048, 4096):
                K = budget // page
                for dtname, (kv_dt, meta_dt) in DTYPES.items():
                    ks = cast(k, kv_dt)          # stored K (dequantized)
                    vs = cast(v, kv_dt)
                    kp = ks.reshape(H, P, page, D)
                    km = cast(kp.max(axis=2), meta_dt)[None]
                    kn = cast(kp.min(axis=2), meta_dt)[None]
                    scores = page_scores_per_qhead(
                        jnp.asarray(q[None]), jnp.asarray(km),
                        jnp.asarray(kn))            # [1, H, P]
                    idx, nv = select_pages(
                        scores, jnp.asarray([T], jnp.int32), page, K)
                    idx = np.asarray(idx)[0]        # [H, K]
                    nv = int(np.asarray(nv)[0])
                    sel = np.zeros((H, P), bool)
                    for h in range(H):
                        sel[h, idx[h, :nv]] = True

                    cov = (page_mass * sel).sum(-1).mean()
                    # Random-selection floor: K/P of the mass in
                    # expectation (uniform over pages; last page incl.)
                    rand_cov = min(1.0, K / P)
                    nrec = (float(np.mean([sel[:, pg].mean()
                                           for pg in needle_pages]))
                            if len(needle_pages) else 1.0)
                    oracle = np.argsort(-page_mass, axis=-1)[:, :K]
                    ov = np.mean([len(set(oracle[h]) & set(idx[h, :nv]))
                                  / K for h in range(H)])
                    # Sparse output via masked softmax over the STORED
                    # (possibly fp8-rounded) K/V, vs the f32 full-cache
                    # ground truth — fp8kv errors include the data
                    # quantization itself, so report the dense-fp8
                    # error floor alongside for attribution.
                    keep = np.repeat(sel, page, axis=1)      # [H, T]
                    s = np.einsum("hd,htd->ht", q, ks) * sm
                    sd = s.copy()
                    s = np.where(keep, s, -1e30)
                    s -= s.max(axis=-1, keepdims=True)
                    p = np.exp(s)
                    p /= p.sum(axis=-1, keepdims=True)
                    out = np.einsum("ht,htd->hd", p, vs)
                    err = (np.linalg.norm(out - out_full)
                           / np.linalg.norm(out_full))
                    sd -= sd.max(axis=-1, keepdims=True)
                    pd = np.exp(sd)
                    pd /= pd.sum(axis=-1, keepdims=True)
                    outd = np.einsum("ht,htd->hd", pd, vs)
                    derr = (np.linalg.norm(outd - out_full)
                            / np.linalg.norm(out_full))
                    rows.append(dict(regime=regime, seed=seed,
                                     page=page, budget=budget,
                                     meta=dtname,
                                     mass_coverage=round(float(cov), 4),
                                     rand_coverage=round(rand_cov, 4),
                                     needle_recall=round(nrec, 4),
                                     oracle_overlap=round(float(ov), 4),
                                     out_rel_err=round(float(err), 5),
                                     dense_dtype_err=round(float(derr),
                                                           5)))

        # GQA geometry (VERDICT r4 #4): G query heads share one KV
        # head; selection is per KV head with group_agg=sum (the
        # engine default). Coverage is measured per QUERY head against
        # its own full-attention mass — the quantity GQA sharing could
        # hurt (one group-level page set serves G different queries).
        for G in (4, 8):
            Hkv = H  # reuse the H kv heads; make G queries per head
            qg = np.stack([q + 0.35 * rng.standard_normal(
                (H, D)).astype(np.float32) for _ in range(G)],
                axis=1).reshape(H * G, D)        # [Hkv*G, D]
            pg_full, _ = full_attention(
                qg, np.repeat(k, G, axis=0), np.repeat(v, G, axis=0), sm)
            for page in (16, 32):
                P = T // page
                kp = k.reshape(H, P, page, D)
                km = jnp.asarray(kp.max(axis=2)[None])
                kn = jnp.asarray(kp.min(axis=2)[None])
                K = 2048 // page
                from quest_tpu.ops.estimate import page_scores
                sc = page_scores(jnp.asarray(qg[None]), km, kn,
                                 group_agg="sum")      # [1, Hkv, P]
                idx, nv = select_pages(sc, jnp.asarray([T], jnp.int32),
                                       page, K)
                idx = np.asarray(idx)[0]
                nv = int(np.asarray(nv)[0])
                mass = pg_full.reshape(H, G, P, page).sum(-1)  # [H,G,P]
                sel = np.zeros((H, P), bool)
                for h in range(H):
                    sel[h, idx[h, :nv]] = True
                cov = (mass * sel[:, None, :]).sum(-1).mean()
                gqa_rows.append(dict(regime=regime, seed=seed, G=G,
                                     page=page, budget=2048,
                                     mass_coverage=round(float(cov), 4),
                                     rand_coverage=round(
                                         min(1.0, K / P), 4)))

        # Kernel path vs simulation path (reference algorithm) on the
        # SAME inputs: per-query-head selection, chunk = page = 16.
        page, budget = 16, 2048
        P, K = T // page, 2048 // page
        kp = k.reshape(H, P, page, D)
        scores = page_scores_per_qhead(
            jnp.asarray(q[None]), jnp.asarray(kp.max(axis=2)[None]),
            jnp.asarray(kp.min(axis=2)[None]))
        idx, nv = select_pages(scores, jnp.asarray([T], jnp.int32),
                               page, K)
        idx = np.asarray(idx)[0]
        sim_out = np.asarray(quest_sim_attention(
            jnp.asarray(q[None]), jnp.asarray(k[None]),
            jnp.asarray(v[None]), token_budget=budget, chunk_size=page,
            sm_scale=sm))[0]
        # Sim path's kept chunks (recompute its selection rule).
        sign = np.where(q > 0, 1.0, -1.0)
        cmax = (k * sign[:, None, :]).reshape(H, P, page, D).max(axis=2)
        cscore = np.einsum("hd,hpd->hp", q * sign, cmax)
        k_chunks = min(max(3, budget // page), P)
        sim_sel = np.argsort(-cscore, axis=-1)[:, :k_chunks]
        ov = np.mean([len(set(sim_sel[h]) & set(idx[h])) / k_chunks
                      for h in range(H)])
        # Kernel-selection masked output vs sim output.
        sel = np.zeros((H, P), bool)
        for h in range(H):
            sel[h, idx[h]] = True
        keep = np.repeat(sel, page, axis=1)
        s = np.einsum("hd,htd->ht", q, k) * sm
        s = np.where(keep, s, -1e30)
        s -= s.max(axis=-1, keepdims=True)
        p = np.exp(s)
        p /= p.sum(axis=-1, keepdims=True)
        out = np.einsum("ht,htd->hd", p, v)
        sim_rows.append(dict(
            regime=regime, seed=seed,
            selection_overlap=round(float(ov), 4),
            out_rel_err_vs_sim=round(float(np.linalg.norm(out - sim_out)
                                     / np.linalg.norm(sim_out)), 5)))

    # ------------------------------------------------------------------
    # Passkey-style END-TASK proxy through the simulation path (VERDICT
    # r4 #4): plant an 8-token "digit" (key aligned with the question
    # query, value = one of 10 random codes) at a depth ratio, decode
    # the question through quest_sim_attention with chunk 16 vs 32 at
    # MATCHED token budget, and score retrieval = nearest-code match of
    # the output. This is the protocol shape of the reference's passkey
    # eval (`evaluation/passkey/passkey.py:68-97`) with the model
    # replaced by a directly-checkable retrieval code.
    from quest_tpu.evals.sim_attention import quest_sim_attention
    passkey_rows = []
    codes = np.random.default_rng(7).standard_normal((10, D)).astype(
        np.float32)
    codes /= np.linalg.norm(codes, axis=-1, keepdims=True)
    DEPTHS = (0.05, 0.3, 0.5, 0.7, 0.95)
    for chunk in (16, 32):
        for budget in (1024, 2048):
            n_ok = n_dense_ok = n_tot = 0
            for seed in range(args.seeds):
                for di, depth in enumerate(DEPTHS):
                    rng = np.random.default_rng(1000 + seed * 31 + di)
                    q, k, v, _ = structured_kv(rng, H, T, D, n_needles=0)
                    digit = int(rng.integers(0, 10))
                    pos = int(depth * (T - 64))
                    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
                    for j in range(8):
                        k[:, pos + j] = 6.0 * qn + 0.2 * rng.standard_normal(
                            (H, D)).astype(np.float32)
                        v[:, pos + j] = codes[digit]
                    out = np.asarray(quest_sim_attention(
                        jnp.asarray(q[None]), jnp.asarray(k[None]),
                        jnp.asarray(v[None]), token_budget=budget,
                        chunk_size=chunk, sm_scale=sm))[0]
                    _, outd = full_attention(q, k, v, sm)
                    for o, cnt in ((out, "sparse"), (outd, "dense")):
                        got = int(np.argmax(
                            codes @ o.mean(axis=0)))
                        if cnt == "sparse":
                            n_ok += got == digit
                        else:
                            n_dense_ok += got == digit
                    n_tot += 1
            passkey_rows.append(dict(
                chunk=chunk, budget=budget, trials=n_tot,
                retrieval_acc=round(n_ok / n_tot, 4),
                dense_acc=round(n_dense_ok / n_tot, 4)))

    result = dict(ctx=T, heads=H, head_dim=D,
                  config_rows=rows, kernel_vs_sim=sim_rows,
                  gqa_rows=gqa_rows, passkey_rows=passkey_rows)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    # Compact table: mean over seeds.
    import collections
    agg = collections.defaultdict(list)
    for r in rows:
        agg[(r["regime"], r["page"], r["budget"], r["meta"])].append(r)
    print(f"ctx={T} heads={H} (mean over {args.seeds} seeds)")
    print("regime  page budget meta  coverage (rand)  needle  oracle  "
          "out_err")
    for (regime, page, budget, meta), rs in sorted(agg.items()):
        m = {k: np.mean([r[k] for r in rs]) for k in
             ("mass_coverage", "rand_coverage", "needle_recall",
              "oracle_overlap", "out_rel_err")}
        print(f"{regime:7s} {page:4d} {budget:6d} {meta:4s}  "
              f"{m['mass_coverage']:.4f} ({m['rand_coverage']:.3f})  "
              f"{m['needle_recall']:.3f}   {m['oracle_overlap']:.3f}   "
              f"{m['out_rel_err']:.5f}")
    print("kernel vs sim:",
          [f"{r['regime']}: overlap={r['selection_overlap']:.3f} "
           f"err={r['out_rel_err_vs_sim']:.5f}" for r in sim_rows])
    gagg = collections.defaultdict(list)
    for r in gqa_rows:
        gagg[(r["G"], r["page"])].append(r["mass_coverage"])
    print("GQA per-kv-head selection coverage (budget 2048):",
          {f"G={g},p{p}": round(float(np.mean(v)), 4)
           for (g, p), v in sorted(gagg.items())})
    print("passkey end-task proxy (sim path):")
    for r in passkey_rows:
        print(f"  chunk={r['chunk']:2d} budget={r['budget']:4d}  "
              f"acc={r['retrieval_acc']:.3f} "
              f"(dense {r['dense_acc']:.3f}, n={r['trials']})")


if __name__ == "__main__":
    main()
