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
    needles = rng.choice(T - 64, size=n_needles, replace=False)
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
    # Two attention regimes: "diffuse" (needles ~3 sigma over an AR(1)
    # background — mass spread over thousands of tokens; the hard case,
    # where ANY budget-limited method must lose mass) and "peaked"
    # (needles ~7 sigma — retrieval-style concentrated attention, the
    # regime the paper's lossless claims live in, passkey/needle
    # tasks).
    REGIMES = {"diffuse": dict(needle_gain=3.0, rho=0.98),
               "peaked": dict(needle_gain=7.0, rho=0.98)}
    for regime, rkw in REGIMES.items():
      for seed in range(args.seeds):
        rng = np.random.default_rng(100 + seed)
        q, k, v, needles = structured_kv(rng, H, T, D, **rkw)
        p_full, out_full = full_attention(q, k, v, sm)

        for page in (16, 32):
            P = T // page
            kp = k.reshape(H, P, page, D)
            kmax = kp.max(axis=2)[None]            # [1, H, P, D]
            kmin = kp.min(axis=2)[None]
            page_mass = p_full.reshape(H, P, page).sum(-1)   # [H, P]
            needle_pages = needles // page
            for budget in (512, 1024, 2048, 4096):
                K = budget // page
                for meta in ("f32", "fp8"):
                    km, kn = kmax, kmin
                    if meta == "fp8":
                        km = np.asarray(jnp.asarray(kmax).astype(
                            jnp.float8_e4m3fn).astype(jnp.float32))
                        kn = np.asarray(jnp.asarray(kmin).astype(
                            jnp.float8_e4m3fn).astype(jnp.float32))
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
                    nrec = float(np.mean([sel[:, pg].mean()
                                          for pg in needle_pages]))
                    oracle = np.argsort(-page_mass, axis=-1)[:, :K]
                    ov = np.mean([len(set(oracle[h]) & set(idx[h, :nv]))
                                  / K for h in range(H)])
                    # Sparse output via masked softmax over selection.
                    keep = np.repeat(sel, page, axis=1)      # [H, T]
                    s = np.einsum("hd,htd->ht", q, k) * sm
                    s = np.where(keep, s, -1e30)
                    s -= s.max(axis=-1, keepdims=True)
                    p = np.exp(s)
                    p /= p.sum(axis=-1, keepdims=True)
                    out = np.einsum("ht,htd->hd", p, v)
                    err = (np.linalg.norm(out - out_full)
                           / np.linalg.norm(out_full))
                    rows.append(dict(regime=regime, seed=seed,
                                     page=page, budget=budget,
                                     meta=meta,
                                     mass_coverage=round(float(cov), 4),
                                     rand_coverage=round(rand_cov, 4),
                                     needle_recall=round(nrec, 4),
                                     oracle_overlap=round(float(ov), 4),
                                     out_rel_err=round(float(err), 5)))

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

    result = dict(ctx=T, heads=H, head_dim=D,
                  config_rows=rows, kernel_vs_sim=sim_rows)
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


if __name__ == "__main__":
    main()
