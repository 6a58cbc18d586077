"""Sparse-vs-dense accuracy delta, end-to-end on the SAME engine.

The reference's accuracy claims (PG19 delta-ppl < 0.01, passkey ==
oracle; paper section 4.2) need real checkpoints, which this
environment cannot fetch (zero egress). What IS measurable here — and
what this script reports — is the delta the MACHINERY introduces:
run the identical engine at a sweep of token budgets vs the full-cache
control (budget >= context) and report

  * teacher-forced NLL / perplexity deltas (PG19 protocol: every
    prediction in decode mode, sparsity active,
    `/root/reference/evaluation/pg19/ppl_eval.py:60-114`), and
  * greedy-generation token agreement vs the full-cache control
    (first-divergence step + match fraction).

With --random weights the absolute ppl is meaningless and attention is
more diffuse than a trained model's (random weights have no retrieval
heads), so deltas here are a STRESS bound on selection error, not a
claim of trained-model accuracy; with --model-path they become the real
PG19-protocol numbers. Token streams mix i.i.d. noise with repeated
motif blocks so page contents are not statistically exchangeable (pure
i.i.d. streams would make every page equally critical and selection
trivially lossy).

  python scripts/accuracy_delta.py --random --preset small-tpu \
      --ctx 4096 --eval-tokens 256 --budgets 256,512,1024,4096
  python scripts/accuracy_delta.py --random --preset tiny --cpu \
      --ctx 512 --eval-tokens 48 --budgets 64,128,512   # CPU smoke
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quest_tpu.utils.cli import add_model_args, build_engine  # noqa: E402


def make_stream(vocab: int, n: int, seed: int) -> list:
    """Noise interleaved with repeated motifs (non-exchangeable pages)."""
    rng = np.random.default_rng(seed)
    motifs = [rng.integers(3, vocab, size=int(rng.integers(12, 40)))
              for _ in range(6)]
    out: list = []
    while len(out) < n:
        if rng.random() < 0.5:
            out.extend(rng.integers(3, vocab,
                                    size=int(rng.integers(20, 60))).tolist())
        else:
            out.extend(motifs[int(rng.integers(0, len(motifs)))].tolist())
    return out[:n]


def main():
    ap = argparse.ArgumentParser()
    add_model_args(ap)
    ap.add_argument("--ctx", type=int, default=4096)
    ap.add_argument("--eval-tokens", type=int, default=256)
    ap.add_argument("--gen-tokens", type=int, default=64)
    ap.add_argument("--budgets", type=str, default="512,1024,2048")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json-out", type=str, default=None)
    args = ap.parse_args()
    budgets = [int(b) for b in args.budgets.split(",")]
    # A skip_layers >= num_layers run never engages sparsity: every
    # budget trivially matches the control (delta 0.0) and the study
    # is vacuous. Caught after an on-chip session produced exactly
    # that with the 2-layer small-tpu preset at the default skip of 2.
    n_layers = args.layers if args.layers else None
    if n_layers is not None and args.skip_layers >= n_layers:
        raise SystemExit(
            f"skip_layers={args.skip_layers} >= num_layers={n_layers}: "
            "no layer runs sparse; pass --skip-layers < layers")

    args.max_seq_len = max(args.max_seq_len or 0,
                           args.ctx + args.gen_tokens + 64)
    # Full-cache control: budget >= every page of the context.
    full_budget = args.max_seq_len
    if full_budget not in budgets:
        budgets = budgets + [full_budget]

    from quest_tpu.engine import QuestEngine

    rows = []
    base_nll = base_gen = None
    ids = None
    for budget in sorted(budgets, reverse=True):  # control first
        args.token_budget = budget
        engine, tok = build_engine(args)
        if engine.quest.skip_layers >= engine.cfg.num_layers:
            raise SystemExit(
                f"skip_layers={engine.quest.skip_layers} >= "
                f"num_layers={engine.cfg.num_layers}: no layer runs "
                "sparse; pass --skip-layers < layers")
        if ids is None:
            vocab = engine.cfg.vocab_size
            ids = make_stream(vocab, args.ctx + args.eval_tokens,
                              seed=args.seed)
        warm = args.ctx
        engine.clear()
        logits = engine.prefill([ids[:warm]])
        feed = np.asarray([ids[warm:-1]], np.int32)
        tgts = np.asarray([ids[warm + 1:]], np.int32)
        x = logits[0] - logits[0].max()
        first = float(np.log(np.exp(x).sum()) - x[ids[warm]])
        nll = np.concatenate([[first],
                              engine.score_ondevice(feed, tgts)[0]])
        # Greedy continuation from the same prefix (fresh state).
        engine.clear()
        engine.prefill([ids[:warm]])
        gen = engine.greedy_ondevice([ids[warm]],
                                     args.gen_tokens)[0].tolist()
        ppl = float(np.exp(nll.mean()))
        if budget >= full_budget:
            base_nll, base_gen = nll, gen
        agree = (np.mean([a == b for a, b in zip(gen, base_gen)])
                 if base_gen is not None else 1.0)
        div = next((i for i, (a, b) in enumerate(zip(gen, base_gen))
                    if a != b), len(gen)) if base_gen is not None else -1
        rows.append({
            "budget": budget, "ppl": round(ppl, 5),
            "delta_ppl": round(ppl - float(np.exp(base_nll.mean())), 5),
            "mean_abs_delta_nll": round(
                float(np.abs(nll - base_nll).mean()), 6),
            "gen_agree": round(float(agree), 4),
            "first_divergence": int(div),
        })
        print(f"budget {budget:>7}: ppl {ppl:.4f}  "
              f"delta_ppl {rows[-1]['delta_ppl']:+.5f}  "
              f"gen_agree {rows[-1]['gen_agree']:.3f}  "
              f"first_div {div}", flush=True)

    out = {"ctx": args.ctx, "eval_tokens": args.eval_tokens,
           "preset": args.preset, "random_weights": bool(args.random),
           "rows": rows}
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
