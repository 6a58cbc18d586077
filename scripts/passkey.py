"""Passkey retrieval eval launcher.

Reference counterparts: `/root/reference/evaluation/passkey/passkey.py`
and its launcher `/root/reference/scripts/passkey.sh` (Llama-3.1-8B /
Mistral-7B, ~100k char contexts, budgets 512..4096, 100 iterations
across depth ratios).

  python scripts/passkey.py --model-path /ckpt/Llama-3.1-8B-Instruct \
      --n-garbage 60000 --iterations 100 --token-budget 1024
  python scripts/passkey.py --random --n-garbage 2000 --iterations 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quest_tpu.utils.cli import add_model_args, build_engine  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    add_model_args(ap)
    ap.add_argument("--n-garbage", type=int, default=60000,
                    help="filler chars (reference uses ~60k = 10k tokens)")
    ap.add_argument("--iterations", type=int, default=20)
    ap.add_argument("--max-new-tokens", type=int, default=8)
    ap.add_argument("--output", type=str, default=None)
    args = ap.parse_args()

    from quest_tpu.evals.passkey import evaluate_passkey

    engine, tok = build_engine(args)
    res = evaluate_passkey(engine, tok, n_garbage=args.n_garbage,
                           iterations=args.iterations,
                           max_new_tokens=args.max_new_tokens)
    print(f"passkey accuracy (budget {engine.quest.token_budget}): "
          f"{res.accuracy:.3f} ({res.correct}/{res.total})")
    for d, acc in sorted(res.per_depth.items()):
        print(f"  depth {d:.1f}: {acc:.2f}")
    if args.output:
        with open(args.output, "w") as f:
            json.dump({"accuracy": res.accuracy, "correct": res.correct,
                       "total": res.total,
                       "per_depth": {str(k): v for k, v
                                     in res.per_depth.items()}}, f)


if __name__ == "__main__":
    main()
