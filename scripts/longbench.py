"""LongBench eval launcher.

Reference counterparts: `/root/reference/evaluation/LongBench/pred.py` +
`eval.py` and the launcher `/root/reference/scripts/longbench.sh`
(longchat-7b-v1.5-32k, 6 tasks x budgets {512..4096}).

Dataset jsonl files must exist locally (zero egress): one
``<task>.jsonl`` per task inside --data-dir, LongBench schema
({"input", "context", "answers", "all_classes", ...}).

  python scripts/longbench.py --model-path /ckpt/longchat-7b-v1.5-32k \
      --data-dir data/longbench --tasks narrativeqa,hotpotqa \
      --token-budget 2048 --out-dir results/longbench
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
    ap.add_argument("--data-dir", type=str, required=True)
    ap.add_argument("--tasks", type=str,
                    default="narrativeqa,qasper,hotpotqa,triviaqa,"
                            "musique,gov_report")
    ap.add_argument("--max-prompt-len", type=int, default=31500)
    ap.add_argument("--out-dir", type=str, default=None)
    args = ap.parse_args()

    from quest_tpu.evals.longbench import evaluate_longbench

    engine, tok = build_engine(args)
    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
    results = evaluate_longbench(engine, tok, args.data_dir,
                                 args.tasks.split(","),
                                 args.max_prompt_len, args.out_dir)
    print(json.dumps(results, indent=2))
    if args.out_dir:
        with open(os.path.join(args.out_dir, "result.json"), "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
