"""PG19-protocol perplexity eval launcher.

Reference counterparts: `/root/reference/evaluation/pg19/ppl_eval.py`
(token-by-token NLL over the first PG19 test book, writes `log.txt` +
`ppl.txt`) and its launcher `/root/reference/scripts/ppl_eval.sh`
(longchat-7b-v1.5-32k, token_budget 4096, 30k eval tokens).

Zero-egress adaptation: the text comes from ``--text-file`` (e.g. a
locally downloaded PG19 book) instead of `datasets.load_dataset`.

  python scripts/ppl_eval.py --model-path /ckpt/longchat-7b-v1.5-32k \
      --text-file pg19_book0.txt --num-eval-tokens 30000 \
      --token-budget 4096 --output-dir results/ppl
  python scripts/ppl_eval.py --random --num-eval-tokens 64   # smoke
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quest_tpu.utils.cli import add_model_args, build_engine  # noqa: E402

_SMOKE_TEXT = ("The quick brown fox jumps over the lazy dog. " * 40)


def main():
    ap = argparse.ArgumentParser()
    add_model_args(ap)
    ap.add_argument("--text-file", type=str, default=None)
    ap.add_argument("--num-eval-tokens", type=int, default=30000)
    ap.add_argument("--output-dir", type=str, default=None)
    args = ap.parse_args()

    from quest_tpu.evals.perplexity import evaluate_perplexity

    engine, tok = build_engine(args)
    if args.text_file:
        with open(args.text_file) as f:
            text = f.read()
    else:
        text = _SMOKE_TEXT
    ids = tok.encode(text)
    n = min(args.num_eval_tokens, len(ids) - 2,
            engine.quest.max_seq_len - 2)

    log_path = None
    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)
        log_path = os.path.join(args.output_dir, "log.txt")
    ppl = evaluate_perplexity(engine, ids, num_eval_tokens=n,
                              log_path=log_path)
    print(f"perplexity over {n} tokens (budget "
          f"{engine.quest.token_budget}): {ppl:.4f}")
    if args.output_dir:
        with open(os.path.join(args.output_dir, "ppl.txt"), "w") as f:
            print(ppl, file=f)


if __name__ == "__main__":
    main()
