"""Minimal generation example.

Reference counterpart: `/root/reference/scripts/example_textgen.py`
(load model, `quest_init(page_size=16, max_seq_len, token_budget)`,
`model.generate()`).

  python scripts/example_textgen.py --model-path /ckpt/llama --prompt "..."
  python scripts/example_textgen.py --random --preset tiny   # smoke
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quest_tpu.utils.cli import add_model_args, build_engine  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    add_model_args(ap)
    ap.add_argument("--prompt", type=str,
                    default="Once upon a time, in a land far away, ")
    ap.add_argument("--max-new-tokens", type=int, default=64)
    ap.add_argument("--temperature", type=float, default=0.0)
    args = ap.parse_args()

    engine, tok = build_engine(args)
    ids = tok.encode(args.prompt)
    out = engine.generate([ids], max_new_tokens=args.max_new_tokens,
                          temperature=args.temperature,
                          eos_token_id=getattr(tok, "eos_token_id", None))
    print(args.prompt + tok.decode(out[0]))


if __name__ == "__main__":
    main()
