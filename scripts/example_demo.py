"""Side-by-side demo: Quest sparse decode vs full-cache dense decode.

Reference counterpart: `/root/reference/scripts/example_demo.py` (a
threaded TUI comparing Quest `quest_init(token_budget=2048)` against a
full-cache run `token_budget=32768`, :73-76). Here: same prompt
generated twice — once with the requested budget, once with budget =
max_seq_len (the dense control) — printing tokens and per-token decode
latency for each.

  python scripts/example_demo.py --model-path /ckpt/longchat-7b \
      --token-budget 2048 --prompt-file long_context.txt
  python scripts/example_demo.py --random --preset tiny --cpu   # smoke
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quest_tpu.utils.cli import add_model_args, build_engine  # noqa: E402


def run_once(engine, tok, prompt_ids, max_new):
    engine.clear()
    t0 = time.perf_counter()
    logits = engine.prefill([prompt_ids])
    t_prefill = time.perf_counter() - t0
    out = []
    import numpy as np
    nxt = int(np.argmax(logits[0]))
    t0 = time.perf_counter()
    for _ in range(max_new):
        out.append(nxt)
        logits = engine.decode([nxt])
        nxt = int(np.argmax(logits[0]))
    t_decode = (time.perf_counter() - t0) / max_new
    return out, t_prefill, t_decode


def main():
    ap = argparse.ArgumentParser()
    add_model_args(ap)
    ap.add_argument("--prompt", type=str,
                    default="Tell me the story of the three kingdoms. ")
    ap.add_argument("--prompt-file", type=str, default=None)
    ap.add_argument("--max-new-tokens", type=int, default=32)
    args = ap.parse_args()

    from quest_tpu.config import QuestConfig
    from quest_tpu.engine import QuestEngine

    engine, tok = build_engine(args)
    text = (open(args.prompt_file).read() if args.prompt_file
            else args.prompt)
    ids = tok.encode(text)

    quest_out, tp1, td1 = run_once(engine, tok, ids, args.max_new_tokens)

    # Full-cache control: same pool, budget = max_seq_len.
    full_quest = dataclasses.replace(engine.quest,
                                     token_budget=engine.quest.max_seq_len)
    full = QuestEngine(engine.cfg, full_quest, engine.params,
                       batch_size=1,
                       prefill_bucket=engine.prefill_bucket)
    full_out, tp2, td2 = run_once(full, tok, ids, args.max_new_tokens)

    print(f"=== Quest (budget {engine.quest.token_budget}) "
          f"— decode {td1*1e3:.2f} ms/tok ===")
    print(tok.decode(quest_out))
    print(f"=== Full cache (budget {full_quest.token_budget}) "
          f"— decode {td2*1e3:.2f} ms/tok ===")
    print(tok.decode(full_out))
    same = sum(a == b for a, b in zip(quest_out, full_out))
    print(f"token agreement: {same}/{len(quest_out)}; "
          f"decode speedup {td2 / max(td1, 1e-9):.2f}x")


if __name__ == "__main__":
    main()
