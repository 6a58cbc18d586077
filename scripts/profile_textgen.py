"""Profiled text generation — the `torch.profiler` analogue.

Reference counterpart: `/root/reference/scripts/profile_textgen.py`
(torch.profiler wait/warmup/active schedule + chrome trace export
:96-108, NVTX ranges throughout the model). Here: `jax.profiler`
captures a TensorBoard/XProf trace of the prefill + decode loop;
`jax.named_scope` annotations inside the model play the NVTX role.

  python scripts/profile_textgen.py --random --preset llama31-8b \
      --layers 4 --ctx 8192 --trace-dir /tmp/quest_trace
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quest_tpu.utils.cli import PRESETS  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="llama31-8b",
                    choices=sorted(PRESETS))
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--ctx", type=int, default=8192)
    ap.add_argument("--token-budget", type=int, default=2048)
    ap.add_argument("--decode-tokens", type=int, default=16)
    ap.add_argument("--trace-dir", type=str, default="/tmp/quest_trace")
    args = ap.parse_args()

    import jax

    from quest_tpu.config import QuestConfig
    from quest_tpu.engine import QuestEngine
    from quest_tpu.models.llama import init_params

    cfg = dataclasses.replace(PRESETS[args.preset](),
                              num_layers=args.layers)
    on_tpu = jax.default_backend() == "tpu"
    ctx = args.ctx if on_tpu else min(args.ctx, 512)
    quest = QuestConfig(page_size=16, token_budget=args.token_budget,
                        max_seq_len=ctx + args.decode_tokens + 16)
    params = init_params(cfg, jax.random.PRNGKey(0))
    engine = QuestEngine(cfg, quest, params)
    prompt = np.random.default_rng(0).integers(
        1, cfg.vocab_size, size=ctx).astype(np.int32).tolist()

    # Warm-up outside the trace (compilation would dominate it).
    logits = engine.prefill([prompt])
    tok = int(np.argmax(logits[0]))
    engine.decode([tok])
    engine.clear()

    with jax.profiler.trace(args.trace_dir):
        logits = engine.prefill([prompt])
        tok = int(np.argmax(logits[0]))
        for _ in range(args.decode_tokens):
            logits = engine.decode([tok])
            tok = int(np.argmax(logits[0]))

    print(f"trace written to {args.trace_dir} "
          f"(view: tensorboard --logdir {args.trace_dir})")


if __name__ == "__main__":
    main()
