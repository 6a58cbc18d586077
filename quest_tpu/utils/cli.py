"""Shared CLI plumbing for the eval/demo launcher scripts.

The reference drives its evals with per-script argparse + shell wrappers
(`/root/reference/scripts/*.sh`, `evaluation/*/ *.py:251-266`); here the
common model/engine/tokenizer setup lives in one place.

Two model sources:
  * ``--model-path DIR``: a local HF Llama/Mistral checkpoint
    (converted via models/loader.py) + its tokenizer.
  * ``--random``: random weights on a named preset geometry (smoke /
    latency runs; accuracy numbers are meaningless) with a trivial
    byte-level tokenizer, usable in the zero-egress environment.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional, Tuple

from quest_tpu.config import (ModelConfig, QuestConfig, llama31_8b,
                              longchat_7b_v15_32k, mistral_7b_v03,
                              small_tpu_model, tiny_test_model,
                              yarn_llama2_7b_128k)

PRESETS = {
    "llama31-8b": llama31_8b,
    "longchat-7b": longchat_7b_v15_32k,
    "mistral-7b": mistral_7b_v03,
    "yarn-llama2-7b": yarn_llama2_7b_128k,
    "tiny": tiny_test_model,
    "small-tpu": small_tpu_model,
}


class ByteTokenizer:
    """Byte-level fallback tokenizer (ids = bytes + 3 specials)."""

    bos_token_id = 1
    eos_token_id = 2
    pad_token_id = 0

    def __call__(self, text, return_tensors=None, **kw):
        ids = self.encode(text)
        if return_tensors == "np":
            import numpy as np
            return type("E", (), {"input_ids": np.asarray([ids])})()
        return type("E", (), {"input_ids": [ids]})()

    def encode(self, text: str, add_special_tokens: bool = True):
        ids = [b + 3 for b in text.encode("utf-8", errors="replace")]
        return ([self.bos_token_id] + ids) if add_special_tokens else ids

    def decode(self, ids, skip_special_tokens: bool = True):
        return bytes(max(0, min(255, i - 3)) for i in ids
                     if i > 2 or not skip_special_tokens).decode(
                         "utf-8", errors="replace")


def add_model_args(ap: argparse.ArgumentParser) -> None:
    ap.add_argument("--model-path", type=str, default=None,
                    help="local HF checkpoint dir")
    ap.add_argument("--random", action="store_true",
                    help="random weights on --preset geometry")
    ap.add_argument("--preset", default="tiny", choices=sorted(PRESETS))
    ap.add_argument("--layers", type=int, default=None,
                    help="override layer count (fit one chip)")
    ap.add_argument("--token-budget", type=int, default=2048)
    ap.add_argument("--page-size", type=int, default=16)
    ap.add_argument("--max-seq-len", type=int, default=None)
    ap.add_argument("--skip-layers", type=int, default=2)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon TPU plugin "
                         "overrides JAX_PLATFORMS at import time)")
    ap.add_argument("--quantize", type=int, default=0, choices=[0, 4, 8],
                    help="weight-only quantization bits (0 = off); the "
                         "AWQ-path analogue")


def build_engine(args) -> Tuple["QuestEngine", object]:
    """Returns (engine, tokenizer)."""
    import jax

    if getattr(args, "cpu", False):
        jax.config.update("jax_platforms", "cpu")

    from quest_tpu.engine import QuestEngine
    from quest_tpu.models.llama import init_params

    if args.model_path:
        import transformers

        from quest_tpu.models.loader import load_hf_model
        cfg, params = load_hf_model(args.model_path)
        tok = transformers.AutoTokenizer.from_pretrained(args.model_path)
    elif args.random:
        cfg = PRESETS[args.preset]()
        if args.preset == "tiny":
            cfg = dataclasses.replace(cfg, vocab_size=259)
        params = None
        tok = ByteTokenizer()
    else:
        raise SystemExit("pass --model-path DIR or --random")

    if args.layers:
        cfg = dataclasses.replace(cfg, num_layers=args.layers)
    max_seq = args.max_seq_len or min(cfg.max_position_embeddings, 32768)
    quest = QuestConfig(page_size=args.page_size,
                        token_budget=args.token_budget,
                        max_seq_len=max_seq,
                        skip_layers=args.skip_layers)
    if params is None:
        params = init_params(cfg, jax.random.PRNGKey(0))
    if getattr(args, "quantize", 0):
        from quest_tpu.models.quantize import quantize_params
        params = quantize_params(params, args.quantize)
    engine = QuestEngine(cfg, quest, params, batch_size=args.batch)
    return engine, tok
