"""Token-by-token perplexity evaluation (PG19 protocol).

Mirrors `/root/reference/evaluation/pg19/ppl_eval.py:60-114`: feed the
text one token at a time in *decode* mode so Quest sparsity is active
for every prediction, accumulate NLL, report exp(mean NLL). Writes
per-token log like the reference (`log.txt`, `ppl.txt`).
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np

from quest_tpu.engine.engine import QuestEngine


def evaluate_perplexity(engine: QuestEngine, token_ids: List[int],
                        num_eval_tokens: Optional[int] = None,
                        log_path: Optional[str] = None,
                        warmup_prefill: int = 1) -> float:
    """NLL/perplexity of `token_ids` under the engine's Quest config.

    ``warmup_prefill`` tokens seed the cache via prefill (>=1 so decode
    has context); every following token is predicted in decode mode.
    """
    engine.clear()
    ids = list(token_ids)
    if num_eval_tokens is not None:
        ids = ids[: num_eval_tokens + warmup_prefill]
    assert len(ids) >= warmup_prefill + 1

    logits = engine.prefill([ids[:warmup_prefill]])  # [B, V]
    # First prediction comes from the prefill logits; every later one
    # rides the on-device teacher-forced burst (async decode_nll_step
    # chain, NLLs fetched in bulk) — same protocol as the reference's
    # per-token loop at serving speed instead of a [B, V] logits fetch
    # per token.
    nlls: List[float] = [-_log_softmax_at(logits[0], ids[warmup_prefill])]
    if len(ids) > warmup_prefill + 1:
        feed = np.asarray([ids[warmup_prefill:-1]], np.int32)
        targets = np.asarray([ids[warmup_prefill + 1:]], np.int32)
        nlls.extend(engine.score_ondevice(feed, targets)[0].tolist())

    if log_path:
        with open(log_path, "w") as logf:
            for v in nlls:
                print(v, file=logf)
    return float(math.exp(np.mean(nlls)))


def _log_softmax_at(logits: np.ndarray, idx: int) -> float:
    m = float(logits.max())
    lse = m + math.log(float(np.exp(logits - m).sum()))
    return float(logits[idx]) - lse
