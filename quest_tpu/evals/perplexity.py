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

    nlls: List[float] = []
    logf = open(log_path, "w") if log_path else None

    logits = engine.prefill([ids[:warmup_prefill]])  # [B, V]
    for t in range(warmup_prefill, len(ids)):
        target = ids[t]
        logp = _log_softmax_at(logits[0], target)
        nlls.append(-logp)
        if logf:
            print(-logp, file=logf, flush=False)
        if t < len(ids) - 1:
            logits = engine.decode([target])

    if logf:
        logf.close()
    return float(math.exp(np.mean(nlls)))


def _log_softmax_at(logits: np.ndarray, idx: int) -> float:
    m = float(logits.max())
    lse = m + math.log(float(np.exp(logits - m).sum()))
    return float(logits[idx]) - lse
