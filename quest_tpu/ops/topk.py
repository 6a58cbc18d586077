"""Top-K page selection.

The reference pulls in RAFT's radix top-k
(`/root/reference/kernels/include/topk/decode_select_k.cuh:26-62`) and
special-cases the last page all over the stack: it is excluded from the
estimate output (width P-1), top-k selects budget-1, and the decode
kernel force-appends it
(`/root/reference/quest/utils/controller.py:99-120`,
`decode_attn.cuh:263-267,714-718`).

TPU-first unification: give the last (current) page a +inf score and
invalid pages a -inf score, then take one static-shape ``lax.top_k`` over
all pages. The selected *set* is identical — {last} ∪ top-(K-1) of the
rest — with no dynamic widths and no forced-append path in the attention
kernel. When the sequence has fewer than K pages the trailing slots hold
-inf scores; ``num_valid`` tells the consumer how many slots are real,
which also subsumes the reference's dense fallback
(`QuestAttention.py:125-133`): selecting *all* valid pages reproduces
dense attention exactly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# Plain Python floats: creating jnp scalars at import time would
# initialize the JAX backend before callers can select a platform.
_NEG_INF = float("-inf")
_POS_INF = float("inf")


def select_pages(scores: jnp.ndarray, seq_lens: jnp.ndarray, page_size: int,
                 budget_pages: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select the top-``budget_pages`` pages per (batch, kv-head).

    Args:
      scores: [B, H, P] f32 criticality scores (garbage OK at invalid pages).
      seq_lens: [B] int32 current sequence lengths (including the token
        being decoded).
      page_size: tokens per page.
      budget_pages: static number of slots K (includes the last page).

    Returns:
      indices: [B, H, K] int32 page ids, slots sorted by descending score;
        slot 0 is always the last page. Slots >= num_valid are junk.
      num_valid: [B] int32 = min(K, num_pages) — count of real slots.
    """
    B, H, P = scores.shape
    pool_pages = P
    if budget_pages > P:  # static: more slots than the pool has pages
        scores = jnp.pad(scores, ((0, 0), (0, 0), (0, budget_pages - P)),
                         constant_values=-jnp.inf)
        P = budget_pages
    num_pages = (seq_lens + page_size - 1) // page_size       # [B]
    last_page = num_pages - 1                                  # [B]
    page_ids = jax.lax.broadcasted_iota(jnp.int32, (B, 1, P), 2)
    s = jnp.where(page_ids < num_pages[:, None, None], scores, _NEG_INF)
    s = jnp.where(page_ids == last_page[:, None, None], _POS_INF, s)
    _, indices = jax.lax.top_k(s, budget_pages)
    # Junk slots (>= num_valid) may name padded page ids beyond the pool;
    # clamp so downstream gathers/DMAs always stay in-bounds.
    indices = jnp.clip(indices, 0, pool_pages - 1)
    num_valid = jnp.minimum(jnp.int32(budget_pages), num_pages)
    return indices.astype(jnp.int32), num_valid
