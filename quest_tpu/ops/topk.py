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


def _repair_approx(av: jnp.ndarray, ai: jnp.ndarray,
                   num_pages: jnp.ndarray,
                   budget_pages: int) -> jnp.ndarray:
    """Branch-free per-row soundness repair for approx_max_k output.

    av/ai: [B, H, K] approx values/indices; num_pages: [B]. Any row
    whose returned slots contain -inf below num_valid (a PartialReduce
    bin collision surfaced a dropped — necessarily invalid — page), or
    with num_pages <= K, is replaced by its LAST min(K, num_pages)
    page ids — always in-bounds, duplicate-free, includes the forced
    last page, and exactly equal to the all-pages (dense) selection
    when num_pages <= K (the only case where the window fires on a
    healthy row).
    """
    slot = jax.lax.broadcasted_iota(jnp.int32, ai.shape, 2)
    nv = jnp.minimum(jnp.int32(budget_pages), num_pages)
    real = slot < nv[:, None, None]
    # Soundness is exactly the -inf test: PartialReduce returns
    # distinct positions, so a junk entry below num_valid can only be
    # an invalid (-inf-scored) page. Rows with num_pages <= K take the
    # window unconditionally — there it IS the all-pages (dense)
    # selection; rows above that keep approx output unless a dropped
    # page surfaced (rare), preserving score-based selection quality.
    bad = jnp.any(jnp.where(real, av == _NEG_INF, False),
                  axis=-1, keepdims=True)                # [B, H, 1]
    short = (num_pages <= budget_pages)[:, None, None]
    window = (jnp.maximum(num_pages - budget_pages, 0)[:, None, None]
              + slot)                                     # [B, H, K]
    return jnp.where(jnp.logical_or(bad, short), window, ai)


def serving_method(pool_pages: int, budget_pages: int) -> str:
    """The serving config's static selection rule, shared by callers
    (bench.py, engine defaults) so they cannot drift from the gate
    ``select_pages`` itself applies: verified-exact ``exact_fast``
    where its exactness certificate is measured reliable
    (pool <= 16 * budget — see the in-line gate below), approx +
    branch-free per-row repair beyond (e.g. 128K pools, where
    exact_fast statically degrades to the full sort)."""
    return "exact_fast" if pool_pages <= 16 * budget_pages else "approx"


def select_pages(scores: jnp.ndarray, seq_lens: jnp.ndarray, page_size: int,
                 budget_pages: int,
                 sort_by_page: bool = True,
                 method: str = "exact") -> Tuple[jnp.ndarray,
                                                 jnp.ndarray]:
    """Select the top-``budget_pages`` pages per (batch, kv-head).

    Args:
      scores: [B, H, P] f32 criticality scores (garbage OK at invalid pages).
      seq_lens: [B] int32 current sequence lengths (including the token
        being decoded).
      page_size: tokens per page.
      budget_pages: static number of slots K (includes the last page).
      sort_by_page: reorder the selected slots by ascending page id —
        the gather DMAs then walk HBM monotonically, measured ~18%
        faster sparse attention for ~3 us of sort (junk slots stay at
        the tail, so slot-position masking is unaffected).
      method: "exact" (default) = ``lax.top_k`` (lowers to a full
        variadic sort on TPU, ~27 us at 32 heads x 2048 pages).
        "exact_fast" = verified-exact: ``approx_max_k`` plus an
        exactness certificate (count(s >= min returned score) must
        equal K per row+head) with a ``lax.cond`` fallback to the full
        sort when the certificate fails — exact top-K semantics at
        ~2.4x the speed on long rows (13.3 vs 31.5 us at P=2048,
        exp/topk_probe.py). Statically downgraded to "exact" when the
        pool is small, off-TPU, or P > 16*K where the certificate is
        measured unreliable (64% of rows fail at P=8192, making
        approx+sort a serial net loss — the r01->r02 128K regression).
        "approx" = ``lax.approx_max_k`` (TPU PartialReduce, ~15 us,
        recall_target 0.95, mirroring the reference's fp16 radix
        top-k tie behavior, `decode_select_k.cuh:26-62`) followed by a
        branch-free per-row soundness repair (``_repair_approx``): for
        short rows PartialReduce bin collisions can drop valid pages
        and surface -inf slots below ``num_valid``, whose clamped ids
        would attend uninitialized pool pages — such rows fall back to
        their last min(K, num_pages) pages. (r2 used a runtime
        lax.cond to the full sort instead; its fusion barrier cost the
        composed serving pipeline ~40 us/step at 32K.) Opt in per
        deployment via QuestConfig.topk_method.

    Returns:
      indices: [B, H, K] int32 page ids; the selected *set* is
        {last page} ∪ top-(K-1) of the rest. Slots >= num_valid are junk
        (in-bounds ids). Order: ascending page id when ``sort_by_page``,
        else descending score with the last page in slot 0.
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
    if method in ("approx", "exact_fast"):
        # The +inf last page always survives the reduction (it wins
        # its bin), so forced inclusion is preserved. Fall back to
        # exact when approx cannot help (small pool or off-TPU).
        if not (jax.default_backend() == "tpu"
                and P >= 4 * budget_pages and P >= 256):
            method = "exact"
    if method == "exact_fast" and P > 16 * budget_pages:
        # Measured (exp/topk_probe.py, committed log exp/r3_chip):
        # the exactness certificate holds on 100% of rows at
        # P=16K (13.3 vs 31.5 us for the full sort) but fails on 64%
        # of rows at P=64K, where paying approx + the cond'd full
        # sort SERIALLY is a net loss (134.7 vs 124.9 us) — the
        # r01->r02 128K regression. Statically skip the certificate
        # path for pools where it is known unreliable.
        method = "exact"
    if method == "exact_fast":
        # Verified-exact selection: run the fast approx reduction, then
        # certify it. Let thr = min score among the K returned slots.
        # If count(s >= thr) == K for every row+head, the returned slots
        # are provably THE top-K set (all elements >= thr, and there
        # are exactly K of them); otherwise (a dropped entry or a score
        # tie at the boundary) lax.cond re-runs the full exact sort.
        # Cost on the happy path: approx_max_k (~15 us at [32, 2048])
        # plus one masked reduce — ~2x faster than lax.top_k, with
        # identical output semantics. The reference's fp16 radix
        # select also resolves boundary ties arbitrarily
        # (`decode_select_k.cuh:26-62`).
        av, ai = jax.lax.approx_max_k(s, budget_pages,
                                      recall_target=0.95)
        slot = jax.lax.broadcasted_iota(jnp.int32, ai.shape, 2)
        nv = jnp.minimum(jnp.int32(budget_pages), num_pages)
        real = slot < nv[:, None, None]
        thr = jnp.min(jnp.where(real, av, _POS_INF), axis=-1,
                      keepdims=True)                     # [B, H, 1]
        n_ge = jnp.sum((s >= thr).astype(jnp.int32), axis=-1)  # [B, H]
        certified = jnp.all(n_ge == nv[:, None])
        # (tuple(...): lax.top_k returns a list on jax 0.9, and cond
        # requires identical branch pytree STRUCTURE incl. Python type.)
        _, indices = jax.lax.cond(
            certified,
            lambda x: (av, ai),
            lambda x: tuple(jax.lax.top_k(x, budget_pages)),
            s)
    elif method == "approx":
        # Static pool size is necessary but not sufficient: soundness
        # is per ROW (a freshly admitted short sequence in a
        # continuous-batching batch has num_pages near the budget even
        # though the pool is large — PartialReduce can then surface
        # -inf slots below num_valid whose clamped ids would attend
        # uninitialized pool pages). r2 guarded this with a runtime
        # lax.cond to the full sort; measured on chip, the cond's
        # fusion barrier cost the composed serving pipeline ~40 us per
        # step at 32K (the r01->r02 serving regression). Replaced with
        # a branch-free PER-ROW repair: any row whose returned slots
        # contain -inf below num_valid (or that is short enough for
        # collisions, num_pages <= 2K) falls back to its LAST
        # min(K, num_pages) pages — always in-bounds, duplicate-free,
        # includes the forced last page, and exactly equal to the
        # all-pages (dense) selection when num_pages <= K. Long rows
        # pay one masked reduce; short/degraded rows trade approx
        # page-ranking for a recency window on that step only.
        av, ai = jax.lax.approx_max_k(s, budget_pages,
                                      recall_target=0.95)
        indices = _repair_approx(av, ai, num_pages, budget_pages)
    else:
        _, indices = jax.lax.top_k(s, budget_pages)
    # Junk slots (>= num_valid) may name padded page ids beyond the pool;
    # clamp so downstream gathers/DMAs always stay in-bounds.
    indices = jnp.clip(indices, 0, pool_pages - 1)
    num_valid = jnp.minimum(jnp.int32(budget_pages), num_pages)
    if sort_by_page:
        # Key junk slots past every real page id so they sort to the
        # tail; clamp the sorted keys back into the pool range.
        slot = jax.lax.broadcasted_iota(jnp.int32, indices.shape, 2)
        key = jnp.where(slot < num_valid[:, None, None], indices,
                        indices + 2 * pool_pages)
        indices = jnp.minimum(jnp.sort(key, axis=-1), pool_pages - 1)
    return indices.astype(jnp.int32), num_valid
