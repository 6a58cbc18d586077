"""Query-aware page criticality estimation — the heart of Quest.

Reference kernel: `MaxPossibleSampleWithPagedKVCache`
(`/root/reference/kernels/include/decode/decode_attn.cuh:138-168,245-401`):
for every page p and head h,
    score[h, p] = sum_d max(q[h,d] * maxK[p,d], q[h,d] * minK[p,d])
an upper bound on the page's pre-softmax attention score.

TPU-first observation: the elementwise max of the two products splits by
the sign of q, so
    score = relu(q) @ maxK^T + min(q, 0) @ minK^T
i.e. **two MXU matmuls** over the contiguous metadata arrays — no custom
kernel needed; XLA fuses the relu/min into the matmul operands. (The
eval-only simulation path uses the same sign trick:
`/root/reference/evaluation/quest_attention.py:146-148`.) Measured
alternative rejected: packing max/min into one ``[P, 2, D]`` array and
doing a single ``[P, 2D]`` reshape-matmul lowers ~10x slower on TPU.

GQA: queries are reshaped per KV-head group and scores are aggregated
over the group (max or sum) so that page selection is per KV head —
shard-local under head sharding and bandwidth-optimal in the sparse
attention kernel. For MHA (group=1) this is exactly the reference's
per-head selection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _group_scores(q: jnp.ndarray, k_max: jnp.ndarray,
                  k_min: jnp.ndarray) -> jnp.ndarray:
    """[B, Hq, D] x 2x[B, Hkv, P, D] -> [B, Hkv, G, P] f32."""
    B, Hq, D = q.shape
    Hkv = k_max.shape[1]
    G = Hq // Hkv
    qf = q.astype(jnp.float32).reshape(B, Hkv, G, D)
    return (jnp.einsum("bkgd,bkpd->bkgp", jnp.maximum(qf, 0.0),
                       k_max.astype(jnp.float32), precision=_HI)
            + jnp.einsum("bkgd,bkpd->bkgp", jnp.minimum(qf, 0.0),
                         k_min.astype(jnp.float32), precision=_HI))


def page_scores(q: jnp.ndarray, k_max: jnp.ndarray, k_min: jnp.ndarray,
                group_agg: str = "max") -> jnp.ndarray:
    """Criticality scores per KV head.

    Args:
      q: [B, Hq, D] current decode query (un-scaled; scores are only
         used for ranking within a head so the softmax scale is moot).
      k_max/k_min: [B, Hkv, P, D] per-page metadata.
      group_agg: how to combine scores of the Hq//Hkv query heads that
         share a KV head ("max" | "sum").

    Returns:
      [B, Hkv, P] f32 scores.
    """
    scores = _group_scores(q, k_max, k_min)
    if group_agg == "max":
        return scores.max(axis=2)
    elif group_agg == "sum":
        return scores.sum(axis=2)
    raise ValueError(f"unknown group_agg {group_agg!r}")


def page_scores_per_qhead(q: jnp.ndarray, k_max: jnp.ndarray,
                          k_min: jnp.ndarray) -> jnp.ndarray:
    """Un-aggregated scores [B, Hq, P] (used by the accuracy-simulation
    path, mirroring `/root/reference/evaluation/quest_attention.py`)."""
    B, Hq, _ = q.shape
    return _group_scores(q, k_max, k_min).reshape(B, Hq, -1)
