"""Accuracy-simulation of Quest attention (eager, full score matrix).

Mirrors the reference's eval-only monkey-patch path
(`/root/reference/evaluation/quest_attention.py:72-240`): per *query*
head, chunk the keys into pages, score each page with the sign-trick
upper bound, keep the top ``max(3, budget//chunk)`` chunks (plus causal
masking), and softmax over the surviving tokens only.

Unlike the reference, our production kernels already support GQA and
batching, so this module exists for (a) cross-checking the kernel path's
selection semantics and (b) reproducing the paper's accuracy protocol
bit-for-bit (per-query-head selection; token-budget clamping to
kv_seq_len; first two layers dense — handled by the caller).

O(T^2) memory — accuracy experiments only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def quest_sim_attention(q, k, v, token_budget: int, chunk_size: int,
                        sm_scale: float) -> jnp.ndarray:
    """Single-token decode attention with Quest chunk selection.

    q: [B, Hq, D] (rope applied); k/v: [B, Hq, T, D] (kv heads already
    repeated to query heads, as `repeat_kv` does in the reference
    :139-140). Returns [B, Hq, D] f32.
    """
    B, Hq, D = q.shape
    T = k.shape[2]
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    scores = jnp.einsum("bhd,bhtd->bht", qf, kf,
                        precision=jax.lax.Precision.HIGHEST) * sm_scale

    # Sign-trick page max (reference :146-184): maxK = K*sign(q),
    # q+ = q*sign(q); chunked max over keys.
    sign = jnp.where(qf > 0, 1.0, -1.0)
    max_key = kf * sign[:, :, None, :]
    q_pos = qf * sign

    pad = (-T) % chunk_size
    max_key = jnp.pad(max_key, ((0, 0), (0, 0), (0, pad), (0, 0)),
                      constant_values=_NEG)
    n_chunks = (T + pad) // chunk_size
    chunk_max = max_key.reshape(B, Hq, n_chunks, chunk_size, D).max(axis=3)
    chunk_score = jnp.einsum("bhd,bhcd->bhc", q_pos, chunk_max,
                             precision=jax.lax.Precision.HIGHEST)

    # Reference chunk count: min(max(3, budget//chunk), n_chunks) (:55-57).
    budget = min(token_budget, T)
    k_chunks = min(max(3, budget // chunk_size), n_chunks)
    _, top_idx = jax.lax.top_k(chunk_score, k_chunks)   # [B, Hq, k_chunks]

    chunk_ids = jnp.arange(n_chunks)
    keep = jnp.any(chunk_ids[None, None, :, None]
                   == top_idx[:, :, None, :], axis=-1)  # [B, Hq, n_chunks]
    keep_tok = jnp.repeat(keep, chunk_size, axis=-1)[:, :, :T]

    masked = jnp.where(keep_tok, scores, _NEG)
    m = masked.max(axis=-1, keepdims=True)
    p = jnp.exp(masked - m)
    out = jnp.einsum("bht,bhtd->bhd", p, vf,
                     precision=jax.lax.Precision.HIGHEST)
    return out / p.sum(axis=-1, keepdims=True)
