"""Eager jnp oracle implementations.

These mirror the reference's CPU oracles
(`/root/reference/kernels/src/include/cpu_reference.h`: `single_mha:56`,
`selected_single_mha:162`) and are the ground truth the Pallas kernels
are tested against. They materialize full score matrices — accuracy /
testing only, never the serving path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _softmax_attend(scores: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    # scores [..., T]; v [..., T, D]
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    return jnp.einsum("...t,...td->...d", p, v, precision=_HI) / jnp.sum(p, axis=-1,
                                                          keepdims=True)


def dense_decode_attention_reference(q, k_flat, v_flat, seq_lens,
                                     sm_scale: float) -> jnp.ndarray:
    """Single-query attention over the first ``seq_len`` cached tokens.

    q: [B, Hq, D]; k_flat/v_flat: [B, Hkv, T, D]; seq_lens: [B].
    Returns [B, Hq, D] f32.
    """
    B, Hq, D = q.shape
    Hkv, T = k_flat.shape[1], k_flat.shape[2]
    G = Hq // Hkv
    qf = q.astype(jnp.float32).reshape(B, Hkv, G, D) * sm_scale
    kf = k_flat.astype(jnp.float32)
    vf = v_flat.astype(jnp.float32)
    scores = jnp.einsum("bkgd,bktd->bkgt", qf, kf, precision=_HI)
    tok = jnp.arange(T)[None, None, None, :]
    scores = jnp.where(tok < seq_lens[:, None, None, None], scores,
                       _MASK_VALUE)
    out = _softmax_attend(scores, vf[:, :, None])  # vf [B,Hkv,1,T,D]
    return out.reshape(B, Hq, D)


def sparse_decode_attention_reference(q, k_pages, v_pages, indices,
                                      num_valid, seq_lens,
                                      sm_scale: float) -> jnp.ndarray:
    """Attention restricted to the selected pages per KV head.

    Mirrors `selected_single_mha` (`cpu_reference.h:162-292`), with the
    last page's partial fill masked by ``seq_len`` instead of a forced
    append (the selection already contains the last page, see topk.py).

    q: [B, Hq, D]; k_pages/v_pages: [B, Hkv, P, page, D];
    indices: [B, Hkv, S]; num_valid: [B]; seq_lens: [B].
    Returns [B, Hq, D] f32.
    """
    B, Hq, D = q.shape
    _, Hkv, P, page, _ = k_pages.shape
    S = indices.shape[-1]
    G = Hq // Hkv
    qf = q.astype(jnp.float32).reshape(B, Hkv, G, D) * sm_scale

    # Gather selected pages: [B, Hkv, S, page, D]. Junk slots (>= num_valid)
    # may hold out-of-range ids; clamp so the gather stays in-bounds (the
    # slots are masked below — NaN fill would poison 0*NaN in the PV sum).
    safe = jnp.clip(indices, 0, P - 1)[..., None, None].astype(jnp.int32)
    k_sel = jnp.take_along_axis(k_pages, safe, axis=2)
    v_sel = jnp.take_along_axis(v_pages, safe, axis=2)
    k_sel = k_sel.astype(jnp.float32).reshape(B, Hkv, S * page, D)
    v_sel = v_sel.astype(jnp.float32).reshape(B, Hkv, S * page, D)

    scores = jnp.einsum("bkgd,bktd->bkgt", qf, k_sel, precision=_HI)  # [B,Hkv,G,S*page]

    slot = jnp.arange(S)[None, None, :, None]               # [1,1,S,1]
    entry = jnp.arange(page)[None, None, None, :]           # [1,1,1,page]
    global_tok = indices[..., None] * page + entry          # [B,Hkv,S,page]
    valid = ((slot < num_valid[:, None, None, None])
             & (global_tok < seq_lens[:, None, None, None]))
    valid = valid.reshape(B, Hkv, 1, S * page)
    scores = jnp.where(valid, scores, _MASK_VALUE)
    out = _softmax_attend(scores, v_sel[:, :, None])
    return out.reshape(B, Hq, D)


def prefill_attention_reference(q, k_flat, v_flat, q_offsets, kv_lens,
                                sm_scale: float) -> jnp.ndarray:
    """Causal attention of T fresh queries over the cache.

    Query i of sequence b sits at absolute position ``q_offsets[b] + i``
    and attends to cached tokens ``<= `` that position (the new tokens
    have already been appended). q: [B, T, Hq, D];
    k_flat/v_flat: [B, Hkv, Tkv, D]; kv_lens = q_offsets + T. Returns
    [B, T, Hq, D] f32.
    """
    B, T, Hq, D = q.shape
    Hkv, Tkv = k_flat.shape[1], k_flat.shape[2]
    G = Hq // Hkv
    qf = (q.astype(jnp.float32) * sm_scale).transpose(0, 2, 1, 3)
    qf = qf.reshape(B, Hkv, G, T, D)
    kf = k_flat.astype(jnp.float32)
    vf = v_flat.astype(jnp.float32)
    scores = jnp.einsum("bkgqd,bktd->bkgqt", qf, kf, precision=_HI)
    q_pos = q_offsets[:, None] + jnp.arange(T)[None, :]      # [B, T]
    tok = jnp.arange(Tkv)[None, :]                            # [1, Tkv]
    mask = ((tok[:, None, :] <= q_pos[:, :, None])
            & (tok[:, None, :] < kv_lens[:, None, None]))     # [B,T,Tkv]
    scores = jnp.where(mask[:, None, None], scores, _MASK_VALUE)
    out = _softmax_attend(scores, vf[:, :, None, None])
    return out.reshape(B, Hq, T, D).transpose(0, 2, 1, 3)


def estimate_reference(q, k_min, k_max) -> jnp.ndarray:
    """Double-loop-equivalent estimate oracle
    (`/root/reference/kernels/src/test/test_max_possible.cu:81-106`):
    score[h,p] = sum_d max(q_d*maxK_d, q_d*minK_d). Returns [B, Hq, P]."""
    B, Hq, D = q.shape
    Hkv = k_min.shape[1]
    G = Hq // Hkv
    qf = q.astype(jnp.float32).reshape(B, Hkv, G, 1, D)
    prod_max = qf * k_max.astype(jnp.float32)[:, :, None]    # [B,Hkv,G,P,D]
    prod_min = qf * k_min.astype(jnp.float32)[:, :, None]
    return jnp.maximum(prod_max, prod_min).sum(-1).reshape(B, Hq, -1)
