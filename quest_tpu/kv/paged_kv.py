"""Paged KV cache with per-page min/max Key metadata — TPU-native.

Reference counterparts: `KvPool`/`KvCache`
(`/root/reference/quest/utils/kv_cache.py:7-133`) and the fused
append+metadata CUDA kernels
(`/root/reference/kernels/include/decode/decode_page.cuh:398-562`).

TPU-first redesign:
  * **Head-major layout** ``[L, B, Hkv, pages, page_size, head_dim]`` —
    one page per (kv-head) is a contiguous ``16x128`` block, exactly one
    bf16 VMEM tile, and the head axis is the natural tensor-parallel
    sharding axis (per-head page selection is shard-local).
  * **Static shapes**: the pool is pre-sized to ``max_pages``; a scalar
    ``seq_lens`` tracks fill. Pages of a sequence occupy slots
    ``0..ceil(seq/page)-1`` in order, so the "page table" is the identity
    and a flattened ``[pages*page_size]`` token view is contiguous —
    appends become ``dynamic_update_slice`` (XLA keeps them in-place with
    buffer donation). No per-step host planning, unlike the reference's
    `begin_forward` re-uploading index tensors every token
    (`/root/reference/quest/utils/controller.py:80-129`).
  * **Metadata as dense arrays** ``k_min/k_max [L, B, Hkv, pages, D]``
    instead of a second paged cache: the estimate op consumes them as
    plain matmul operands.

Invariant: garbage data only ever exists at token positions ``>= seq_len``
(inside the last partial page or in untouched pages); every consumer masks
by ``seq_len``, and metadata for valid pages is computed over valid
entries only.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from quest_tpu.config import ModelConfig, QuestConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """Whole-model paged KV state (a pytree; donate it through jit)."""

    k_pages: jnp.ndarray   # [L, B, Hkv, P, page, D]
    v_pages: jnp.ndarray   # [L, B, Hkv, P, page, D]
    k_min: jnp.ndarray     # [L, B, Hkv, P, D]
    k_max: jnp.ndarray     # [L, B, Hkv, P, D]
    seq_lens: jnp.ndarray  # [B] int32 — tokens currently stored

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[-2]

    @property
    def max_pages(self) -> int:
        return self.k_pages.shape[-3]

    @property
    def batch_size(self) -> int:
        return self.k_pages.shape[1]

    def layer(self, l: int) -> "LayerKV":
        return LayerKV(self.k_pages[l], self.v_pages[l],
                       self.k_min[l], self.k_max[l], self.seq_lens)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LayerKV:
    """Single-layer view used inside the per-layer scan body."""

    k_pages: jnp.ndarray   # [B, Hkv, P, page, D]
    v_pages: jnp.ndarray
    k_min: jnp.ndarray     # [B, Hkv, P, D]
    k_max: jnp.ndarray
    seq_lens: jnp.ndarray  # [B]


def init_cache(model: ModelConfig, quest: QuestConfig, batch_size: int = 1,
               num_layers: int | None = None) -> PagedKVCache:
    """Allocate the full pool up-front (reference: `kv_cache.py:20-23`)."""
    L = num_layers if num_layers is not None else model.num_layers
    B, H, D = batch_size, model.num_kv_heads, model.head_dim
    P, page = quest.max_pages, quest.page_size
    dt = quest.kv_dtype
    return PagedKVCache(
        k_pages=jnp.zeros((L, B, H, P, page, D), dtype=dt),
        v_pages=jnp.zeros((L, B, H, P, page, D), dtype=dt),
        k_min=jnp.zeros((L, B, H, P, D), dtype=dt),
        k_max=jnp.zeros((L, B, H, P, D), dtype=dt),
        seq_lens=jnp.zeros((B,), dtype=jnp.int32),
    )


# ---------------------------------------------------------------------------
# Append — decode (one token) with incremental metadata update.
# Reference: AppendPagedKVCacheDecodeKernel (`decode_page.cuh:398-449`).
# ---------------------------------------------------------------------------

def append_decode(layer: LayerKV, k_new: jnp.ndarray,
                  v_new: jnp.ndarray) -> LayerKV:
    """Write one token per sequence.

    ``k_new, v_new``: [B, Hkv, D]; written at position ``seq_lens[b]``.
    Does NOT advance ``seq_lens`` (the model does that once per step).
    """
    page = layer.k_pages.shape[-2]

    def one(kp, vp, kmin, kmax, k, v, pos):
        # kp/vp [Hkv, P, page, D]; kmin/kmax [Hkv, P, D]; k/v [Hkv, D]
        p_idx = pos // page
        e_idx = pos % page
        kp = jax.lax.dynamic_update_slice(kp, k[:, None, None, :],
                                          (0, p_idx, e_idx, 0))
        vp = jax.lax.dynamic_update_slice(vp, v[:, None, None, :],
                                          (0, p_idx, e_idx, 0))
        H, D = k.shape
        old_min = jax.lax.dynamic_slice(kmin, (0, p_idx, 0), (H, 1, D))[:, 0]
        old_max = jax.lax.dynamic_slice(kmax, (0, p_idx, 0), (H, 1, D))[:, 0]
        first = (e_idx == 0)
        new_min = jnp.where(first, k, jnp.minimum(old_min, k))
        new_max = jnp.where(first, k, jnp.maximum(old_max, k))
        kmin = jax.lax.dynamic_update_slice(kmin, new_min[:, None, :], (0, p_idx, 0))
        kmax = jax.lax.dynamic_update_slice(kmax, new_max[:, None, :], (0, p_idx, 0))
        return kp, vp, kmin, kmax

    kp, vp, kmin, kmax = jax.vmap(one)(
        layer.k_pages, layer.v_pages, layer.k_min, layer.k_max,
        k_new.astype(layer.k_pages.dtype), v_new.astype(layer.v_pages.dtype),
        layer.seq_lens)
    return LayerKV(kp, vp, kmin, kmax, layer.seq_lens)


# ---------------------------------------------------------------------------
# Append — prefill (T tokens) with windowed metadata recompute.
# Reference: AppendPagedKVCachePrefillKernel (`decode_page.cuh:471-562`).
# ---------------------------------------------------------------------------

def append_prefill(layer: LayerKV, k_new: jnp.ndarray, v_new: jnp.ndarray,
                   new_lens: jnp.ndarray | None = None) -> LayerKV:
    """Write ``T`` tokens per sequence starting at ``seq_lens[b]``.

    ``k_new, v_new``: [B, T, Hkv, D]. ``new_lens`` [B] gives the number of
    real (non-padding) tokens per sequence (defaults to T). Padding tokens
    may be written as scratch beyond ``seq_len + new_len`` — every reader
    masks by sequence length, so this is harmless (see module invariant).
    Caller must guarantee ``seq_lens[b] + T <= max_pages * page``.
    """
    B, T, H, D = k_new.shape
    page = layer.k_pages.shape[-2]
    P = layer.k_pages.shape[-3]
    if new_lens is None:
        new_lens = jnp.full((B,), T, dtype=jnp.int32)

    # Static window of pages touched by this append.
    W = min(P, T // page + 2)

    def one(kp, vp, kmin, kmax, k, v, offset, nlen):
        # kp [Hkv, P, page, D]; k [T, Hkv, D]
        # token-flattened write (pages × page_size are adjacent dims)
        kp_flat = kp.reshape(H, P * page, D)
        vp_flat = vp.reshape(H, P * page, D)
        k_t = k.transpose(1, 0, 2).astype(kp.dtype)   # [Hkv, T, D]
        v_t = v.transpose(1, 0, 2).astype(vp.dtype)
        kp_flat = jax.lax.dynamic_update_slice(kp_flat, k_t, (0, offset, 0))
        vp_flat = jax.lax.dynamic_update_slice(vp_flat, v_t, (0, offset, 0))
        kp = kp_flat.reshape(H, P, page, D)
        vp = vp_flat.reshape(H, P, page, D)

        # Recompute min/max over the touched page window [p0, p0+W).
        new_len = offset + nlen
        p0 = jnp.minimum(offset // page, P - W)
        win = jax.lax.dynamic_slice(kp, (0, p0, 0, 0), (H, W, page, D))
        win = win.astype(jnp.float32)
        tok_ids = ((p0 + jnp.arange(W))[:, None] * page
                   + jnp.arange(page)[None, :])          # [W, page]
        valid = (tok_ids < new_len)[None, :, :, None]     # [1, W, page, 1]
        big = jnp.float32(3.0e38)
        wmin = jnp.min(jnp.where(valid, win, big), axis=2)    # [H, W, D]
        wmax = jnp.max(jnp.where(valid, win, -big), axis=2)
        any_valid = jnp.any(valid, axis=2)                    # [1, W, 1]
        old_min = jax.lax.dynamic_slice(kmin, (0, p0, 0), (H, W, D))
        old_max = jax.lax.dynamic_slice(kmax, (0, p0, 0), (H, W, D))
        wmin = jnp.where(any_valid, wmin.astype(kmin.dtype), old_min)
        wmax = jnp.where(any_valid, wmax.astype(kmax.dtype), old_max)
        kmin = jax.lax.dynamic_update_slice(kmin, wmin, (0, p0, 0))
        kmax = jax.lax.dynamic_update_slice(kmax, wmax, (0, p0, 0))
        return kp, vp, kmin, kmax

    kp, vp, kmin, kmax = jax.vmap(one)(
        layer.k_pages, layer.v_pages, layer.k_min, layer.k_max,
        k_new, v_new, layer.seq_lens, new_lens)
    return LayerKV(kp, vp, kmin, kmax, layer.seq_lens)


def contiguous_kv(layer: LayerKV) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Token-contiguous view ``[B, Hkv, P*page, D]`` (free reshape)."""
    B, H, P, page, D = layer.k_pages.shape
    return (layer.k_pages.reshape(B, H, P * page, D),
            layer.v_pages.reshape(B, H, P * page, D))
