"""Paged KV cache with per-page min/max Key metadata — TPU-native.

Reference counterparts: `KvPool`/`KvCache`
(`/root/reference/quest/utils/kv_cache.py:7-133`) and the fused
append+metadata CUDA kernels
(`/root/reference/kernels/include/decode/decode_page.cuh:398-562`).

TPU-first redesign:
  * **Packed head-major layout** ``kv_pages [L, B, Hkv, pages, 2,
    page_size, head_dim]`` (axis -3: 0=K, 1=V) — one page is a
    contiguous ``[2, page, D]`` 8 KB bf16 block, so the sparse-decode
    gather fetches a page's K *and* V with a single DMA descriptor
    (scalar-core descriptor issue is the measured bottleneck at this
    granularity), and the head axis is the natural tensor-parallel
    sharding axis (per-head page selection is shard-local).
  * **Metadata as two dense contiguous arrays** ``k_max/k_min
    [L, B, Hkv, pages, head_dim]`` (the reference stores these as the
    K/V slots of a second paged cache, `controller.py:29-37`): the
    estimate op consumes them as plain matmul operands. (Measured: a
    packed ``[pages, 2, D]`` variant looks elegant but XLA lowers the
    reshape-matmul 10x slower than two matmuls on contiguous arrays.)
  * **Static shapes**: the pool is pre-sized to ``max_pages``; a scalar
    ``seq_lens`` tracks fill. Pages of a sequence occupy slots
    ``0..ceil(seq/page)-1`` in order — appends are
    ``dynamic_update_slice`` (kept in-place by donation). No per-step
    host planning, unlike the reference's `begin_forward` re-uploading
    index tensors every token (`controller.py:80-129`).

Invariant: garbage data only ever exists at token positions ``>= seq_len``
(inside the last partial page or in untouched pages); every consumer masks
by ``seq_len``, and metadata for valid pages is computed over valid
entries only.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from quest_tpu.config import ModelConfig, QuestConfig

K, V = 0, 1      # kv_pages axis -3


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """Whole-model paged KV state (a pytree; donate it through jit)."""

    kv_pages: jnp.ndarray  # [L, B, Hkv, P, 2, page, D]
    k_max: jnp.ndarray     # [L, B, Hkv, P, D]
    k_min: jnp.ndarray     # [L, B, Hkv, P, D]
    seq_lens: jnp.ndarray  # [B] int32 — tokens currently stored

    @property
    def page_size(self) -> int:
        return self.kv_pages.shape[-2]

    @property
    def max_pages(self) -> int:
        return self.kv_pages.shape[-4]

    @property
    def batch_size(self) -> int:
        return self.kv_pages.shape[1]

    def layer(self, l: int) -> "LayerKV":
        return LayerKV(self.kv_pages[l], self.k_max[l], self.k_min[l],
                       self.seq_lens)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LayerKV:
    """Single-layer view used inside the per-layer scan body."""

    kv_pages: jnp.ndarray  # [B, Hkv, P, 2, page, D]
    k_max: jnp.ndarray     # [B, Hkv, P, D]
    k_min: jnp.ndarray     # [B, Hkv, P, D]
    seq_lens: jnp.ndarray  # [B]

    # Unpacked views (testing/oracle convenience; strided — not for the
    # serving path).
    @property
    def k_pages(self) -> jnp.ndarray:
        return self.kv_pages[:, :, :, K]

    @property
    def v_pages(self) -> jnp.ndarray:
        return self.kv_pages[:, :, :, V]


def init_cache(model: ModelConfig, quest: QuestConfig, batch_size: int = 1,
               num_layers: int | None = None) -> PagedKVCache:
    """Allocate the full pool up-front (reference: `kv_cache.py:20-23`)."""
    L = num_layers if num_layers is not None else model.num_layers
    B, H, D = batch_size, model.num_kv_heads, model.head_dim
    P, page = quest.max_pages, quest.page_size
    dt = quest.kv_dtype
    mdt = quest.resolved_meta_dtype
    return PagedKVCache(
        kv_pages=jnp.zeros((L, B, H, P, 2, page, D), dtype=dt),
        k_max=jnp.zeros((L, B, H, P, D), dtype=mdt),
        k_min=jnp.zeros((L, B, H, P, D), dtype=mdt),
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
    page = layer.kv_pages.shape[-2]

    def one(kv, kmax, kmin, k, v, pos):
        # kv [Hkv, P, 2, page, D]; kmax/kmin [Hkv, P, D]; k/v [Hkv, D]
        H, D = k.shape
        p_idx = pos // page
        e_idx = pos % page
        tok = jnp.stack([k, v], axis=1)[:, None, :, None, :]  # [H,1,2,1,D]
        kv = jax.lax.dynamic_update_slice(kv, tok.astype(kv.dtype),
                                          (0, p_idx, 0, e_idx, 0))
        old_max = jax.lax.dynamic_slice(kmax, (0, p_idx, 0),
                                        (H, 1, D))[:, 0].astype(jnp.float32)
        old_min = jax.lax.dynamic_slice(kmin, (0, p_idx, 0),
                                        (H, 1, D))[:, 0].astype(jnp.float32)
        kf = k.astype(jnp.float32)
        first = (e_idx == 0)
        new_max = jnp.where(first, kf, jnp.maximum(old_max, kf))
        new_min = jnp.where(first, kf, jnp.minimum(old_min, kf))
        kmax = jax.lax.dynamic_update_slice(
            kmax, new_max[:, None].astype(kmax.dtype), (0, p_idx, 0))
        kmin = jax.lax.dynamic_update_slice(
            kmin, new_min[:, None].astype(kmin.dtype), (0, p_idx, 0))
        return kv, kmax, kmin

    kv, kmax, kmin = jax.vmap(one)(
        layer.kv_pages, layer.k_max, layer.k_min,
        k_new.astype(layer.kv_pages.dtype),
        v_new.astype(layer.kv_pages.dtype),
        layer.seq_lens)
    return LayerKV(kv, kmax, kmin, layer.seq_lens)


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
    page = layer.kv_pages.shape[-2]
    P = layer.kv_pages.shape[-4]
    if new_lens is None:
        new_lens = jnp.full((B,), T, dtype=jnp.int32)

    # Static window of pages touched by this append. W*page >= T + 2*page
    # covers any in-page offset, including the clamp at the pool end.
    W = min(P, T // page + 2)

    def one(kv, kmax, kmin, k, v, offset, nlen):
        # kv [Hkv, P, 2, page, D]; k [T, Hkv, D]
        k_t = k.transpose(1, 0, 2).astype(kv.dtype)   # [Hkv, T, D]
        v_t = v.transpose(1, 0, 2).astype(kv.dtype)
        p0 = jnp.minimum(offset // page, P - W)
        local = offset - p0 * page                    # in-window token start
        win = jax.lax.dynamic_slice(kv, (0, p0, 0, 0, 0),
                                    (H, W, 2, page, D))
        # Token-flattened K and V views of the window (free reshapes of
        # the per-slot [W, page] axes after peeling the K/V axis).
        win_k = win[:, :, K].reshape(H, W * page, D)
        win_v = win[:, :, V].reshape(H, W * page, D)
        win_k = jax.lax.dynamic_update_slice(win_k, k_t, (0, local, 0))
        win_v = jax.lax.dynamic_update_slice(win_v, v_t, (0, local, 0))
        win = jnp.stack([win_k.reshape(H, W, page, D),
                         win_v.reshape(H, W, page, D)], axis=2)
        kv = jax.lax.dynamic_update_slice(kv, win, (0, p0, 0, 0, 0))

        # Recompute min/max over the touched page window [p0, p0+W).
        new_len = offset + nlen
        wkf = win[:, :, K].astype(jnp.float32)                # [H, W, page, D]
        tok_ids = ((p0 + jnp.arange(W))[:, None] * page
                   + jnp.arange(page)[None, :])               # [W, page]
        valid = (tok_ids < new_len)[None, :, :, None]         # [1, W, page, 1]
        big = jnp.float32(3.0e38)
        wmax = jnp.max(jnp.where(valid, wkf, -big), axis=2)   # [H, W, D]
        wmin = jnp.min(jnp.where(valid, wkf, big), axis=2)
        any_valid = jnp.any(valid, axis=2)                    # [1, W, 1]
        old_max = jax.lax.dynamic_slice(kmax, (0, p0, 0), (H, W, D))
        old_min = jax.lax.dynamic_slice(kmin, (0, p0, 0), (H, W, D))
        wmax = jnp.where(any_valid, wmax, old_max.astype(jnp.float32))
        wmin = jnp.where(any_valid, wmin, old_min.astype(jnp.float32))
        wmax = wmax.astype(kmax.dtype)
        wmin = wmin.astype(kmin.dtype)
        kmax = jax.lax.dynamic_update_slice(kmax, wmax, (0, p0, 0))
        kmin = jax.lax.dynamic_update_slice(kmin, wmin, (0, p0, 0))
        return kv, kmax, kmin

    kv, kmax, kmin = jax.vmap(one)(
        layer.kv_pages, layer.k_max, layer.k_min, k_new, v_new,
        layer.seq_lens, new_lens)
    return LayerKV(kv, kmax, kmin, layer.seq_lens)


# ---------------------------------------------------------------------------
# Whole-pool variants with a STATIC layer index — the zero-copy serving
# path. The unrolled model keeps the persistent [L, ...] pool arrays in
# the donated step state; every append is a token-sized
# dynamic_update_slice directly into the full buffer (XLA keeps donated
# dus in place), and the attention kernels read the same buffer via
# layer-indexed BlockSpecs. No per-layer slicing, stacking, or layout
# copies (a scan-over-layers formulation measured ~1 full cache copy
# per decode step).
# ---------------------------------------------------------------------------

def append_decode_at(cache: PagedKVCache, layer: int, k_new: jnp.ndarray,
                     v_new: jnp.ndarray,
                     active: jnp.ndarray | None = None) -> PagedKVCache:
    """Write one token per sequence into layer ``layer`` (static).

    ``k_new, v_new``: [B, Hkv, D]; written at ``seq_lens[b]``. Returns a
    cache whose arrays alias-update in place under donation.

    ``active`` [B] bool: slots with ``active=False`` keep their
    *metadata* untouched — their data write lands in the garbage region
    beyond ``seq_len`` (harmless, overwritten later), but a metadata
    max/min fold of a garbage key would persist and inflate the page's
    criticality bound forever.
    """
    kv, kmax, kmin = cache.kv_pages, cache.k_max, cache.k_min
    page = kv.shape[-2]
    B, H, D = k_new.shape
    kq = k_new.astype(kv.dtype)
    vq = v_new.astype(kv.dtype)
    for b in range(B):
        pos = cache.seq_lens[b]
        p_idx = pos // page
        e_idx = pos % page
        tok = jnp.stack([kq[b], vq[b]], axis=1)  # [H, 2, D]
        kv = jax.lax.dynamic_update_slice(
            kv, tok[None, None, :, None, :, None, :],
            (layer, b, 0, p_idx, 0, e_idx, 0))
        old_max = jax.lax.dynamic_slice(
            kmax, (layer, b, 0, p_idx, 0),
            (1, 1, H, 1, D))[0, 0, :, 0].astype(jnp.float32)
        old_min = jax.lax.dynamic_slice(
            kmin, (layer, b, 0, p_idx, 0),
            (1, 1, H, 1, D))[0, 0, :, 0].astype(jnp.float32)
        kf = kq[b].astype(jnp.float32)
        first = (e_idx == 0)
        new_max = jnp.where(first, kf, jnp.maximum(old_max, kf))
        new_min = jnp.where(first, kf, jnp.minimum(old_min, kf))
        if active is not None:
            new_max = jnp.where(active[b], new_max, old_max)
            new_min = jnp.where(active[b], new_min, old_min)
        kmax = jax.lax.dynamic_update_slice(
            kmax, new_max[None, None, :, None, :].astype(kmax.dtype),
            (layer, b, 0, p_idx, 0))
        kmin = jax.lax.dynamic_update_slice(
            kmin, new_min[None, None, :, None, :].astype(kmin.dtype),
            (layer, b, 0, p_idx, 0))
    return PagedKVCache(kv, kmax, kmin, cache.seq_lens)


def append_prefill_at(cache: PagedKVCache, layer: int, k_new: jnp.ndarray,
                      v_new: jnp.ndarray,
                      new_lens: jnp.ndarray | None = None) -> PagedKVCache:
    """Write ``T`` tokens per sequence into layer ``layer`` (static),
    starting at ``seq_lens[b]``; window read-modify-write of the
    touched pages only (see append_prefill for semantics)."""
    kv, kmax, kmin = cache.kv_pages, cache.k_max, cache.k_min
    B, T, H, D = k_new.shape
    page = kv.shape[-2]
    P = kv.shape[3]
    if new_lens is None:
        new_lens = jnp.full((B,), T, dtype=jnp.int32)
    W = min(P, T // page + 2)

    for b in range(B):
        offset = cache.seq_lens[b]
        nlen = new_lens[b]
        k_t = k_new[b].transpose(1, 0, 2).astype(kv.dtype)  # [H, T, D]
        v_t = v_new[b].transpose(1, 0, 2).astype(kv.dtype)
        p0 = jnp.minimum(offset // page, P - W)
        local = offset - p0 * page
        win = jax.lax.dynamic_slice(kv, (layer, b, 0, p0, 0, 0, 0),
                                    (1, 1, H, W, 2, page, D))[0, 0]
        win_k = win[:, :, K].reshape(H, W * page, D)
        win_v = win[:, :, V].reshape(H, W * page, D)
        win_k = jax.lax.dynamic_update_slice(win_k, k_t, (0, local, 0))
        win_v = jax.lax.dynamic_update_slice(win_v, v_t, (0, local, 0))
        win = jnp.stack([win_k.reshape(H, W, page, D),
                         win_v.reshape(H, W, page, D)], axis=2)
        kv = jax.lax.dynamic_update_slice(kv, win[None, None],
                                          (layer, b, 0, p0, 0, 0, 0))

        new_len = offset + nlen
        wkf = win[:, :, K].astype(jnp.float32)
        tok_ids = ((p0 + jnp.arange(W))[:, None] * page
                   + jnp.arange(page)[None, :])
        valid = (tok_ids < new_len)[None, :, :, None]
        big = jnp.float32(3.0e38)
        wmax = jnp.max(jnp.where(valid, wkf, -big), axis=2)
        wmin = jnp.min(jnp.where(valid, wkf, big), axis=2)
        any_valid = jnp.any(valid, axis=2)
        old_max = jax.lax.dynamic_slice(kmax, (layer, b, 0, p0, 0),
                                        (1, 1, H, W, D))[0, 0]
        old_min = jax.lax.dynamic_slice(kmin, (layer, b, 0, p0, 0),
                                        (1, 1, H, W, D))[0, 0]
        wmax = jnp.where(any_valid, wmax, old_max.astype(jnp.float32))
        wmin = jnp.where(any_valid, wmin, old_min.astype(jnp.float32))
        wmax = wmax.astype(kmax.dtype)
        wmin = wmin.astype(kmin.dtype)
        kmax = jax.lax.dynamic_update_slice(kmax, wmax[None, None],
                                            (layer, b, 0, p0, 0))
        kmin = jax.lax.dynamic_update_slice(kmin, wmin[None, None],
                                            (layer, b, 0, p0, 0))
    return PagedKVCache(kv, kmax, kmin, cache.seq_lens)
