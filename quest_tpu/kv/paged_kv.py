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
  * **Metadata as two dense contiguous arrays keyed by PHYSICAL page**
    ``k_max/k_min [L, Hkv, phys_blocks, block_pages, head_dim]``,
    parallel to the physical data pool (the reference stores these as
    the K/V slots of a second per-sequence paged cache,
    `controller.py:29-37`). Keying by physical page means metadata
    travels WITH the page: prefix-cache admission aliases shared
    blocks into a new slot's table and their min/max metadata comes
    along for free (round 3 kept metadata slot-dense and had to
    recompute it from KV data on every borrow — a measured net
    slowdown). The estimate scores the physical pool once per batch
    with two MXU matmuls on the contiguous arrays, then each slot
    gathers its logical scores through its block table (a tiny
    [B, H, P] f32 gather; ops/estimate.py:page_scores_physical).
    (Measured: a packed ``[pages, 2, D]`` variant looks elegant but
    XLA lowers the reshape-matmul 10x slower than two matmuls on
    contiguous arrays.)
  * **Static shapes**: the pool is pre-sized to ``max_pages``; a scalar
    ``seq_lens`` tracks fill. Pages of a sequence occupy slots
    ``0..ceil(seq/page)-1`` in order — appends are
    ``dynamic_update_slice`` (kept in-place by donation). No per-step
    host planning, unlike the reference's `begin_forward` re-uploading
    index tensors every token (`controller.py:80-129`).

Invariants:
  * Garbage data only ever exists at token positions ``>= seq_len``
    (inside the last partial page, in untouched pages, or in the scratch
    block); every consumer masks by ``seq_len``, and metadata for valid
    pages is computed over valid entries only.
  * **The pool never contains non-finite values.** Score-masking alone
    cannot defend against NaN/inf garbage: a masked lane contributes
    ``0 x V`` to the output, and ``0 x NaN = NaN``. Inactive batch rows
    DO produce NaN activations (attention over zero valid keys is
    0/0), and their K/V writes land in the shared scratch block that
    other slots' masked lanes read. Every append therefore routes K/V
    through :func:`_finite` (non-finite -> 0); the pool starts zeroed,
    so the invariant holds inductively.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from quest_tpu.config import ModelConfig, QuestConfig

K, V = 0, 1      # kv_pages axis -3


def _finite(x: jnp.ndarray) -> jnp.ndarray:
    """Zero out non-finite lanes (see module invariant). Identity for
    real data; negligible VPU cost next to the attention kernels."""
    return jnp.where(jnp.isfinite(x), x, jnp.zeros_like(x))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """Whole-model paged KV state (a pytree; donate it through jit).

    The DATA pool is physically shared across batch slots (the
    reference shares one pool via per-seq page lists,
    `kv_cache.py:7-133`): ``kv_pages`` has no batch axis; each slot
    maps its logical pages onto physical pages through ``block_tab``
    at **block** granularity (``block_pages`` contiguous pages per
    allocation, config.py). Physical page of logical page ``p`` of
    slot ``b`` is ``block_tab[b, p // bpp] * bpp + p % bpp``.

    Physical block 0 is RESERVED as scratch: table rows of empty /
    released slots point at it, so masked writes (inactive decode
    rows, padded prefill rows) can never touch pages owned by another
    sequence. Allocators hand out blocks 1..NP/bpp-1.

    The min/max-Key METADATA is keyed by physical page too, blocked
    the same way (``[L, Hkv, NPB, bpp, D]`` with NPB*bpp == NP), so
    shared prefix blocks carry their metadata across slots and an
    admission that aliases blocks needs ZERO metadata work. Stale
    metadata in released blocks is harmless: a slot only exposes pages
    < num_pages, all freshly appended by their current owner.
    """

    kv_pages: jnp.ndarray   # [L, Hkv, NP, 2, page, D]  shared physical pool
    k_max: jnp.ndarray      # [L, Hkv, NPB, bpp, D]  physical-page-keyed
    k_min: jnp.ndarray      # [L, Hkv, NPB, bpp, D]
    block_tab: jnp.ndarray  # [B, NB] int32 physical block per logical block
    seq_lens: jnp.ndarray   # [B] int32 — tokens currently stored

    @property
    def page_size(self) -> int:
        return self.kv_pages.shape[-2]

    @property
    def max_pages(self) -> int:
        """Logical pages per slot."""
        return self.block_tab.shape[1] * self.block_pages

    @property
    def num_phys_pages(self) -> int:
        return self.kv_pages.shape[2]

    @property
    def block_pages(self) -> int:
        return self.k_max.shape[3]

    @property
    def batch_size(self) -> int:
        return self.block_tab.shape[0]

    def layer(self, l: int) -> "LayerKV":
        """Materialized per-slot view [B, Hkv, P, ...] of one layer
        (gathers through the block table — a copy; for tests/benches,
        not the serving path)."""
        bpp = self.block_pages
        B = self.batch_size
        P = self.max_pages
        phys = (self.block_tab[:, :, None] * bpp
                + jnp.arange(bpp)[None, None, :]).reshape(B, -1)  # [B, P]
        kv = self.kv_pages[l][:, phys]          # [Hkv, B, P, 2, page, D]
        Hkv, D = self.k_max.shape[1], self.k_max.shape[-1]
        kmax = self.k_max[l][:, self.block_tab]  # [Hkv, B, NB, bpp, D]
        kmin = self.k_min[l][:, self.block_tab]
        return LayerKV(jnp.swapaxes(kv, 0, 1),
                       jnp.swapaxes(kmax.reshape(Hkv, B, P, D), 0, 1),
                       jnp.swapaxes(kmin.reshape(Hkv, B, P, D), 0, 1),
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
               num_layers: int | None = None,
               total_pages: int | None = None,
               dp: int = 1) -> PagedKVCache:
    """Allocate the pool up-front (reference: `kv_cache.py:20-23`).

    ``total_pages``: physical data-pool size (defaults to scratch +
    batch_size*max_pages — full static reservation, the round-1
    behaviour). A continuous-batching engine passes a smaller pool and
    manages ``block_tab`` through the PagePool allocator (kv/pool.py);
    the default block table statically assigns slot ``b`` the
    contiguous block range ``[1 + b*NB, 1 + (b+1)*NB)``.

    ``dp``: number of data-parallel pool replicas. The physical page
    axis is dp-sharded (parallel/mesh.py), so block-table VALUES must
    be shard-local: with ``dp > 1`` the default layout repeats per
    shard (slot ``b`` maps to local-slot ``b % (B/dp)``'s identity
    range, and ``total_pages`` counts pages PER SHARD).
    """
    L = num_layers if num_layers is not None else model.num_layers
    B, H, D = batch_size, model.num_kv_heads, model.head_dim
    P, page = quest.max_pages, quest.page_size
    bpp = min(quest.block_pages, P)
    assert P % bpp == 0
    NB = P // bpp
    assert B % dp == 0
    Bl = B // dp
    if total_pages is None:
        total_pages = bpp + Bl * P       # scratch block + full reservation
    NP_local = -(-total_pages // bpp) * bpp
    dt = quest.kv_dtype
    mdt = quest.resolved_meta_dtype
    # Identity layout: local slot b owns local blocks [1+b*NB, 1+(b+1)*NB)
    # (block 0 = scratch). Rows beyond the per-shard reservation capacity
    # start out pointing at scratch.
    local_rows = (jnp.arange(B, dtype=jnp.int32) % Bl)[:, None]
    row_fits = (local_rows + 1) * NB + 1 <= NP_local // bpp
    btab = jnp.where(row_fits,
                     1 + local_rows * NB + jnp.arange(NB, dtype=jnp.int32),
                     0)
    NPB_local = NP_local // bpp
    return PagedKVCache(
        kv_pages=jnp.zeros((L, H, dp * NP_local, 2, page, D), dtype=dt),
        k_max=jnp.zeros((L, H, dp * NPB_local, bpp, D), dtype=mdt),
        k_min=jnp.zeros((L, H, dp * NPB_local, bpp, D), dtype=mdt),
        block_tab=btab,
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
        _finite(k_new).astype(layer.kv_pages.dtype),
        _finite(v_new).astype(layer.kv_pages.dtype),
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
    k_new = _finite(k_new)
    v_new = _finite(v_new)
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
# the donated step state; every append is a batched scatter directly
# into the shared physical buffer (one scatter per step, in-place under
# donation — NOT a Python-over-batch dus chain, which bloated program
# size O(B*L)), routed through the block table. The attention kernels
# read the same buffer via layer-indexed BlockSpecs.
# ---------------------------------------------------------------------------

def _phys_pages(block_tab: jnp.ndarray, bpp: int,
                logical: jnp.ndarray) -> jnp.ndarray:
    """Translate logical page ids -> physical, rows = leading axis.

    ``logical``: [B, ...] int32 per-slot logical page ids. Junk entries
    map through whatever block the table holds (>= scratch), never out
    of range, because ids stay < max_pages and the table is full-width.
    """
    B = block_tab.shape[0]
    bidx = jnp.reshape(jnp.arange(B), (B,) + (1,) * (logical.ndim - 1))
    blk = block_tab[jnp.broadcast_to(bidx, logical.shape), logical // bpp]
    return blk * bpp + logical % bpp


def append_decode_at(cache: PagedKVCache, layer: int, k_new: jnp.ndarray,
                     v_new: jnp.ndarray,
                     active: jnp.ndarray | None = None) -> PagedKVCache:
    """Write one token per sequence into layer ``layer`` (static).

    ``k_new, v_new``: [B, Hkv, D]; written at ``seq_lens[b]``. Returns a
    cache whose arrays alias-update in place under donation.

    ``active`` [B] bool: slots with ``active=False`` are routed to the
    scratch block (their table lookup is overridden with block 0) and
    their metadata fold is a read-back no-op — in a shared pool an
    inactive slot's "one past seq_len" position may not be backed by a
    block it owns, and a metadata max/min fold of a garbage key would
    inflate the page's criticality bound forever.
    """
    kv, kmax, kmin, btab = (cache.kv_pages, cache.k_max, cache.k_min,
                            cache.block_tab)
    page = kv.shape[-2]
    bpp = cache.block_pages
    B, H, D = k_new.shape
    kq = _finite(k_new).astype(kv.dtype)
    vq = _finite(v_new).astype(kv.dtype)
    pos = cache.seq_lens
    p_log = pos // page                                   # [B]
    e_idx = pos % page
    tab = btab if active is None else jnp.where(active[:, None], btab, 0)
    row = jnp.arange(B)
    blk = tab[row, p_log // bpp]                          # [B] phys block
    off = p_log % bpp                                     # [B] page in block
    p_phys = blk * bpp + off                              # [B]

    # Data token rows [B, Hkv, 2, D].
    tok = jnp.stack([kq, vq], axis=2)                     # [B, Hkv, 2, D]

    # Metadata (physical-page-keyed): per-slot dynamic_slice -> fold ->
    # per-slot dynamic_update_slice at the same (block, page) the data
    # write targets. Inactive rows read and write scratch-block rows (a
    # value-preserving no-op). Round-5 change: this was an advanced-
    # index gather (`kmax[layer][:, blk, off]`), which lowers to an
    # XLA gather along the minor axes — the known-pathological form on
    # TPU (exp/r4_chip/physpipe_probe.log: 350-400 us for a 139 KB
    # gather); the per-slot dynamic_slice chain is the DUS-dual of the
    # write chain below and costs B tiny slices.
    lz = jnp.int32(layer)
    z = jnp.int32(0)
    Hd = kmax.shape[1]
    Dd = kmax.shape[-1]

    def _read(arr, b):
        sl = jax.lax.dynamic_slice(arr, (lz, z, blk[b], off[b], z),
                                   (1, Hd, 1, 1, Dd))
        return sl[0, :, 0, 0]                        # [H, D]

    old_max = jnp.stack([_read(kmax, b) for b in range(B)])  # [B, H, D]
    old_min = jnp.stack([_read(kmin, b) for b in range(B)])
    old_max = old_max.astype(jnp.float32)
    old_min = old_min.astype(jnp.float32)
    kf = kq.astype(jnp.float32)                              # [B, H, D]
    first = (e_idx == 0)[:, None, None]
    new_max = jnp.where(first, kf, jnp.maximum(old_max, kf))
    new_min = jnp.where(first, kf, jnp.minimum(old_min, kf))
    if active is not None:
        act = active[:, None, None]
        new_max = jnp.where(act, new_max, old_max)
        new_min = jnp.where(act, new_min, old_min)

    # All writes as an UNROLLED chain of per-slot dynamic_update_slice
    # ops, NOT one advanced-index scatter: XLA DUS-ifies a single-row
    # scatter in place, but a B>=2 multi-row scatter survives as a true
    # scatter and copy-insertion materializes a FULL POOL COPY as an
    # HLO temp inside every decode step — measured 8.19 GB of temp
    # (and an OOM) for a B=2 128K config, ~5.5 ms/step of hidden copy
    # wherever it fit; AOT bisection: temp 0.6 MB without the append
    # vs 607 MB with the scatter. DUS is XLA's in-place-guaranteed
    # primitive; the chain writes only the touched rows. Program size
    # is O(B*L) HLO ops (3 per slot per layer) — fine for serving
    # batches (B <= 8); re-evaluate for much larger B.
    new_max = new_max.astype(kmax.dtype)
    new_min = new_min.astype(kmin.dtype)
    for b in range(B):
        kv = jax.lax.dynamic_update_slice(
            kv, tok[b][None, :, None, :, None, :],
            (lz, z, p_phys[b], z, e_idx[b], z))
        kmax = jax.lax.dynamic_update_slice(
            kmax, new_max[b][None, :, None, None, :],
            (lz, z, blk[b], off[b], z))
        kmin = jax.lax.dynamic_update_slice(
            kmin, new_min[b][None, :, None, None, :],
            (lz, z, blk[b], off[b], z))
    return PagedKVCache(kv, kmax, kmin, btab, cache.seq_lens)


def append_prefill_at(cache: PagedKVCache, layer: int, k_new: jnp.ndarray,
                      v_new: jnp.ndarray,
                      new_lens: jnp.ndarray | None = None) -> PagedKVCache:
    """Write ``T`` tokens per sequence into layer ``layer`` (static),
    starting at ``seq_lens[b]``; batched window read-modify-write of
    the touched pages only (see append_prefill for semantics): ONE
    gather + ONE scatter through the block table, not a per-slot
    Python loop (which bloated program size O(B*L)).

    Rows with ``new_lens[b] == 0`` are routed to the scratch block and
    skip metadata — a prefill tick over a mixed batch can never corrupt
    a busy slot, even one sitting near its logical pool end (the window
    clamp stays in logical space; its physical target is scratch).
    """
    kv, kmax, kmin, btab = (cache.kv_pages, cache.k_max, cache.k_min,
                            cache.block_tab)
    B, T, H, D = k_new.shape
    page = kv.shape[-2]
    P = cache.max_pages
    bpp = cache.block_pages
    k_new = _finite(k_new)
    v_new = _finite(v_new)
    if new_lens is None:
        new_lens = jnp.full((B,), T, dtype=jnp.int32)
    W = min(P, T // page + 2)
    active = new_lens > 0
    tab = jnp.where(active[:, None], btab, 0)
    row = jnp.arange(B)

    offset = cache.seq_lens                              # [B]
    p0 = jnp.minimum(offset // page, P - W)
    local = offset - p0 * page                           # in-window start
    wpages = p0[:, None] + jnp.arange(W)[None, :]        # [B, W] logical
    phys_win = _phys_pages(tab, bpp, wpages)             # [B, W]

    # Gather the touched windows: [B, W, Hkv, 2, page, D] (advanced
    # indices layer+phys_win are non-contiguous -> batch dims in front).
    win = jnp.swapaxes(kv[layer, :, phys_win], 1, 2)     # [B,Hkv,W,2,page,D]

    k_t = k_new.transpose(0, 2, 1, 3).astype(kv.dtype)   # [B, Hkv, T, D]
    v_t = v_new.transpose(0, 2, 1, 3).astype(kv.dtype)

    def insert(w, kt, vt, loc):
        # w [Hkv, W, 2, page, D]; token-flattened K/V views of the
        # window (free reshapes after peeling the K/V axis).
        wk = w[:, :, K].reshape(H, W * page, D)
        wv = w[:, :, V].reshape(H, W * page, D)
        wk = jax.lax.dynamic_update_slice(wk, kt, (0, loc, 0))
        wv = jax.lax.dynamic_update_slice(wv, vt, (0, loc, 0))
        return jnp.stack([wk.reshape(H, W, page, D),
                          wv.reshape(H, W, page, D)], axis=2)

    win = jax.vmap(insert)(win, k_t, v_t, local)
    kv = kv.at[layer, :, phys_win].set(jnp.swapaxes(win, 1, 2))

    # Recompute min/max over the touched page windows, keyed by the
    # PHYSICAL (block, page) the data write targeted (inactive rows'
    # windows sit in scratch and their fold is a read-back no-op).
    new_len = offset + new_lens
    wkf = win[:, :, :, K].astype(jnp.float32)            # [B,Hkv,W,page,D]
    tok_ids = wpages[:, :, None] * page + jnp.arange(page)[None, None, :]
    valid = (tok_ids < new_len[:, None, None])[:, None, :, :, None]
    big = jnp.float32(3.0e38)
    wmax = jnp.max(jnp.where(valid, wkf, -big), axis=3)  # [B, Hkv, W, D]
    wmin = jnp.min(jnp.where(valid, wkf, big), axis=3)
    any_valid = jnp.any(valid, axis=3)                   # [B, 1, W, 1]
    wblk = tab[row[:, None], wpages // bpp]              # [B, W] phys block
    woff = wpages % bpp                                  # [B, W]
    # Gather form [:, wblk, woff] -> [Hkv, B, W, D] (adjacent advanced
    # indices); the scatter at[layer, :, wblk, woff] puts batch dims in
    # FRONT (separated by the slice) -> set values are [B, W, Hkv, D].
    old_max = jnp.swapaxes(kmax[layer][:, wblk, woff], 0, 1)  # [B,Hkv,W,D]
    old_min = jnp.swapaxes(kmin[layer][:, wblk, woff], 0, 1)
    write = jnp.logical_and(any_valid, active[:, None, None, None])
    wmax = jnp.where(write, wmax, old_max.astype(jnp.float32))
    wmin = jnp.where(write, wmin, old_min.astype(jnp.float32))
    kmax = kmax.at[layer, :, wblk, woff].set(
        jnp.swapaxes(wmax.astype(kmax.dtype), 1, 2))
    kmin = kmin.at[layer, :, wblk, woff].set(
        jnp.swapaxes(wmin.astype(kmin.dtype), 1, 2))
    return PagedKVCache(kv, kmax, kmin, btab, cache.seq_lens)


# (Round 3 had a `recompute_meta_rows` here: metadata was slot-dense,
# so prefix-cache admission had to rebuild a borrower's metadata from
# the shared KV data — a measured net slowdown (0.38x). Physical-page
# keying makes borrowed metadata travel with the block; the recompute
# machinery, its sharded wrapper (parallel/tp.py:make_recompute_fn),
# and the per-admission dispatch are all deleted.)
