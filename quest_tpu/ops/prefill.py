"""Dense causal paged flash-prefill attention.

Reference: `BatchPrefillWithPagedKVCacheKernel`
(`/root/reference/kernels/include/prefill/prefill.cuh:688-870`, 1.1 kLoC
of hand-scheduled MMA + permuted smem). On TPU this collapses to a
standard blocked flash-attention Pallas kernel: pages of one sequence
are slot-contiguous (kv/paged_kv.py) so the packed cache is read as a
sequential stream of ``[2, page, D]`` page blocks with ordinary
pipelined BlockSpecs; the MXU and the Mosaic pipeliner replace the
reference's wmma tiles and cp.async choreography.

Prefill KV traffic scales as (total q rows) / (rows per stream): each
q block streams the cache up to its causal limit. Two levers keep it
compute- rather than bandwidth-bound:
  * large ``block_q`` (default 1024 tokens; causal-skip waste stays
    ~block_q/2 of one stream);
  * **GQA fusion** — the G query heads of a KV-head group ride in ONE
    q block ([G·block_q, D] fused rows), so the group streams the KV
    once instead of G times, with no extra causal waste (all G heads
    share the same token range; the reference templates a group_size
    for the same reason, `prefill.cuh:688`).

Supports chunked prefill: queries sit at absolute positions
``offset + i`` (``offset`` = tokens already cached), enabling the
prefill-context-then-decode-question pattern the reference evals use
(`/root/reference/evaluation/passkey/passkey.py:68-97`).
Causal block skipping is done by clamping the KV block index map (runs
of identical indices skip the DMA) plus a compute predicate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quest_tpu.ops.pallas_utils import (MASK_VALUE, round_up,
                                        upcast_fp8, use_interpret)


def _kernel_shared(block_q: int, G: int, bpk: int, page: int, meta_ref,
                   btab_ref, q_ref, kv_ref, o_ref, m_scr, l_scr, acc_scr):
    # Shared-pool mode: the block table is consumed by the index map
    # only; the compute body is identical.
    _kernel(block_q, G, bpk, page, meta_ref, q_ref, kv_ref, o_ref,
            m_scr, l_scr, acc_scr)


def _kernel(block_q: int, G: int, bpk: int, page: int, meta_ref, q_ref,
            kv_ref, o_ref, m_scr, l_scr, acc_scr):
    b = pl.program_id(0)
    i = pl.program_id(2)
    j = pl.program_id(3)
    nb_k = pl.num_programs(3)
    block_k = bpk * page
    R = G * block_q                    # fused rows: G heads x block_q
    offset = meta_ref[b, 0]
    kv_len = meta_ref[b, 1]

    # KV blocks that matter for this q block: causal upper bound and
    # sequence-length bound (same for every head of the group).
    max_q_pos = offset + (i + 1) * block_q - 1
    hi = jnp.minimum(pl.cdiv(max_q_pos + 1, block_k),
                     pl.cdiv(kv_len, block_k))

    @pl.when(j == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # Interior KV blocks — strictly below the causal diagonal and fully
    # inside the sequence — need no masking; skipping the mask build and
    # the two `where` passes removes ~half the VPU work per block, which
    # is what bounds prefill once KV streaming is amortized (the mask
    # only matters on the ~1 diagonal and ~1 tail block per q block).
    def body(masked: bool):
        q = q_ref[0, 0].reshape(R, -1)           # [G*block_q, D]
        kv = kv_ref[...].reshape(bpk, 2, page, q.shape[-1])
        k = kv[:, 0].reshape(block_k, -1)
        v = kv[:, 1].reshape(block_k, -1)
        if k.dtype != q.dtype:                   # fp8 pool: integer-ops upcast
            k = upcast_fp8(k, q.dtype)
            v = upcast_fp8(v, q.dtype)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if masked:
            row = jax.lax.broadcasted_iota(jnp.int32, (R, block_k), 0)
            q_pos = offset + i * block_q + row % block_q  # head-invariant
            k_pos = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (R, block_k), 1)
            mask = jnp.logical_and(k_pos <= q_pos, k_pos < kv_len)
            s = jnp.where(mask, s, MASK_VALUE)
        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, :1])
        if masked:
            p = jnp.where(mask, p, 0.0)
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_new
        pv = jax.lax.dot_general(p.astype(v.dtype), v,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    q_min = offset + i * block_q
    interior = jnp.logical_and((j + 1) * block_k - 1 <= q_min,
                               (j + 1) * block_k <= kv_len)

    @pl.when(jnp.logical_and(j < hi, interior))
    def _():
        body(masked=False)

    @pl.when(jnp.logical_and(j < hi, jnp.logical_not(interior)))
    def _():
        body(masked=True)

    @pl.when(j == nb_k - 1)
    def _():
        # Padded query rows (beyond the real T) attend to at least the
        # diagonal block, so l > 0 everywhere; junk rows are sliced off
        # by the caller.
        o = acc_scr[...] / l_scr[:, :1]
        o_ref[0, 0] = o.reshape(G, block_q, -1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_q",
                                             "block_k", "interpret",
                                             "layer", "block_pages",
                                             "max_pages"))
def prefill_attention(q, kv_pages, q_offsets, kv_lens, *,
                      sm_scale: float, block_q: int = 1024,
                      block_k: int = 1024, interpret: bool | None = None,
                      layer: int | None = None,
                      block_tab=None, block_pages: int | None = None,
                      max_pages: int | None = None):
    """Causal attention of T fresh queries over the paged cache.

    q: [B, T, Hq, D] (rope already applied); kv_pages:
    [B, Hkv, P, 2, page, D] packed pool (new tokens already appended) —
    or the whole-model SHARED pool [L, Hkv, NP, 2, page, D] with static
    ``layer`` plus ``block_tab``/``block_pages``/``max_pages``
    (kv/paged_kv.py; the slot's logical KV stream is reconstructed by
    one table lookup per allocation block in the index map);
    q_offsets: [B] tokens cached before this chunk;
    kv_lens: [B] = q_offsets + real new length. Returns [B, T, Hq, D] f32.
    """
    if interpret is None:
        interpret = use_interpret()
    B, T, Hq, D = q.shape
    shared = layer is not None
    if shared:
        assert block_tab is not None and block_pages is not None
        _, Hkv, _, _, page, _ = kv_pages.shape
        P = max_pages if max_pages is not None else (
            block_tab.shape[1] * block_pages)
    else:
        _, Hkv, P, _, page, _ = kv_pages.shape
    G = Hq // Hkv

    if shared:
        # KV stream granularity = allocation granularity, so each table
        # entry is directly a stream-block index.
        bpk = min(block_pages, P)
        assert P % bpk == 0
    else:
        bpk = max(1, min(block_k // page, P))
    block_k = bpk * page
    # Keep the fused row count VMEM-friendly: the [R, block_k] f32
    # score/prob temporaries must fit the 16 MB scoped-vmem limit, so
    # cap R*block_k at 1M elements (8 MB of temporaries; at the tuned
    # block_k=1024 this is the round-3 R<=1024 cap). block_k is not
    # always 1024: shared mode pins it to block_pages*page, which is
    # 2048 tokens at page 32 — the uncorrected cap OOM'd scoped vmem
    # at 20.7M (exp/r4_chip/e2e8_128k_serving.log, first attempt).
    # The cap must round DOWN to the 16-row sublane tile (1024//G is
    # not a multiple of 16 for e.g. G=3) and hold for any G.
    cap = max(((1024 * 1024 // block_k) // G) // 16 * 16, 16)
    block_q = min(block_q, round_up(T, 16), cap)

    qt = (q.astype(jnp.float32) * sm_scale).transpose(0, 2, 1, 3)
    Tp = round_up(T, block_q)
    qt = jnp.pad(qt, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    # fp8 pools keep the QUERY at bf16; k/v upcast post-load in-kernel.
    qt = qt.astype(kv_pages.dtype
                   if jnp.dtype(kv_pages.dtype).itemsize >= 2
                   else jnp.bfloat16)        # [B, Hq, Tp, D]
    qt = qt.reshape(B, Hkv, G, Tp, D)
    if not shared and P % bpk != 0:
        pad = round_up(P, bpk) - P
        kv_pages = jnp.pad(
            kv_pages,
            ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
        P += pad
    nb_q = Tp // block_q
    nb_k = P // bpk

    meta = jnp.stack([q_offsets.astype(jnp.int32),
                      kv_lens.astype(jnp.int32)], axis=1)  # [B, 2]

    def _clamp_j(b, i, j, meta_ref):
        offset = meta_ref[b, 0]
        kv_len = meta_ref[b, 1]
        max_q_pos = offset + (i + 1) * block_q - 1
        hi = jnp.minimum(pl.cdiv(max_q_pos + 1, block_k),
                         pl.cdiv(kv_len, block_k))
        return jnp.minimum(j, jnp.maximum(hi - 1, 0))

    if shared:
        def kv_index(b, h, i, j, meta_ref, btab_ref):
            jj = _clamp_j(b, i, j, meta_ref)
            return (layer, h, btab_ref[b, jj], 0, 0, 0)
        kv_block = (1, 1, bpk, 2, page, D)
        prefetch = (meta, block_tab.astype(jnp.int32))
    else:
        def kv_index(b, h, i, j, meta_ref):
            jj = _clamp_j(b, i, j, meta_ref)
            return (b, h, jj, 0, 0, 0)
        kv_block = (1, 1, bpk, 2, page, D)
        prefetch = (meta,)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(B, Hkv, nb_q, nb_k),
        in_specs=[
            pl.BlockSpec((1, 1, G, block_q, D),
                         lambda b, h, i, j, *_: (b, h, 0, i, 0)),
            pl.BlockSpec(kv_block, kv_index),
        ],
        out_specs=pl.BlockSpec((1, 1, G, block_q, D),
                               lambda b, h, i, j, *_: (b, h, 0, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((G * block_q, 128), jnp.float32),
            pltpu.VMEM((G * block_q, 128), jnp.float32),
            pltpu.VMEM((G * block_q, D), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_kernel_shared if shared else _kernel,
                          block_q, G, bpk, page),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, Tp, D), jnp.float32),
        interpret=interpret,
    )(*prefetch, qt, kv_pages)

    out = out.reshape(B, Hq, Tp, D)
    return out[:, :, :T].transpose(0, 2, 1, 3)
