"""Sparse paged flash-decode attention — the signature Quest kernel.

Reference: `BatchDecodeWithPagedKVCacheKernel`
(`/root/reference/kernels/include/decode/decode_attn.cuh:441-646`): per
head, gather only the top-K selected KV pages and run online-softmax
decode attention over them. The reference needs a host-side planner
(`decode_handler.cuh:39-175`) to split work across SMs; on TPU the grid
is statically scheduled and partial-softmax state lives in VMEM scratch
that persists across sequential grid steps, so no planner exists.

Design (TPU-first). Scalar-core DMA descriptor issue is the measured
bottleneck of this gather (~20 ns/descriptor ≈ the whole kernel's
runtime at page-16 granularity), so the kernel is built around
minimizing descriptor count and bookkeeping:
  * Page indices arrive via **scalar prefetch**
    (`PrefetchScalarGridSpec`) so addresses are known before compute.
  * The packed pool layout (kv/paged_kv.py) keeps each page's K and V
    adjacent as one ``[2, page, D]`` 8 KB block — ONE descriptor per
    page fetches both (the reference streams K and V separately via
    cp.async, `decode_attn.cuh:245-401`).
  * ``ppb`` pages per grid step land in a double-buffered VMEM scratch;
    all copies of a block signal one shared semaphore and completion is
    a single whole-buffer wait (DMA semaphores count bytes). The gather
    is HBM-random-access *latency* bound, so depth matters: measured on
    v5e at 32K/2048 (MHA), ppb 16/32/64 -> 124/119/99 us (up to 128
    outstanding 8 KB reads at ppb=64).
  * Selection is per KV head (``indices [B, Hkv, S]``); the G query
    heads of a GQA group attend to the same gathered pages, giving an
    ``[G, page·ppb]`` MXU matmul per step and G-fold bandwidth reuse.
    For MHA (G=1) this is exactly the reference's per-head selection.
  * The last page is *part of the selection* (slot 0, see ops/topk.py),
    not force-appended; its partial fill is masked by ``last_len``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quest_tpu.ops.pallas_utils import MASK_VALUE, round_up, use_interpret


def _kernel(ppb: int, page: int, layer: int | None, meta_ref, idx_ref,
            q_ref, kv_hbm, o_ref,
            kv_buf, sems, m_scr, l_scr, acc_scr):
    b = pl.program_id(0)
    h = pl.program_id(1)
    j = pl.program_id(2)
    nb = pl.num_programs(2)
    # With a static layer index the kernel reads the whole-model cache
    # buffer directly — no per-layer slice materialization outside.
    kv_hbm = kv_hbm if layer is None else kv_hbm.at[layer]
    num_valid = meta_ref[b, 0]
    last_page = meta_ref[b, 1]
    last_len = meta_ref[b, 2]
    nv_blocks = pl.cdiv(num_valid, ppb)

    def start_copies(blk, slot):
        # One descriptor per page ([2, page, D] = K and V together);
        # all signal the same per-slot semaphore.
        for i in range(ppb):
            pid = idx_ref[b, h, blk * ppb + i]
            pltpu.make_async_copy(
                kv_hbm.at[b, h, pid],
                kv_buf.at[slot, i],
                sems.at[slot],
            ).start()

    def wait_copies(slot):
        # DMA semaphores count BYTES (jax pallas mosaic lowering:
        # `wait_dma2` decrements by the dst ref's byte size), so one
        # wait on the whole slot buffer absorbs all ppb completions.
        pltpu.make_async_copy(kv_buf.at[slot], kv_buf.at[slot],
                              sems.at[slot]).wait()

    @pl.when(j == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # Guard on num_valid > 0: issuing copies that are never waited on
    # (nv_blocks == 0) would leak semaphore signals into the next grid
    # step's bulk wait. Output is undefined for empty sequences.
    @pl.when(jnp.logical_and(j == 0, num_valid > 0))
    def _():
        start_copies(0, 0)

    @pl.when(jnp.logical_and(j + 1 < nb, j + 1 < nv_blocks))
    def _():
        start_copies(j + 1, (j + 1) % 2)

    @pl.when(j < nv_blocks)
    def _():
        slot = j % 2
        wait_copies(slot)
        q = q_ref[0, 0]                          # [Gp, D]
        kv = kv_buf[slot]                        # [ppb, 2, page, D]
        k = kv[:, 0].reshape(ppb * page, -1)
        v = kv[:, 1].reshape(ppb * page, -1)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)   # [Gp, ppb*page]

        # Column validity: slot must be < num_valid; within the last page
        # only the first last_len entries are real.
        cols = []
        for i in range(ppb):
            slot_idx = j * ppb + i
            pid = idx_ref[b, h, slot_idx]
            entry = jax.lax.broadcasted_iota(jnp.int32, (1, page), 1)
            ok = jnp.logical_and(
                slot_idx < num_valid,
                jnp.logical_or(pid != last_page, entry < last_len))
            # Mosaic cannot concatenate i1 vectors; carry i32 and compare.
            cols.append(ok.astype(jnp.int32))
        mask = jnp.concatenate(cols, axis=1) != 0  # [1, ppb*page]

        s = jnp.where(mask, s, MASK_VALUE)
        m_prev = m_scr[...]                       # [Gp, 128] replicated
        l_prev = l_scr[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)  # [Gp, 1]
        m_new = jnp.maximum(m_prev, m_cur)         # [Gp, 128]
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.where(mask, jnp.exp(s - m_new[:, :1]), 0.0)  # [Gp, ppb*page]
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_new
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # [Gp, D]
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    @pl.when(j == nb - 1)
    def _():
        o_ref[0, 0] = (acc_scr[...] / l_scr[:, :1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "pages_per_block",
                                             "interpret", "layer"))
def sparse_decode_attention(q, kv_pages, indices, num_valid,
                            seq_lens, *, sm_scale: float,
                            pages_per_block: int = 64,
                            interpret: bool | None = None,
                            layer: int | None = None):
    """Decode attention over selected pages.

    Args:
      q: [B, Hq, D] query for the current token (un-scaled).
      kv_pages: [B, Hkv, P, 2, page, D] packed paged cache (0=K, 1=V) —
        or the whole-model pool [L, B, Hkv, P, 2, page, D] with a static
        ``layer`` index (zero-copy read of the persistent buffer).
      indices: [B, Hkv, S] int32 selected page ids (slots >= num_valid junk).
      num_valid: [B] int32 count of real slots.
      seq_lens: [B] int32 sequence lengths incl. the current token.
      sm_scale: softmax scale (1/sqrt(D)).

    Returns: [B, Hq, D] f32 attention output.
    """
    if interpret is None:
        interpret = use_interpret()
    B, Hq, D = q.shape
    shp = kv_pages.shape if layer is None else kv_pages.shape[1:]
    _, Hkv, P, _, page, _ = shp
    S = indices.shape[-1]
    G = Hq // Hkv

    ppb = min(pages_per_block, S)
    if S % ppb != 0:  # pad slot axis; padded slots are >= num_valid
        S_pad = round_up(S, ppb)
        indices = jnp.pad(indices, ((0, 0), (0, 0), (0, S_pad - S)))
        S = S_pad
    nb = S // ppb

    # Pad the GQA group axis to the bf16 sublane tile.
    Gp = round_up(G, 16)
    qg = (q.astype(jnp.float32) * sm_scale).reshape(B, Hkv, G, D)
    qg = jnp.pad(qg, ((0, 0), (0, 0), (0, Gp - G), (0, 0)))
    qg = qg.astype(kv_pages.dtype)

    last_page = (seq_lens - 1) // page
    last_len = (seq_lens - 1) % page + 1
    meta = jnp.stack([num_valid.astype(jnp.int32),
                      last_page.astype(jnp.int32),
                      last_len.astype(jnp.int32)], axis=1)  # [B, 3]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hkv, nb),
        in_specs=[
            pl.BlockSpec((1, 1, Gp, D), lambda b, h, j, *_: (b, h, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, Gp, D), lambda b, h, j, *_: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, ppb, 2, page, D), kv_pages.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((Gp, 128), jnp.float32),
            pltpu.VMEM((Gp, 128), jnp.float32),
            pltpu.VMEM((Gp, D), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_kernel, ppb, page, layer),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Gp, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(meta, indices.astype(jnp.int32), qg, kv_pages)

    return out[:, :, :G, :].reshape(B, Hq, D)
