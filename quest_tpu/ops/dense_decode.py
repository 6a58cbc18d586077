"""Dense paged flash-decode attention.

Used for (a) the first ``skip_layers`` layers which always run dense
(reference: `/root/reference/quest/models/llama.py:537-538,427-439`) and
(b) as the baseline the sparse kernel is benchmarked against (the
reference benchmarks against FlashInfer dense decode,
`/root/reference/kernels/src/bench/bench_batch_decode.cu`).

Because a single sequence's pages are slot-contiguous (see kv/paged_kv.py)
the packed pool IS a sequential stream of ``[2, page, D]`` page blocks,
so this is a standard blocked flash-decode over page-blocks: the KV
block index map is clamped at the last valid block (consecutive
identical block indices make the Pallas pipeline skip the redundant
DMA), and online-softmax state persists in VMEM scratch across the
sequential KV grid dimension. Each pipelined block carries K and V of
``bp`` pages in one stream (block_t = bp*page tokens; 2048 tokens ≈
691 GB/s measured on v5e, near HBM speed of light).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quest_tpu.ops.pallas_utils import (MASK_VALUE, round_up,
                                        upcast_fp8, use_interpret)


def _kernel_shared(bp: int, page: int, Gs: int, seq_ref, btab_ref,
                   q_ref, kv_ref, o_ref, m_scr, l_scr, acc_scr):
    # Shared-pool mode: the block table is consumed by the index map
    # only; the compute body is identical.
    _kernel(bp, page, Gs, seq_ref, q_ref, kv_ref, o_ref, m_scr, l_scr,
            acc_scr)


def _kernel(bp: int, page: int, Gs: int, seq_ref, q_ref, kv_ref, o_ref,
            m_scr, l_scr, acc_scr):
    b = pl.program_id(0)
    j = pl.program_id(2)
    nb = pl.num_programs(2)
    block_t = bp * page
    seq_len = seq_ref[b]
    nv_blocks = pl.cdiv(seq_len, block_t)

    @pl.when(j == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(j < nv_blocks)
    def _():
        q = q_ref[0, 0]                     # [Gp, D]
        kv = kv_ref[...].reshape(bp, 2, page, q.shape[-1])
        k = kv[:, 0].reshape(block_t, -1)
        v = kv[:, 1].reshape(block_t, -1)
        if k.dtype != q.dtype:              # fp8 pool: integer-ops upcast
            k = upcast_fp8(k, q.dtype)
            v = upcast_fp8(v, q.dtype)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s[:Gs]   # f32-tile-aligned row slice: VPU work on Gs rows
        tok = j * block_t + jax.lax.broadcasted_iota(jnp.int32,
                                                     (1, block_t), 1)
        mask = tok < seq_len
        s = jnp.where(mask, s, MASK_VALUE)
        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.where(mask, jnp.exp(s - m_new[:, :1]), 0.0)
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_new
        pv = jax.lax.dot_general(p.astype(v.dtype), v,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    @pl.when(j == nb - 1)
    def _():
        o_ref[0, 0, :Gs] = (acc_scr[...] / l_scr[:, :1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_t",
                                             "interpret", "layer",
                                             "block_pages", "max_pages"))
def dense_decode_attention(q, kv_pages, seq_lens, *, sm_scale: float,
                           block_t: int = 2048,
                           interpret: bool | None = None,
                           layer: int | None = None,
                           block_tab=None,
                           block_pages: int | None = None,
                           max_pages: int | None = None):
    """Decode attention over the full (valid-masked) cache.

    q: [B, Hq, D]; kv_pages: [B, Hkv, P, 2, page, D] packed pool — or
    the whole-model SHARED pool [L, Hkv, NP, 2, page, D] with a static
    ``layer`` index plus ``block_tab [B, NB]``/``block_pages``/
    ``max_pages`` (kv/paged_kv.py): the per-slot logical stream is
    reconstructed by the BlockSpec index map looking up one table entry
    per allocation block — the stream granularity equals the allocation
    granularity, so runs of contiguous physical blocks pipeline exactly
    like the slot-dense layout; seq_lens: [B]. Returns [B, Hq, D] f32.
    """
    if interpret is None:
        interpret = use_interpret()
    B, Hq, D = q.shape
    shared = layer is not None
    if shared:
        assert block_tab is not None and block_pages is not None
        _, Hkv, _, _, page, _ = kv_pages.shape
        P = max_pages if max_pages is not None else (
            block_tab.shape[1] * block_pages)
        # Stream one allocation block per grid step: physical blocks
        # are bpp-aligned so each table entry IS a block index.
        bp = block_pages
    else:
        _, Hkv, P, _, page, _ = kv_pages.shape
        bp = max(1, min(block_t // page, P))
        if P % bp != 0:
            pad = round_up(P, bp) - P
            kv_pages = jnp.pad(
                kv_pages,
                ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
            P += pad
    G = Hq // Hkv
    nb = P // bp

    Gp = round_up(G, 16)
    # VPU/softmax work runs on an f32-tile-aligned Gs-row slice of the
    # [Gp, cols] score matrix (same change as sparse_decode round 5:
    # at G<=8 this halves every elementwise op; measured 0.72 ->
    # ~0.45 ms/layer at 128K GQA-4, exp/r5_chip/b1_floor*.json).
    Gs = min(Gp, round_up(G, 8))
    qg = (q.astype(jnp.float32) * sm_scale).reshape(B, Hkv, G, D)
    qg = jnp.pad(qg, ((0, 0), (0, 0), (0, Gp - G), (0, 0)))
    # fp8 pools keep the QUERY at bf16; k/v upcast post-load in-kernel.
    qg = qg.astype(kv_pages.dtype
                   if jnp.dtype(kv_pages.dtype).itemsize >= 2
                   else jnp.bfloat16)

    if shared:
        def kv_index(b, h, j, seq_ref, btab_ref):
            last = jnp.maximum(pl.cdiv(seq_ref[b], bp * page) - 1, 0)
            jj = jnp.minimum(j, last)
            return (layer, h, btab_ref[b, jj], 0, 0, 0)
        kv_block = (1, 1, bp, 2, page, D)
        prefetch = (seq_lens.astype(jnp.int32),
                    block_tab.astype(jnp.int32))
    else:
        def kv_index(b, h, j, seq_ref):
            # Clamp at the last valid block: runs of identical indices
            # make the pipeline skip redundant DMAs of the invalid tail.
            last = jnp.maximum(pl.cdiv(seq_ref[b], bp * page) - 1, 0)
            jj = jnp.minimum(j, last)
            return (b, h, jj, 0, 0, 0)
        kv_block = (1, 1, bp, 2, page, D)
        prefetch = (seq_lens.astype(jnp.int32),)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(B, Hkv, nb),
        in_specs=[
            pl.BlockSpec((1, 1, Gp, D), lambda b, h, j, *_: (b, h, 0, 0)),
            pl.BlockSpec(kv_block, kv_index),
        ],
        out_specs=pl.BlockSpec((1, 1, Gp, D), lambda b, h, j, *_: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Gs, 128), jnp.float32),
            pltpu.VMEM((Gs, 128), jnp.float32),
            pltpu.VMEM((Gs, D), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_kernel_shared if shared else _kernel, bp,
                          page, Gs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Gp, D), jnp.float32),
        interpret=interpret,
    )(*prefetch, qg, kv_pages)

    return out[:, :, :G, :].reshape(B, Hq, D)
