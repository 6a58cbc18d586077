"""Sparse paged flash-decode attention — the signature Quest kernel.

Reference: `BatchDecodeWithPagedKVCacheKernel`
(`/root/reference/kernels/include/decode/decode_attn.cuh:441-646`): per
head, gather only the top-K selected KV pages and run online-softmax
decode attention over them. The reference needs a host-side planner
(`decode_handler.cuh:39-175`) to split work across SMs; on TPU the grid
is statically scheduled and partial-softmax state lives in VMEM scratch
that persists across sequential grid steps, so no planner exists.

Design (TPU-first). The gather is HBM *DMA-throughput* bound: an A/B
with identical bytes showed 4096 per-page descriptors cost only ~6 us
more than 64 contiguous block descriptors (~1.5 ns/descriptor
amortized), and even fully-contiguous manual 2-slot double buffering
tops out near ~490 GB/s — so the design keeps the DMA pipeline full
across the whole grid and keeps scalar/VPU bookkeeping off the
critical path:
  * Page indices arrive via **scalar prefetch**
    (`PrefetchScalarGridSpec`) so addresses are known before compute.
  * The packed pool layout (kv/paged_kv.py) keeps each page's K and V
    adjacent as one ``[2, page, D]`` 8 KB block — ONE descriptor per
    page fetches both (the reference streams K and V separately via
    cp.async, `decode_attn.cuh:245-401`).
  * ``ppb`` pages per block land in an ``num_slots``-deep VMEM slot
    ring; all copies of a block signal one shared semaphore and
    completion is a single whole-buffer wait (DMA semaphores count
    bytes). Measured at 32K/2048 MHA on v5e: large blocks beat deep
    rings of small ones ((ppb,slots) 64,2→113 us; 32,4→139; 16,8→181;
    128,2→82; 128,3→75 us ≈ 450 GB/s), so the default is one
    whole-selection block per head, triple-buffered.
  * The grid is **flattened over (batch, head, block)** and the
    prefetch of block t+1 crosses head (and batch) boundaries, so the
    DMA pipeline never drains between heads — a per-head grid axis
    would cold-start the gather Hkv times per call.
  * Column validity collapses to two vector compares: junk slots are
    by contract a suffix (``col >= num_valid*page``), and the one
    partially-filled page's slot position is found OUTSIDE the kernel
    and passed via scalar prefetch — no ppb-iteration scalar
    bookkeeping loop inside the kernel.
  * Selection is per KV head (``indices [B, Hkv, S]``); the G query
    heads of a GQA group attend to the same gathered pages, giving an
    ``[G, page·ppb]`` MXU matmul per block and G-fold bandwidth reuse.
    For MHA (G=1) this is exactly the reference's per-head selection.
  * The last page is *part of the selection* (see ops/topk.py), not
    force-appended; its partial fill is masked by ``last_len``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quest_tpu.ops.pallas_utils import (MASK_VALUE, round_up,
                                        upcast_fp8, use_interpret)


def _kernel(ppb: int, page: int, layer: int | None, nb: int, nslot: int,
            kvdiv: int, nsem: int, Gs: int, bpp_tab: int, meta_ref,
            idx_ref, lastslot_ref, tab_ref, q_ref, kv_hbm, o_ref,
            kv_buf, sems, m_scr, l_scr, acc_scr):
    pps = ppb // nsem             # pages per semaphore stripe
    b = pl.program_id(0)
    t = pl.program_id(1)          # flattened (head, block) step
    B = pl.num_programs(0)
    T = pl.num_programs(1)        # = Hkv * nb
    h = t // nb
    j = t % nb
    # With a static layer index the kernel reads the whole-model SHARED
    # pool [L, Hkv, NP, ...] directly (no batch axis — slots share
    # physical pages; ids arriving in idx_ref are already PHYSICAL).
    shared = layer is not None
    kv_hbm = kv_hbm if layer is None else kv_hbm.at[layer]

    def start_copies(ff):
        # Issue the gather for global step ``ff`` into slot ff % nslot.
        # One descriptor per page ([2, page, D] = K and V together);
        # all signal the same per-slot semaphore.
        bb = ff // T
        tt = ff % T
        hh = tt // nb
        blk = tt % nb
        slot = ff % nslot
        for i in range(ppb):
            pid = idx_ref[bb, hh, blk * ppb + i]
            if bpp_tab:
                # Logical -> physical through the block table ON the
                # scalar core (round 5): two scalar ops per descriptor
                # replace a whole XLA gather fusion per decode step.
                pid = (tab_ref[bb, pid // bpp_tab] * bpp_tab
                       + pid % bpp_tab)
            # Per-q-head selection mode (kvdiv = G > 1): grid head hh is
            # a QUERY head; its pages live under physical KV head
            # hh // kvdiv (docs/gqa_selection.md).
            src = (kv_hbm.at[hh // kvdiv, pid] if shared
                   else kv_hbm.at[bb, hh // kvdiv, pid])
            pltpu.make_async_copy(
                src,
                kv_buf.at[slot, i],
                # Contiguous page ranges stripe across nsem semaphores
                # (probes whether distinct semaphores reach distinct
                # DMA queues; nsem=1 = one shared semaphore).
                sems.at[slot, i // pps],
            ).start()

    def start_if_valid(ff):
        # Skip blocks past a row's valid count: copies that are never
        # waited on would leak semaphore signals into a later wait.
        bb = ff // T
        jj = (ff % T) % nb

        @pl.when(jnp.logical_and(bb < B,
                                 jj < pl.cdiv(meta_ref[bb % B, 0], ppb)))
        def _():
            start_copies(ff)

    def wait_copies(slot):
        # DMA semaphores count BYTES (jax pallas mosaic lowering:
        # `wait_dma2` decrements by the dst ref's byte size), so one
        # wait per stripe absorbs that stripe's page completions.
        for s in range(nsem):
            pltpu.make_async_copy(kv_buf.at[slot, pl.ds(s * pps, pps)],
                                  kv_buf.at[slot, pl.ds(s * pps, pps)],
                                  sems.at[slot, s]).wait()

    num_valid = meta_ref[b, 0]
    nv_blocks = pl.cdiv(num_valid, ppb)
    flat = b * T + t

    # Prologue at the GLOBAL first step only: fill the first nslot-1
    # slots. Later blocks — including other batch rows' first blocks —
    # arrive via the steady-state prefetch below; issuing any block
    # twice would double-signal its slot semaphore and let a later wait
    # return before its data landed.
    @pl.when(flat == 0)
    def _():
        for d in range(nslot - 1):
            start_if_valid(d)

    # Steady-state: keep nslot-1 blocks in flight; the prefetch crosses
    # head and batch boundaries so the DMA pipeline never drains.
    start_if_valid(flat + nslot - 1)

    @pl.when(j == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(j < nv_blocks)
    def _():
        slot = flat % nslot
        wait_copies(slot)
        q = q_ref[0, 0]                          # [Gp, D]
        kv = kv_buf[slot]                        # [ppb, 2, page, D]
        k = kv[:, 0].reshape(ppb * page, -1)
        v = kv[:, 1].reshape(ppb * page, -1)
        if k.dtype != q.dtype:   # fp8 pool: integer-ops upcast (no
            k = upcast_fp8(k, q.dtype)   # native Mosaic fp8 convert —
            v = upcast_fp8(v, q.dtype)   # astype measured ~5x slower)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)   # [Gp, ppb*page]
        s = s[:Gs]      # f32-tile-aligned row slice: VPU work on Gs rows

        # Column validity as two scalar-range compares (see module
        # docstring): junk slots are a suffix of the slot axis, and the
        # partially-filled page occupies slot ``lastslot`` (-1 if the
        # current page is not in this head's selection).
        last_len = meta_ref[b, 2]
        ls = lastslot_ref[b, h]
        base = j * ppb * page
        ci = jax.lax.broadcasted_iota(jnp.int32, (1, ppb * page), 1)
        mask = ci < num_valid * page - base
        lo = ls * page + last_len - base
        hi = (ls + 1) * page - base
        mask = jnp.logical_and(
            mask, jnp.logical_not(jnp.logical_and(ci >= lo, ci < hi)))
        s = jnp.where(mask, s, MASK_VALUE)
        m_prev = m_scr[...]                       # [Gs, 128] replicated
        l_prev = l_scr[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)  # [Gs, 1]
        m_new = jnp.maximum(m_prev, m_cur)         # [Gs, 128]
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.where(mask, jnp.exp(s - m_new[:, :1]), 0.0)
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_new
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # [Gs, D]
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    @pl.when(j == nb - 1)
    def _():
        o_ref[0, 0, :Gs] = (acc_scr[...] / l_scr[:, :1]).astype(o_ref.dtype)


def _kernel_1blk(S: int, page: int, layer: int | None, nslot: int,
                 kvdiv: int, hb: int, Gs: int, bpp_tab: int, meta_ref,
                 idx_ref, lastslot_ref, tab_ref, q_ref, kv_hbm, o_ref,
                 kv_buf, sems):
    """Single-block fast path: the whole selection of ``hb`` heads is
    gathered per grid step and softmax runs in ONE shot (no online
    m/l/acc state, no per-block predicates). Round-5 redesign of the
    headline geometry (nb == 1, i.e. pages_per_block >= S): the general
    kernel's per-step fixed costs (scratch init, block predicates,
    online-state updates over a [Gp, 128] replicated m/l) left it
    compute-/overhead-bound at ~450 GB/s vs the ~700 GB/s raw gather
    ceiling (exp/r4_chip/gather_ab.log). Two levers:
      * ``hb`` heads per grid step — fewer, larger steps amortize the
        per-step DMA-issue + wait + bookkeeping cost;
      * VPU work runs on an f32-tile-aligned ``Gs``-row slice of the
        score matrix (Gs = G rounded to 8) instead of the full
        bf16-tile Gp=16 rows — for MHA (G=1) this halves every
        elementwise op while the MXU still sees native bf16 operands.
    """
    b = pl.program_id(0)
    t = pl.program_id(1)              # head-group step
    B = pl.num_programs(0)
    T = pl.num_programs(1)            # = H_sel // hb
    shared = layer is not None
    kv_hbm = kv_hbm if layer is None else kv_hbm.at[layer]

    def start_copies(ff):
        bb = ff // T
        tt = ff % T
        slot = ff % nslot
        for e in range(hb):
            hh = tt * hb + e
            for i in range(S):
                pid = idx_ref[bb, hh, i]
                if bpp_tab:
                    # Logical -> physical on the scalar core (see
                    # _kernel): kills the XLA translate fusion.
                    pid = (tab_ref[bb, pid // bpp_tab] * bpp_tab
                           + pid % bpp_tab)
                src = (kv_hbm.at[hh // kvdiv, pid] if shared
                       else kv_hbm.at[bb, hh // kvdiv, pid])
                pltpu.make_async_copy(src, kv_buf.at[slot, e, i],
                                      sems.at[slot]).start()

    def start_if_valid(ff):
        @pl.when(ff // T < B)
        def _():
            start_copies(ff)

    flat = b * T + t
    # Prologue at the GLOBAL first step only (see _kernel: issuing any
    # block twice would double-signal its slot semaphore).
    @pl.when(flat == 0)
    def _():
        for d in range(nslot - 1):
            start_if_valid(d)

    start_if_valid(flat + nslot - 1)

    slot = flat % nslot
    # One byte-counted wait absorbs all hb*S page copies of the slot.
    pltpu.make_async_copy(kv_buf.at[slot], kv_buf.at[slot],
                          sems.at[slot]).wait()

    num_valid = meta_ref[b, 0]
    last_len = meta_ref[b, 2]
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, S * page), 1)
    for e in range(hb):
        h = t * hb + e
        q = q_ref[0, e]                          # [Gp, D]
        kv = kv_buf[slot, e]                     # [S, 2, page, D]
        k = kv[:, 0].reshape(S * page, -1)
        v = kv[:, 1].reshape(S * page, -1)
        if k.dtype != q.dtype:   # fp8 pool: integer-ops upcast (no
            k = upcast_fp8(k, q.dtype)   # native Mosaic fp8 convert —
            v = upcast_fp8(v, q.dtype)   # astype measured ~5x slower)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)   # [Gp, S*page]
        s = s[:Gs]                                # aligned f32 row slice
        # Column validity (same contract as _kernel): junk slots are a
        # suffix; the partially-filled page sits at slot ``ls``.
        ls = lastslot_ref[b, h]
        mask = ci < num_valid * page
        lo = ls * page + last_len
        hi = (ls + 1) * page
        mask = jnp.logical_and(
            mask, jnp.logical_not(jnp.logical_and(ci >= lo, ci < hi)))
        s = jnp.where(mask, s, MASK_VALUE)
        m = jnp.max(s, axis=1, keepdims=True)     # [Gs, 1]
        p = jnp.exp(s - m)                        # masked cols underflow to 0
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # [Gs, D]
        o_ref[0, e, :Gs] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "pages_per_block",
                                             "num_slots", "interpret",
                                             "layer", "per_q_head",
                                             "block_pages", "num_sems",
                                             "q_f32", "heads_per_block",
                                             "q_pad8",
                                             "sorted_selection"))
def sparse_decode_attention(q, kv_pages, indices, num_valid,
                            seq_lens, *, sm_scale: float,
                            pages_per_block: int = 128,
                            num_slots: int = 3,
                            interpret: bool | None = None,
                            layer: int | None = None,
                            per_q_head: bool = False,
                            block_tab=None,
                            block_pages: int | None = None,
                            num_sems: int = 1,
                            q_f32: bool = False,
                            heads_per_block: int = 0,
                            q_pad8: bool = False,
                            sorted_selection: bool = False):
    """Decode attention over selected pages.

    Args:
      q: [B, Hq, D] query for the current token (un-scaled).
      kv_pages: [B, Hkv, P, 2, page, D] packed paged cache (0=K, 1=V) —
        or the whole-model SHARED pool [L, Hkv, NP, 2, page, D] with a
        static ``layer`` index (zero-copy read of the persistent
        buffer; requires ``block_tab``/``block_pages``, kv/paged_kv.py).
      indices: [B, Hkv, S] int32 selected LOGICAL page ids (slots >=
        num_valid junk; valid slots must hold DISTINCT ids — the partial
        current page is unmasked at duplicate occurrences otherwise).
        select_pages guarantees both. Translation to physical pool
        pages happens here, after the last-page slot is located.
      num_valid: [B] int32 count of real slots.
      seq_lens: [B] int32 sequence lengths incl. the current token.
      sm_scale: softmax scale (1/sqrt(D)).
      pages_per_block / num_slots: gather granularity and VMEM slot
        ring depth (num_slots-1 blocks stay in flight). Defaults are
        the measured 32K/2048 optimum on v5e (exp/unfused_tune.py,
        in-process repeats, exp/r3_chip/unfused_tune32k*.log: 128/3
        -> 131-150 us full pipeline vs 153 at 4 slots; deeper rings
        REGRESS — 163 us at 6 — as do smaller blocks, 165-221 us).
      num_sems: semaphores per slot (contiguous page stripes). Measured
        a dead end on v5e — distinct semaphores do NOT unlock extra
        DMA-queue parallelism (128/6: 163 us at nsem=1 vs 148 at
        nsem=4, both behind 128/3/nsem=1; 64/6: 170 us at nsem=1,
        170 at nsem=2) — kept for probe reproducibility.
      heads_per_block: heads gathered+computed per grid step on the
        single-block fast path (``_kernel_1blk``; only reachable when
        the whole selection fits one block, nb == 1). 0 = auto (2 when
        the head count divides and the slot ring fits an 8 MB VMEM
        budget, else 1). Ignored when nb > 1.

    Returns: [B, Hq, D] f32 attention output.
    """
    if interpret is None:
        interpret = use_interpret()
    B, Hq, D = q.shape
    if layer is None:
        _, Hkv, P, _, page, _ = kv_pages.shape
    else:
        assert block_tab is not None and block_pages is not None, (
            "shared whole-pool mode needs the block table")
        _, Hkv, _, _, page, _ = kv_pages.shape
    S = indices.shape[-1]
    # per_q_head: indices are [B, Hq, S] (reference-faithful selection,
    # `/root/reference/quest/utils/controller.py:106,119`); each grid
    # head is a single query head reading KV head h // kvdiv — G x the
    # gather traffic of the default shared selection.
    if per_q_head:
        kvdiv, G = Hq // Hkv, 1
        Hkv = Hq
    else:
        kvdiv, G = 1, Hq // Hkv

    ppb = min(pages_per_block, S)
    nsem = num_sems
    while ppb % nsem:
        nsem -= 1
    if S % ppb != 0:  # pad slot axis; padded slots are >= num_valid
        S_pad = round_up(S, ppb)
        indices = jnp.pad(indices, ((0, 0), (0, 0), (0, S_pad - S)))
        S = S_pad
    nb = S // ppb

    # Pad the GQA group axis to the query dtype's sublane tile.
    # q_f32 keeps the query at f32 (8-row tile instead of bf16's 16):
    # the MXU then reads a mixed f32 x bf16 operand pair (k is upcast
    # in-register by the multi-pass f32 matmul). With the Gs row slice
    # below, VPU work is 8-row either way; q_f32 only changes the MXU
    # operand mix (kept as a probe flag).
    # q_pad8 pads the group axis to 8 rows even in bf16 (a sub-tile
    # [8, D] bf16 operand): the score matmul then computes only the 8
    # rows the Gs slice keeps, instead of 16-and-discard-half.
    Gp = round_up(G, 8 if (q_f32 or q_pad8) else 16)
    # All VPU/softmax work runs on an f32-tile-aligned Gs-row slice of
    # the [Gp, cols] score matrix (f32 vregs are 8 sublanes, so s[:Gs]
    # is a free aligned slice): for MHA/small-G this halves every
    # elementwise op vs operating on the full bf16-tile Gp=16 rows.
    Gs = min(Gp, round_up(G, 8))
    qg = (q.astype(jnp.float32) * sm_scale).reshape(B, Hkv, G, D)
    qg = jnp.pad(qg, ((0, 0), (0, 0), (0, Gp - G), (0, 0)))
    if not q_f32:
        # fp8 pools keep the QUERY at bf16 (casting q to the storage
        # dtype would destroy its precision); k/v upcast post-load.
        cdt = (kv_pages.dtype
               if jnp.dtype(kv_pages.dtype).itemsize >= 2
               else jnp.bfloat16)
        qg = qg.astype(cdt)

    last_page = ((seq_lens - 1) // page).astype(jnp.int32)
    last_len = ((seq_lens - 1) % page + 1).astype(jnp.int32)
    meta = jnp.stack([num_valid.astype(jnp.int32),
                      last_page,
                      last_len], axis=1)  # [B, 3]

    indices = indices.astype(jnp.int32)
    if sorted_selection:
        # select_pages(sort_by_page=True) output invariant: the forced
        # current page has the MAXIMUM page id among valid slots, so
        # after the page-id sort it sits at slot num_valid-1 — no
        # search needed (round 5: the any/argmax fusion below was one
        # of ~4 small XLA fusions costing ~3-5 us each per decode
        # step).
        lastslot = jnp.broadcast_to(
            (num_valid.astype(jnp.int32) - 1)[:, None], (B, Hkv))
    else:
        # Slot position of the (possibly partially filled) current page
        # in each head's selection, found by one tiny XLA fusion; -1 if
        # absent (e.g. test-injected index sets without the current
        # page).
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, (B, Hkv, S), 2)
        is_last = jnp.logical_and(
            indices == last_page[:, None, None],
            slot_ids < num_valid.astype(jnp.int32)[:, None, None])
        lastslot = jnp.where(
            jnp.any(is_last, axis=-1),
            jnp.argmax(is_last, axis=-1).astype(jnp.int32),
            -1)                       # [B, Hkv]

    if block_tab is not None:
        # Logical -> physical page ids through the per-slot block
        # table, resolved ON the kernel's scalar core at DMA-issue time
        # (two scalar ops per descriptor; replaces an XLA gather fusion
        # per decode step — round 5).
        tab = block_tab.astype(jnp.int32)
        bpp_tab = block_pages
    else:
        tab = jnp.zeros((B, 1), jnp.int32)
        bpp_tab = 0

    if nb == 1:
        # Single-block fast path: whole selection per head per step.
        # Auto = 1: the v5e A/B (exp/r5_fastpath_ab.py, page-32 32K)
        # measured hb=2/4 within noise of hb=1 (49.1/45.1 vs 45.5 us)
        # — per-step costs are already amortized at hb=1, so keep the
        # smallest VMEM ring. hb > 1 remains available for probes.
        hb = heads_per_block or 1
        while Hkv % hb:
            hb -= 1
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B, Hkv // hb),
            in_specs=[
                pl.BlockSpec((1, hb, Gp, D), lambda b, t, *_: (b, t, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, hb, Gp, D),
                                   lambda b, t, *_: (b, t, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((num_slots, hb, S, 2, page, D), kv_pages.dtype),
                pltpu.SemaphoreType.DMA((num_slots,)),
            ],
        )
        kern = functools.partial(_kernel_1blk, S, page, layer, num_slots,
                                 kvdiv, hb, Gs, bpp_tab)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B, Hkv * nb),
            in_specs=[
                pl.BlockSpec((1, 1, Gp, D),
                             lambda b, t, *_: (b, t // nb, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 1, Gp, D),
                                   lambda b, t, *_: (b, t // nb, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((num_slots, ppb, 2, page, D), kv_pages.dtype),
                pltpu.SemaphoreType.DMA((num_slots, nsem)),
                pltpu.VMEM((Gs, 128), jnp.float32),
                pltpu.VMEM((Gs, 128), jnp.float32),
                pltpu.VMEM((Gs, D), jnp.float32),
            ],
        )
        kern = functools.partial(_kernel, ppb, page, layer, nb, num_slots,
                                 kvdiv, nsem, Gs, bpp_tab)

    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Gp, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(meta, indices, lastslot, tab, qg, kv_pages)

    return out[:, :, :G, :].reshape(B, Hq, D)
