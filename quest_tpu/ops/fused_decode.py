"""Fused Quest decode pipeline — estimate → exact top-K → gather →
flash-decode in ONE Pallas kernel.

Why this kernel exists. The reference runs the decode-attention
pipeline as four device launches (estimate, RAFT top-k, sparse decode,
plus per-step host planning — `/root/reference/quest/utils/controller.py:95-129`,
`kernels/include/decode/decode_attn.cuh:245-401,441-646`,
`kernels/include/topk/decode_select_k.cuh:26-62`). Our unfused TPU
pipeline mirrors that as three XLA/Pallas calls and is SERIAL: at
32K/2048 the estimate streams 33.5 MB of metadata (~45 us), then top-k
runs (~15-27 us), then the sparse gather moves another 33.5 MB
(~65-85 us) — the two memory phases never overlap, so the wall clock
is their SUM (~130-170 us) against a ~90 us single-stream data floor.

TPU-first fusion: one kernel, one grid, two concurrent DMA streams.
While head ``h``'s selected pages are being gathered and decoded, head
``h+1``'s metadata is already streaming and scoring. Per flattened
grid step (one metadata block):

  1. issue the metadata DMA ``nms-1`` steps ahead (contiguous
     [bp, D] slices of k_max/k_min — large, descriptor-cheap);
  2. wait the current metadata block, compute its score slice with two
     MXU matmuls (the relu/min sign-split of ops/estimate.py), write
     one [1, 128] row of the head's score matrix;
  3. on a head's LAST block: run the in-kernel EXACT top-K (below),
     compact the selected page ids in ascending-page order, and issue
     the whole-selection gather (one 8 KB descriptor per page — the
     layout keeps each page's K and V adjacent, see sparse_decode.py);
  4. one head later (next head's second-to-last block — by which time
     the 1 MB gather has long landed): masked single-block flash
     decode of the gathered pages, write the head's output rows.

In-kernel exact top-K (replaces lax.top_k / approx_max_k, which do not
exist inside Pallas):
  * scores live as [16, 128] f32, page id = row*128 + col;
  * keys are order-preserving int32 images of the f32 scores
    (``b < 0 ? b ^ 0x7fffffff : b`` — IEEE754 totally ordered, so the
    radix descent compares integers only);
  * a 32-pass 1-bit radix descent finds the exact K-th-largest key T
    and the tie count, entirely in vector registers (per-pass state is
    an active mask + a remaining-rank scalar; no SMEM round trips);
  * selected = (key > T) | (key == T and tie-rank < remaining), with
    tie-rank in ascending page order — the same set (and tie policy)
    as ``lax.top_k``; the last page carries +inf and is always in;
  * compaction: global slot = exclusive cumsum of the selected mask in
    page order (ascending-page output, like select_pages'
    sort_by_page), materialized through 16 tiny [128, K] one-hot
    matmuls fed by one [16,128]→[128,16] transpose — no scatter, no
    cross-lane relayout of the score matrix.

Exactness caveat (documented, not observable with real scores): keys
order -0.0 below +0.0, so a top-K boundary tie between -0.0 and +0.0
scores may resolve differently than lax.top_k. The reference's fp16
radix select bit-orders the boundary the same way.

Semantics match the unfused pipeline exactly:
  page_scores(group_agg) → select_pages(method="exact",
  sort_by_page=True) → sparse_decode_attention
and are tested against it and the eager oracles in
tests/test_fused_decode.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quest_tpu.ops.pallas_utils import MASK_VALUE, round_up, use_interpret

_SIGN_FIX = 0x7FFFFFFF  # see key mapping above


def _exact_topk_select(s, num_pages, last_page, K):
    """Exact top-K selection on an [SG, P_rows, 128] batch of score
    matrices (SG heads selected together — the radix descent's serial
    reduction chain is shared, so its latency amortizes SG-fold).

    Returns (sel, slot, num_valid): sel marks the selected pages, slot
    is each selected page's output position in ascending-page order
    (per head), num_valid = min(K, num_pages). All vector ops.
    """
    SG, rows, lanes = s.shape
    pid = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) * lanes
           + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2))
    s = jnp.where(pid < num_pages, s, -jnp.inf)
    s = jnp.where(pid == last_page, jnp.inf, s)

    b = jax.lax.bitcast_convert_type(s, jnp.int32)
    key = jnp.where(b < 0, b ^ jnp.int32(_SIGN_FIX), b)

    num_valid = jnp.minimum(jnp.int32(K), num_pages)

    # 32-pass 1-bit radix descent for the exact K-th largest key,
    # batched over the SG heads ([SG,1,1] per-head state).
    active = jnp.ones(s.shape, jnp.bool_)
    k_rem = jnp.full((SG, 1, 1), num_valid, jnp.int32)
    for sh in range(31, -1, -1):
        bit = (jax.lax.shift_right_logical(key, jnp.int32(sh))
               & jnp.int32(1)) == 1
        # Signed keys: bit 31 SET means negative (smaller); within a
        # sign, two's complement orders like unsigned. So the "upper
        # half" at the sign bit is bit==0, everywhere else bit==1.
        bit_hi = jnp.logical_not(bit) if sh == 31 else bit
        hi = jnp.logical_and(active, bit_hi)
        c = jnp.sum(hi.astype(jnp.int32), axis=(1, 2), keepdims=True)
        go_hi = c >= k_rem
        active = jnp.where(go_hi, hi,
                           jnp.logical_and(active,
                                           jnp.logical_not(bit_hi)))
        k_rem = jnp.where(go_hi, k_rem, k_rem - c)

    # active == {key == T} per head; include the k_rem lowest-page-id
    # ties — the same tie policy as lax.top_k (earlier index wins).
    thr = jnp.max(jnp.where(active, key, jnp.int32(-2147483648)),
                  axis=(1, 2), keepdims=True)
    gt = key > thr
    tie_rank = _page_order_cumsum(active.astype(jnp.int32)) - active
    sel = jnp.logical_or(gt, jnp.logical_and(active, tie_rank < k_rem))

    slot = _page_order_cumsum(sel.astype(jnp.int32)) - sel
    return sel, slot, num_valid


def _page_order_cumsum(x):
    """Inclusive cumsum of [SG, rows, lanes] i32 in row-major (page)
    order, independently per leading index.

    Mosaic has no `cumsum` lowering (TC kernels), so both scans are
    expressed as triangular-matrix matmuls on the MXU: along lanes
    with an inclusive lower-triangular [lanes, lanes], then a strict
    lower-triangular [rows, rows] to carry row totals forward. Counts
    are <= P (< 2^24), exact in f32."""
    SG, rows, lanes = x.shape
    xf = x.astype(jnp.float32)
    li = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 1)
    tri_inc = (li <= lj).astype(jnp.float32)
    cs = jax.lax.dot_general(xf, tri_inc, (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    row_tot = cs[:, :, lanes - 1]                    # [SG, rows]
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    tri_strict = (ri < rj).astype(jnp.float32)
    off = jax.lax.dot_general(row_tot, tri_strict,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return (cs + off[:, :, None]).astype(jnp.int32)


def _compact_ids(sel, slot, Kp, chunk_rows: int = 16):
    """Scatter page ids to their slots: out[1, Kp] f32, ascending page
    order, zeros at junk slots.

    One-hot built as a 3D broadcast compare ([rows,lanes,1] slot vs
    [1,1,Kp] iota) so the leading dims merge into sublanes layout-free
    — no cross-lane relayout, no per-row loop; cost is O(P*Kp) VPU
    compares + a sublane-tree reduction, chunked to cap the [chunk,
    lanes, Kp] f32 temporary at 1 MB."""
    rows, lanes = sel.shape
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Kp), 2)
    acc = jnp.zeros((1, Kp), jnp.float32)
    for r0 in range(0, rows, chunk_rows):
        cr = min(chunk_rows, rows - r0)
        sl = jnp.where(sel[r0:r0 + cr], slot[r0:r0 + cr],
                       -1)[:, :, None]               # [cr, lanes, 1]
        oh = (sl == k_iota).astype(jnp.float32)      # [cr, lanes, Kp]
        pid = (jax.lax.broadcasted_iota(jnp.int32, (cr, lanes), 0)
               * lanes + r0 * lanes
               + jax.lax.broadcasted_iota(jnp.int32, (cr, lanes), 1))
        contrib = oh * pid[:, :, None].astype(jnp.float32)
        acc = acc + jnp.sum(contrib.reshape(cr * lanes, Kp), axis=0,
                            keepdims=True)
    return acc


def _kernel(page, D, K, Kp, G, Gp, Hkv, nbm, bp, nms, ngs, gsm, SG, agg,
            sm_scale, layer, bp2, meta_ref, tab_ref, qc_ref, kmax_hbm,
            kmin_hbm, kv_hbm, o_ref, mbuf, msem, gbuf, gsem, scores_scr,
            idx_scr, ls_scr):
    gpps = K // gsm               # gather pages per semaphore stripe
    t = pl.program_id(0)
    T = pl.num_programs(0)
    fh = t // nbm                 # flat (batch, head) being SCORED
    mj = t % nbm
    HT = T // nbm - SG            # real flat heads (SG tail heads)
    # Shared whole-model pool: a static layer index reads the
    # persistent buffers zero-copy (kv loses its batch axis — slots
    # share physical pages through the block table, kv/paged_kv.py).
    shared = layer is not None
    if shared:
        kmax_hbm = kmax_hbm.at[layer]
        kmin_hbm = kmin_hbm.at[layer]
        kv_hbm = kv_hbm.at[layer]

    def meta_start(ss):
        # Issue metadata block for flat step ss into slot ss % nms.
        hh = ss // nbm
        jj = ss % nbm
        bb = hh // Hkv
        kk = hh % Hkv
        sl = ss % nms
        pltpu.make_async_copy(
            kmax_hbm.at[bb, kk, pl.ds(jj * bp, bp)],
            mbuf.at[sl, 0], msem.at[sl]).start()
        pltpu.make_async_copy(
            kmin_hbm.at[bb, kk, pl.ds(jj * bp, bp)],
            mbuf.at[sl, 1], msem.at[sl]).start()

    def meta_start_if_valid(ss):
        @pl.when(ss < HT * nbm)
        def _():
            meta_start(ss)

    # --- metadata stream: prologue + steady-state lookahead ---------
    @pl.when(t == 0)
    def _():
        for d in range(nms - 1):
            meta_start_if_valid(d)

    meta_start_if_valid(t + nms - 1)

    # --- score one metadata block ------------------------------------
    @pl.when(t < HT * nbm)
    def _():
        sl = t % nms
        pltpu.make_async_copy(mbuf.at[sl], mbuf.at[sl],
                              msem.at[sl]).wait()
        qc = qc_ref[0, SG]                         # [2Gp, D] of head fh
        kmax = mbuf[sl, 0].astype(qc.dtype)        # [bp, D]
        kmin = mbuf[sl, 1].astype(qc.dtype)
        sblk = (jax.lax.dot_general(qc[:Gp], kmax,
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(qc[Gp:], kmin,
                                      (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32))
        row = jax.lax.broadcasted_iota(jnp.int32, sblk.shape, 0)
        if agg == "max":
            srow = jnp.max(jnp.where(row < G, sblk, -1e30), axis=0,
                           keepdims=True)
        else:
            srow = jnp.sum(jnp.where(row < G, sblk, 0.0), axis=0,
                           keepdims=True)
        scores_scr[pl.ds(fh % SG, 1), pl.ds(mj, 1), :] = (
            srow.reshape(1, 1, -1))

    # --- group complete: exact top-K select + issue gathers ----------
    # SG heads select together (batched radix); SG | Hkv so a group
    # never straddles batch rows (one num_pages per group).
    @pl.when(jnp.logical_and(
        t < HT * nbm,
        jnp.logical_and(fh % SG == SG - 1, mj == nbm - 1)))
    def _():
        bb = fh // Hkv
        num_pages = meta_ref[bb, 0]
        last_page = meta_ref[bb, 1]
        sel, slot, _ = _exact_topk_select(scores_scr[...], num_pages,
                                          last_page, K)
        par = (fh // SG) % 2
        pid = (jax.lax.broadcasted_iota(jnp.int32, sel.shape, 1)
               * sel.shape[2]
               + jax.lax.broadcasted_iota(jnp.int32, sel.shape, 2))
        is_last = jnp.logical_and(sel, pid == last_page)
        ls_all = jnp.sum(jnp.where(is_last, slot, 0), axis=(1, 2),
                         keepdims=True)                  # [SG,1,1]
        for h2 in range(SG):
            ids = _compact_ids(sel[h2], slot[h2], Kp)
            idx_scr[pl.ds(par, 1), pl.ds(h2, 1), :] = (
                ids.astype(jnp.int32).reshape(1, 1, Kp))
            ls_scr[par, h2] = ls_all[h2, 0, 0]

        for h2 in range(SG):
            hh = fh - (SG - 1) + h2
            kk = hh % Hkv
            gs = hh % ngs
            for i in range(K):
                gpid = idx_scr[par, h2, i]
                # Logical -> physical page id through the per-slot
                # block table (identity table in per-layer mode).
                phys = tab_ref[bb, gpid // bp2] * bp2 + gpid % bp2
                src = (kv_hbm.at[kk, phys] if shared
                       else kv_hbm.at[bb, kk, phys])
                pltpu.make_async_copy(
                    src, gbuf.at[gs, i],
                    gsem.at[gs, min(i // gpps, gsm - 1)]).start()

    # --- SG heads behind: flash-decode the gathered selection --------
    dh = fh - SG
    @pl.when(jnp.logical_and(dh >= 0, mj == nbm - 2))
    def _():
        bb = dh // Hkv
        kk = dh % Hkv
        gs = dh % ngs
        for s in range(gsm):
            n = K - s * gpps if s == gsm - 1 else gpps
            sl = pl.ds(s * gpps, n)
            pltpu.make_async_copy(gbuf.at[gs, sl], gbuf.at[gs, sl],
                                  gsem.at[gs, s]).wait()
        num_pages = meta_ref[bb, 0]
        num_valid = jnp.minimum(jnp.int32(K), num_pages)
        last_len = meta_ref[bb, 2]
        par = (dh // SG) % 2
        ls = ls_scr[par, dh % SG]

        qc = qc_ref[0, 0]                          # [2Gp, D] of head dh
        q = (qc[:Gp] + qc[Gp:])                    # relu(q)+min(q,0) = q
        kv = gbuf[gs]                              # [K, 2, page, D]
        # Upcast sub-bf16 KV (fp8 serving config) to the query dtype so
        # the MXU sees a uniform operand pair (mixed bf16 x f8 matmuls
        # are not a lowering we rely on; cf. sparse_decode's q cast).
        k = kv[:, 0].reshape(K * page, D).astype(q.dtype)
        v = kv[:, 1].reshape(K * page, D).astype(q.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        ci = jax.lax.broadcasted_iota(jnp.int32, (1, K * page), 1)
        mask = ci < num_valid * page
        lo = ls * page + last_len
        hi = (ls + 1) * page
        mask = jnp.logical_and(
            mask, jnp.logical_not(
                jnp.logical_and(ci >= lo, ci < hi)))
        s = jnp.where(mask, s, MASK_VALUE)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.where(mask, jnp.exp(s - m), 0.0)
        l = jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[bb, kk] = (pv / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "sm_scale", "budget_pages", "group_agg", "block_p", "meta_slots",
    "gather_slots", "gather_sems", "select_group", "interpret", "layer",
    "block_pages"))
def fused_sparse_decode(q, kv_pages, k_max, k_min, seq_lens, *,
                        sm_scale: float, budget_pages: int,
                        group_agg: str = "sum", block_p: int = 128,
                        meta_slots: int = 6,
                        gather_slots: int | None = None,
                        gather_sems: int = 1, select_group: int = 1,
                        interpret: bool | None = None,
                        layer: int | None = None,
                        block_tab=None, block_pages: int | None = None):
    """Full Quest decode-attention pipeline as one fused kernel.

    Args:
      q: [B, Hq, D] current decode query (un-scaled).
      kv_pages: [B, Hkv, P, 2, page, D] packed paged cache — or the
        whole-model SHARED pool [L, Hkv, NP, 2, page, D] with a static
        ``layer`` (zero-copy read; requires ``block_tab``/
        ``block_pages``; k_max/k_min are then [L, B, Hkv, P, D]).
      k_max/k_min: [B, Hkv, P, D] per-page metadata.
      seq_lens: [B] int32 lengths including the current token.
      sm_scale: softmax scale.
      budget_pages: static top-K page budget (includes the last page).
      group_agg: GQA group aggregation for selection ("sum" | "max").
      block_p: metadata pages scored per grid step (lane width 128).
      meta_slots / gather_slots: DMA ring depths.

    Returns: [B, Hq, D] f32 — identical (same selected set, same
    masking) to page_scores → select_pages(exact) →
    sparse_decode_attention.
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
        P = k_max.shape[3]
    G = Hq // Hkv
    Gp = round_up(G, 16)
    K = budget_pages
    Kp = round_up(K, 128)
    # The decode of head h lags one head and lands at block nbm-2 of
    # head h+1, so every head needs >= 2 metadata blocks. bp must
    # divide P and be a lane multiple: pick the largest qualifying
    # divisor (pools are 64-page multiples, config.py:max_pages, so
    # e.g. P=2112 -> bp=64, not an assert).
    cap = min(block_p, P // 2)
    bp = max((d for d in range(64, cap + 1, 64) if P % d == 0),
             default=0)
    assert bp, f"pool pages {P} must be a multiple of 64 (and >= 128)"
    nbm = P // bp
    SG = select_group
    assert Hkv % SG == 0, (Hkv, SG)   # groups never straddle batch rows
    assert nbm >= 2
    nms = min(meta_slots, nbm * 2)
    # Ring must hold one group's gathers plus the one being decoded.
    ngs = gather_slots if gather_slots is not None else SG + 1
    gsm = max(1, min(gather_sems, K))
    HT = B * Hkv

    qf = q.astype(jnp.float32).reshape(B, Hkv, G, D)
    qf = jnp.pad(qf, ((0, 0), (0, 0), (0, Gp - G), (0, 0)))
    qdt = (k_max.dtype if jnp.dtype(k_max.dtype).itemsize >= 2
           else jnp.bfloat16)
    qc = jnp.concatenate([jnp.maximum(qf, 0.0), jnp.minimum(qf, 0.0)],
                         axis=2).astype(qdt)       # [B, Hkv, 2Gp, D]

    num_pages = ((seq_lens + page - 1) // page).astype(jnp.int32)
    meta = jnp.stack([num_pages, num_pages - 1,
                      ((seq_lens - 1) % page + 1).astype(jnp.int32)],
                     axis=1)                        # [B, 3]

    if block_tab is None:
        # Identity translation: one "block" spanning the whole pool.
        bp2 = P
        tab = jnp.zeros((B, 1), jnp.int32)
    else:
        bp2 = block_pages
        tab = block_tab.astype(jnp.int32)

    def qc_index(t, *_):
        # Block fh of qc2 holds rows [qc(fh-SG) .. qc(fh)]: the lagged
        # decode (head fh-SG) reads row 0, scoring (head fh) row SG.
        return (t // nbm, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=((HT + SG) * nbm,),
        in_specs=[
            pl.BlockSpec((1, SG + 1, 2 * Gp, D), qc_index),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((B, Hkv, Gp, D),
                               lambda t, *_: (0, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((nms, 2, bp, D), k_max.dtype),
            pltpu.SemaphoreType.DMA((nms,)),
            pltpu.VMEM((ngs, K, 2, page, D), kv_pages.dtype),
            pltpu.SemaphoreType.DMA((ngs, gsm)),
            pltpu.VMEM((SG, nbm, bp), jnp.float32),
            pltpu.VMEM((2, SG, Kp), jnp.int32),
            pltpu.SMEM((2, SG), jnp.int32),
        ],
    )

    # qc2[i, s] = qc(i - SG + s) for s in 0..SG (zeros off both ends):
    # each grid block carries the decode head (row 0) through the
    # scoring head (row SG).
    qcf = qc.reshape(HT, 2 * Gp, D)
    z = jnp.zeros((SG, 2 * Gp, D), qc.dtype)
    ext = jnp.concatenate([z, qcf, z], axis=0)      # ext[i+s] = qc(i-SG+s)
    qc2 = jnp.stack([ext[s:s + HT + SG] for s in range(SG + 1)],
                    axis=1)                          # [HT+SG, SG+1, ...]

    out = pl.pallas_call(
        functools.partial(_kernel, page, D, K, Kp, G, Gp, Hkv, nbm, bp,
                          nms, ngs, gsm, SG, group_agg, sm_scale, layer,
                          bp2),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Gp, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(meta, tab, qc2, k_max, k_min, kv_pages)

    return out[:, :, :G, :].reshape(B, Hq, D)
