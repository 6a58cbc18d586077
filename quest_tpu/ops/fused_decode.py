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
     one [1, bp] row of the head's score matrix;
  3. on a GROUP's last block (``select_group`` heads select together):
     run the in-kernel EXACT top-K (below) batched over the group —
     the radix descent's serial reduction chain is shared, so its
     latency amortizes SG-fold;
  4. one head per following step: compact that head's selected page
     ids in ascending-page order and issue its whole-selection gather
     (one 8 KB descriptor per page — the layout keeps each page's K
     and V adjacent, see sparse_decode.py); spreading issue over steps
     keeps per-step serial work and unrolled code size constant in SG;
  5. SG heads later (by which time the 1 MB gather has long landed):
     masked single-block flash decode of the gathered pages, write the
     head's output rows.

In-kernel exact top-K (replaces lax.top_k / approx_max_k, which do not
exist inside Pallas) — see _exact_topk_select:
  * scores live as [SG*nbm, bp] f32 row bands, page id = band-local
    row * bp + lane; ALL values rank-2 (three distinct rank-3 Mosaic
    failures on real hardware are documented in its docstring);
  * keys are order-preserving int32 images of the f32 scores
    (``b < 0 ? b ^ 0x7fffffff : b`` — IEEE754 totally ordered, so the
    radix descent compares integers only);
  * a 32-pass 1-bit radix descent finds the exact K-th-largest key T
    and the tie count per head, entirely in vector registers; per-head
    state is band-uniform [SG*nbm, 1] columns, and band counts are two
    tiny MXU matmuls against 0/1 segment matrices;
  * selected = (key > T) | (key == T and tie-rank < remaining), with
    tie-rank in ascending page order — the same set (and tie policy)
    as ``lax.top_k``; the last page carries +inf and is always in;
  * compaction (per head, _compact_ids): slot = exclusive cumsum of
    the selected mask in page order (ascending-page output, like
    select_pages' sort_by_page), materialized via one-hot compares —
    no scatter, no cross-lane relayout of the score matrix.

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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quest_tpu.ops.pallas_utils import MASK_VALUE, round_up, use_interpret

_SIGN_FIX = 0x7FFFFFFF  # see key mapping above

# Timing-only ablations for on-chip cost attribution
# (exp/bench_fused.py): comma-set of {"noselect", "nocompact"}.
# Outputs are WRONG under ablation — never set outside experiments.
_ABLATE = frozenset(
    x for x in os.environ.get("QF_ABLATE", "").split(",") if x)


def _exact_topk_select(s2, SG, num_pages, last_page, K):
    """Exact top-K selection, SG heads batched, ALL values rank-2.

    ``s2``: [SG*nbm, bp] f32 — head g's score matrix occupies the
    row band [g*nbm, (g+1)*nbm); page id within a band = band-local
    row * bp + lane.

    Rank-2-only by necessity, not style: this Mosaic version has THREE
    hardware-triggered failures on rank-3 values with leading dim > 1
    (stored i1 masks: "Unsupported target bitwidth for truncation";
    multi-axis reduces: layout.h SIGABRT, exp/select_compile2.py; and
    an execution-time wedge at SG>=4 that interpret mode cannot see).
    Per-head scalar state lives as band-uniform [SG*nbm, 1] columns;
    band (segment) reductions are two tiny MXU matmuls against 0/1
    segment matrices — lane-axis reduces (the one known-good reduce
    form) plus matmuls only.

    Returns (sel, slot, num_valid): sel marks selected pages (i32
    0/1), slot is each selected page's output position in
    ascending-page order (per head), num_valid = min(K, num_pages).
    The 32-pass 1-bit radix descent finds the exact K-th largest
    order-preserving int32 key image; boundary ties resolve to the
    lowest page ids — the same tie policy as lax.top_k.
    """
    SGN, bp = s2.shape
    nbm = SGN // SG
    row = jax.lax.broadcasted_iota(jnp.int32, (SGN, bp), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SGN, bp), 1)
    pid = (row % nbm) * bp + lane
    s2 = jnp.where(pid < num_pages, s2, -jnp.inf)
    s2 = jnp.where(pid == last_page, jnp.inf, s2)

    b = jax.lax.bitcast_convert_type(s2, jnp.int32)
    key = jnp.where(b < 0, b ^ jnp.int32(_SIGN_FIX), b)

    num_valid = jnp.minimum(jnp.int32(K), num_pages)

    # Band reductions as log2(nbm) BUTTERFLY shuffles on the [SGN, 1]
    # column (partner row = row ^ s): bands are power-of-2 row ranges,
    # so each step stays band-internal and the result is band-uniform.
    # The first implementation used two tiny segment matmuls per radix
    # pass instead — 64 serially-dependent MXU dispatches per group
    # measured ~106 us of the kernel's 297 (QF_ABLATE=noselect).
    assert nbm & (nbm - 1) == 0, nbm
    rcol = jax.lax.broadcasted_iota(jnp.int32, (SGN, 1), 0)

    def _butterfly(col, combine):
        s = 1
        while s < nbm:
            down = jnp.roll(col, -s, axis=0)   # row + s
            up = jnp.roll(col, s, axis=0)      # row - s
            partner = jnp.where((rcol // s) % 2 == 0, down, up)
            col = combine(col, partner)
            s *= 2
        return col

    def band_sum_rows(x_i32):
        """[SGN, bp] i32 -> [SGN, 1] i32: per-band total, band-uniform
        (counts <= 2^24, exact in f32)."""
        rc = jnp.sum(x_i32.astype(jnp.float32), axis=1, keepdims=True)
        return _butterfly(rc, jnp.add).astype(jnp.int32)

    one = jnp.int32(1)
    active = jnp.ones((SGN, bp), jnp.int32)
    k_rem = jnp.full((SGN, 1), num_valid, jnp.int32)      # band-uniform
    for sh in range(31, -1, -1):
        bit = (jax.lax.shift_right_logical(key, jnp.int32(sh)) & one)
        # Signed keys: bit 31 SET means negative (smaller); within a
        # sign, two's complement orders like unsigned. So the "upper
        # half" at the sign bit is bit==0, everywhere else bit==1.
        bit_hi = (one - bit) if sh == 31 else bit
        hi = active * bit_hi
        c = band_sum_rows(hi)
        go_hi = c >= k_rem
        active = jnp.where(go_hi, hi, active * (one - bit_hi))
        k_rem = jnp.where(go_hi, k_rem, k_rem - c)

    # active == {key == T} per band; include the k_rem lowest-page-id
    # ties. Band max of the surviving keys via a static per-band loop
    # (SG <= 8 scalar extracts; no cross-row vector max needed).
    m_rows = jnp.max(jnp.where(active > 0, key, jnp.int32(-2147483648)),
                     axis=1, keepdims=True)               # [SGN, 1]
    thr = jnp.zeros((SGN, 1), jnp.int32)
    for g in range(SG):
        tg = jnp.max(m_rows[g * nbm:(g + 1) * nbm])       # scalar
        thr = jnp.where(row[:, :1] // nbm == g, tg, thr)
    gt = jnp.where(key > thr, one, jnp.int32(0))
    tie_rank = _band_cumsum(active, nbm) - active
    tie_in = jnp.where(tie_rank < k_rem, active, jnp.int32(0))
    sel = jnp.maximum(gt, tie_in)

    slot = _band_cumsum(sel, nbm) - sel
    return sel, slot, num_valid


def _band_cumsum(x, nbm):
    """Inclusive cumsum of [SG*nbm, lanes] i32 in row-major (page)
    order, independently per nbm-row band. Rank-2 only (see
    _exact_topk_select).

    Mosaic has no `cumsum` lowering (TC kernels), so both scans are
    expressed as triangular-matrix matmuls on the MXU: along lanes
    with an inclusive lower-triangular [lanes, lanes], then a strict
    lower-triangular WITHIN-BAND [rows, rows] to carry row totals
    forward. Counts are <= P (< 2^24), exact in f32."""
    rows, lanes = x.shape
    xf = x.astype(jnp.float32)
    li = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 1)
    tri_inc = jnp.where(li <= lj, 1.0, 0.0)
    cs = jax.lax.dot_general(xf, tri_inc, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    row_tot = cs[:, lanes - 1:lanes]                 # [rows, 1]
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    tri_band = jnp.where(
        jnp.logical_and(ri // nbm == rj // nbm, rj < ri), 1.0, 0.0)
    off = jax.lax.dot_general(tri_band, row_tot, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return (cs + off).astype(jnp.int32)


def _compact_ids(sel, slot, Kp):
    """Scatter page ids to their slots: out[1, Kp] f32, ascending page
    order, zeros at junk slots.

    Rank-2 only (see _exact_topk_select): ONE [rows, lanes] ->
    [lanes, rows] transpose of the masked slot matrix, then per row a
    [lanes, Kp] one-hot compare and a [1, lanes] x [lanes, Kp] MXU
    matmul accumulating ids into their slots — no rank-3 one-hot, no
    cross-sublane tree reduction (the previous form's [rows*lanes, Kp]
    reshape relayout measured as part of a ~115 us compaction bill,
    QF_ABLATE=nocompact)."""
    rows, lanes = sel.shape
    masked = jnp.where(sel > 0, slot, -1)            # [rows, lanes]
    slotT = masked.T                                 # [lanes, rows]
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (lanes, Kp), 1)
    acc = jnp.zeros((1, Kp), jnp.float32)
    for r in range(rows):
        oh = jnp.where(slotT[:, r:r + 1] == k_iota, 1.0, 0.0)
        # (iota must be integer-typed: Mosaic rejects f32 tpu.iota)
        pid = (jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
               + jnp.int32(r * lanes)).astype(jnp.float32)
        acc = acc + jax.lax.dot_general(
            pid, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return acc


def _kernel(page, D, K, Kp, G, Gp, Hkv, nbm, nbt, bp, nms, ngs, gsm, SG, agg,
            sm_scale, layer, bp2, meta_ref, tab_ref, qc_ref, kmax_hbm,
            kmin_hbm, kv_hbm, o_ref, mbuf, msem, gbuf, gsem, scores_scr,
            sel_scr, slot_scr, idx_scr, ls_scr):
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
        if shared:
            # Physical-block-keyed metadata ([Hkv, NPB, bp2, D],
            # kv/paged_kv.py): the logical bp-page block spans bp/bp2
            # physical blocks, each one contiguous [bp2, D] DMA whose
            # address comes from the scalar-prefetched table. All
            # copies signal the slot's semaphore; the wait below
            # absorbs them by byte count.
            for c in range(bp // bp2):
                pblk = tab_ref[bb, (jj * bp) // bp2 + c]
                pltpu.make_async_copy(
                    kmax_hbm.at[kk, pblk],
                    mbuf.at[sl, 0, pl.ds(c * bp2, bp2)],
                    msem.at[sl]).start()
                pltpu.make_async_copy(
                    kmin_hbm.at[kk, pblk],
                    mbuf.at[sl, 1, pl.ds(c * bp2, bp2)],
                    msem.at[sl]).start()
        else:
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
        # scores_scr is 2-D [SG*nbm, bp]: rank-3 VMEM refs with leading
        # dim > 1 trip a Mosaic layout bug (layout.h Check failed:
        # arr.size() >= layout_rank) when their loads feed reductions;
        # the same ops on a value RESHAPED from a 2-D load are fine.
        scores_scr[pl.ds((fh % SG) * nbt + mj, 1), :] = srow

    # --- group complete: batched exact top-K select ------------------
    # SG heads select together (batched radix — the 32-pass descent's
    # serial reduction chain is shared, so its latency amortizes
    # SG-fold); SG | Hkv so a group never straddles batch rows (one
    # num_pages per group). Only the radix runs here: per-head
    # compaction + gather issue is SPREAD over the following SG steps
    # (one head each, below), keeping both the unrolled code size and
    # the per-step serial work constant in SG.
    @pl.when(jnp.logical_and(
        t < HT * nbm,
        jnp.logical_and(fh % SG == SG - 1, mj == nbm - 1)))
    def _():
        if "noselect" in _ABLATE:
            return
        bb = fh // Hkv
        num_pages = meta_ref[bb, 0]
        last_page = meta_ref[bb, 1]
        sel, slot, _ = _exact_topk_select(scores_scr[...], SG,
                                          num_pages, last_page, K)
        par = (fh // SG) % 2
        row = jax.lax.broadcasted_iota(jnp.int32, sel.shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, sel.shape, 1)
        pid = (row % nbt) * bp + lane
        is_last = jnp.where(pid == last_page, sel, jnp.int32(0))
        # Last-page slot per band: one nonzero per band, lane-reduced
        # then band-summed to a scalar at store time (exact in f32).
        ls_rows = jnp.sum((is_last * slot).astype(jnp.float32), axis=1,
                          keepdims=True)                 # [SG*nbt, 1]
        # Per-head stores at nbt8-strided (8-aligned) static offsets:
        # the per-head read below uses a DYNAMIC row start h2*nbt8,
        # which Mosaic must prove sublane-aligned (multiple of 8).
        nbt8 = max(8, nbt)
        for h2 in range(SG):
            sel_scr[pl.ds(h2 * nbt8, nbt), :] = (
                sel[h2 * nbt:(h2 + 1) * nbt])
            slot_scr[pl.ds(h2 * nbt8, nbt), :] = (
                slot[h2 * nbt:(h2 + 1) * nbt])
            ls_scr[par, h2] = jnp.sum(
                ls_rows[h2 * nbt:(h2 + 1) * nbt]).astype(jnp.int32)

    # --- one head per step: compact its selection + issue its gathers.
    # Head hh0 = fh-SG+1 compacts/issues at (fh, nbm-1): its group's
    # radix ran at step ((hh0//SG+1)*SG-1, nbm-1) <= this step (equal
    # for the group's first head — same-step, program-ordered), and
    # group g+1 overwrites sel/slot only at ((g+2)*SG-1, nbm-1), after
    # the last reader at ((g+2)*SG-2, nbm-1). Its decode waits at
    # (hh0+SG, nbm-2) — nbm-1 steps of gather landing time, same
    # pipeline depth as the SG=1 design.
    hh0 = fh - (SG - 1)
    @pl.when(jnp.logical_and(
        jnp.logical_and(hh0 >= 0, hh0 < HT), mj == nbm - 1))
    def _():
        bb = hh0 // Hkv
        kk = hh0 % Hkv
        gs = hh0 % ngs
        par = (hh0 // SG) % 2
        h2 = hh0 % SG
        if "nocompact" in _ABLATE or "noselect" in _ABLATE:
            ids = jax.lax.broadcasted_iota(jnp.int32, (1, Kp), 1)
            idx_scr[pl.ds(par * SG + h2, 1), :] = ids
        else:
            nbt8 = max(8, nbt)
            sel_h = sel_scr[pl.ds(h2 * nbt8, nbt), :]
            slot_h = slot_scr[pl.ds(h2 * nbt8, nbt), :]
            ids = _compact_ids(sel_h, slot_h, Kp)
            idx_scr[pl.ds(par * SG + h2, 1), :] = ids.astype(jnp.int32)
        if "nogather" in _ABLATE:
            return
        NPp = nbm * bp                       # logical pool pages
        for i in range(K):
            # Clamp defensively: an out-of-range page id here would
            # turn into an out-of-bounds DMA address, which FAULTS the
            # TPU worker (a ~30-min outage) instead of erroring — junk
            # slots must stay in-bounds whatever the compaction wrote.
            gpid = idx_scr[par * SG + h2, i]
            gpid = jnp.clip(gpid, 0, NPp - 1)
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
        if "nogather" in _ABLATE:
            o_ref[bb, kk] = jnp.zeros((Gp, D), o_ref.dtype)
            return
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
        ``block_pages``; k_max/k_min are then the physical-block-keyed
        [L, Hkv, NPB, block_pages, D], kv/paged_kv.py).
      k_max/k_min: [B, Hkv, P, D] per-page metadata (logical,
        batch-dense — the per-layer test/bench mode).
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
        P = block_tab.shape[1] * block_pages   # logical pages per slot
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
    # Shared mode streams metadata in [block_pages, D] physical-block
    # DMAs, so bp must also be a block_pages multiple there.
    quantum = 64
    if layer is not None:
        assert quantum % block_pages == 0 or block_pages % quantum == 0, (
            f"block_pages={block_pages} incompatible with the 64-page "
            "metadata lane quantum")
        quantum = max(quantum, block_pages)
    bp = max((d for d in range(quantum, cap + 1, quantum) if P % d == 0),
             default=0)
    assert bp, (f"pool pages {P} must be a multiple of {quantum} "
                "(and >= 2x that)")
    nbm = P // bp
    # Band rows padded to a power of two (butterfly reductions; junk
    # rows carry page ids >= P, which the validity mask kills).
    nbt = 1
    while nbt < nbm:
        nbt *= 2
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
            pltpu.VMEM((SG * nbt, bp), jnp.float32),
            pltpu.VMEM((SG * max(8, nbt), bp), jnp.int32),
            pltpu.VMEM((SG * max(8, nbt), bp), jnp.int32),
            pltpu.VMEM((2 * SG, Kp), jnp.int32),
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
        functools.partial(_kernel, page, D, K, Kp, G, Gp, Hkv, nbm, nbt, bp,
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
