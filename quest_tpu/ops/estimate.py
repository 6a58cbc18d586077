"""Query-aware page criticality estimation — the heart of Quest.

Reference kernel: `MaxPossibleSampleWithPagedKVCache`
(`/root/reference/kernels/include/decode/decode_attn.cuh:138-168,245-401`):
for every page p and head h,
    score[h, p] = sum_d max(q[h,d] * maxK[p,d], q[h,d] * minK[p,d])
an upper bound on the page's pre-softmax attention score.

TPU-first observation: the elementwise max of the two products splits by
the sign of q, so
    score = relu(q) @ maxK^T + min(q, 0) @ minK^T
i.e. **two MXU matmuls** over the contiguous metadata arrays — no custom
kernel needed; XLA fuses the relu/min into the matmul operands. (The
eval-only simulation path uses the same sign trick:
`/root/reference/evaluation/quest_attention.py:146-148`.) Measured
alternative rejected: packing max/min into one ``[P, 2, D]`` array and
doing a single ``[P, 2D]`` reshape-matmul lowers ~10x slower on TPU.

GQA: queries are reshaped per KV-head group and scores are aggregated
over the group (max or sum) so that page selection is per KV head —
shard-local under head sharding and bandwidth-optimal in the sparse
attention kernel. For MHA (group=1) this is exactly the reference's
per-head selection.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quest_tpu.ops.pallas_utils import round_up, upcast_fp8, use_interpret

_HI = jax.lax.Precision.HIGHEST


def _group_scores(q: jnp.ndarray, k_max: jnp.ndarray,
                  k_min: jnp.ndarray) -> jnp.ndarray:
    """[B, Hq, D] x 2x[B, Hkv, P, D] -> [B, Hkv, G, P] f32."""
    B, Hq, D = q.shape
    Hkv = k_max.shape[1]
    G = Hq // Hkv
    qf = q.astype(jnp.float32).reshape(B, Hkv, G, D)
    return (jnp.einsum("bkgd,bkpd->bkgp", jnp.maximum(qf, 0.0),
                       k_max.astype(jnp.float32), precision=_HI)
            + jnp.einsum("bkgd,bkpd->bkgp", jnp.minimum(qf, 0.0),
                         k_min.astype(jnp.float32), precision=_HI))


def page_scores(q: jnp.ndarray, k_max: jnp.ndarray, k_min: jnp.ndarray,
                group_agg: str = "max") -> jnp.ndarray:
    """Criticality scores per KV head.

    Args:
      q: [B, Hq, D] current decode query (un-scaled; scores are only
         used for ranking within a head so the softmax scale is moot).
      k_max/k_min: [B, Hkv, P, D] per-page metadata.
      group_agg: how to combine scores of the Hq//Hkv query heads that
         share a KV head ("max" | "sum").

    Returns:
      [B, Hkv, P] f32 scores.
    """
    scores = _group_scores(q, k_max, k_min)
    if group_agg == "max":
        return scores.max(axis=2)
    elif group_agg == "sum":
        return scores.sum(axis=2)
    raise ValueError(f"unknown group_agg {group_agg!r}")


def page_scores_per_qhead(q: jnp.ndarray, k_max: jnp.ndarray,
                          k_min: jnp.ndarray) -> jnp.ndarray:
    """Un-aggregated scores [B, Hq, P] (used by the accuracy-simulation
    path, mirroring `/root/reference/evaluation/quest_attention.py`)."""
    B, Hq, _ = q.shape
    return _group_scores(q, k_max, k_min).reshape(B, Hq, -1)


def page_scores_physical(q: jnp.ndarray, k_max_l: jnp.ndarray,
                         k_min_l: jnp.ndarray, block_tab: jnp.ndarray,
                         group_agg: str = "max",
                         per_q_head: bool = False) -> jnp.ndarray:
    """Criticality scores over the PHYSICAL pool, gathered per slot.

    The serving path's estimate (kv/paged_kv.py keys metadata by
    physical page so prefix-shared blocks carry it across slots):

      1. score every physical page once for the whole batch — two MXU
         matmuls over the contiguous ``[Hkv, NP, D]`` metadata (the
         same sign-split as :func:`page_scores`); the metadata HBM
         stream is read ONCE regardless of batch size. FLOP scaling
         caveat: every batch element scores the WHOLE pool, so with a
         full per-slot reservation (NP ~ B*P) the matmul flops grow as
         ~B^2*P — at B=8/128K-ctx/GQA-8 that is ~2.2 GFLOP/step,
         ~11 us of MXU time, still far below the gather stream, and
         the alternative (per-slot gathered metadata) re-reads the
         metadata stream B times; revisit only if serving batches grow
         well past B~16 with full reservations (then: score only the
         pool slab spanned by live block-table entries);
      2. gather each slot's logical scores through its block table — a
         tiny ``[B, H, P]`` f32 gather (256 KB at 32K/32 heads), three
         orders of magnitude below the metadata stream.

    Args:
      q: [B, Hq, D] current decode query (un-scaled).
      k_max_l/k_min_l: [Hkv, NPB, bpp, D] one layer's physical-block
        metadata (``cache.k_max[layer]``).
      block_tab: [B, NB] physical block per logical block.
      group_agg: GQA group combine ("max" | "sum"); ignored per_q_head.
      per_q_head: un-aggregated [B, Hq, P] output (reference-faithful
        per-query-head selection).

    Returns: [B, Hkv, P] f32 scores ([B, Hq, P] when per_q_head).
    """
    Hkv, NPB, bpp, D = k_max_l.shape
    NP = NPB * bpp
    B, Hq, _ = q.shape
    G = Hq // Hkv
    km = k_max_l.reshape(Hkv, NP, D).astype(jnp.float32)
    kn = k_min_l.reshape(Hkv, NP, D).astype(jnp.float32)
    qf = q.astype(jnp.float32).reshape(B, Hkv, G, D)
    s = (jnp.einsum("bkgd,kpd->bkgp", jnp.maximum(qf, 0.0), km,
                    precision=_HI)
         + jnp.einsum("bkgd,kpd->bkgp", jnp.minimum(qf, 0.0), kn,
                      precision=_HI))                    # [B, Hkv, G, NP]
    if per_q_head:
        s = s.reshape(B, Hq, NP)
    elif group_agg == "max":
        s = s.max(axis=2)
    elif group_agg == "sum":
        s = s.sum(axis=2)
    else:
        raise ValueError(f"unknown group_agg {group_agg!r}")
    H = s.shape[1]
    NB = block_tab.shape[1]
    # Step 2 as a BLOCK-granular one-hot contraction, NOT a gather:
    # take_along_axis along the minor score axis lowers to a
    # pathological elementwise gather on TPU — measured 350-400 us for
    # a 139 KB gather at 32K (exp/r4_chip/physpipe_probe.log), 4x the
    # whole rest of the pipeline. The one-hot matmul is exact (0/1
    # weights at HIGHEST precision), static-shape, and trivial MXU
    # work (B*H*NB*bpp*NPB MACs ~ 0.5 MFLOP at 32K).
    sel = jax.nn.one_hot(block_tab, NPB, dtype=s.dtype)  # [B, NB, NPB]
    s_log = jnp.einsum("bhNp,bnN->bhnp", s.reshape(B, H, NPB, bpp), sel,
                       precision=_HI)
    return s_log.reshape(B, H, NB * bpp)


# ---------------------------------------------------------------------------
# Pallas streaming estimate — same math as page_scores, but the min/max
# arrays stream through VMEM in large page blocks (the XLA einsum
# measured ~540 GB/s; the memory-bound floor is ~41 us at 32K). Group
# aggregation happens in-kernel so only [B, Hkv, P] scores leave.
# ---------------------------------------------------------------------------

def _est_kernel(G: int, agg: str, q_ref, kmax_ref, kmin_ref, o_ref):
    qc = q_ref[0, 0]                       # [2*Gp, D]: rows 0..Gp relu(q),
    Gp = qc.shape[0] // 2                  # rows Gp.. min(q, 0)
    D = qc.shape[1]
    # fp8 metadata streams at compressed width; upcast to the (bf16)
    # query dtype post-load so the MXU sees a uniform operand pair.
    kmax = upcast_fp8(kmax_ref[...].reshape(-1, D), qc.dtype)  # [bp, D]
    kmin = upcast_fp8(kmin_ref[...].reshape(-1, D), qc.dtype)
    s = (jax.lax.dot_general(qc[:Gp], kmax, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
         + jax.lax.dot_general(qc[Gp:], kmin, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32))
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    if agg == "max":
        s = jnp.where(row < G, s, -1e30)
        o_ref[0, 0, 0] = jnp.max(s, axis=0)
    else:
        s = jnp.where(row < G, s, 0.0)
        o_ref[0, 0, 0] = jnp.sum(s, axis=0)


@functools.partial(jax.jit, static_argnames=("group_agg", "block_p",
                                             "interpret", "layer"))
def page_scores_kernel(q, k_max, k_min, group_agg: str = "max",
                       block_p: int = 1024,
                       interpret: bool | None = None,
                       layer: int | None = None):
    """Pallas-streamed criticality scores; same contract as
    ``page_scores`` (logical batch-dense [B, Hkv, P, D] operands).
    ``layer`` additionally accepts stacked [L, B, Hkv, P, D] arrays
    (zero-copy read of one layer). Standalone op for benches/probes —
    the serving path uses the XLA einsum (page_scores_physical) which
    composes better with the sparse-decode custom call, and the
    engine's cache stores metadata physical-block-keyed
    (kv/paged_kv.py), not in this op's logical layout."""
    if interpret is None:
        interpret = use_interpret()
    B, Hq, D = q.shape
    shp = k_max.shape if layer is None else k_max.shape[1:]
    _, Hkv, P, _ = shp
    G = Hq // Hkv
    Gp = round_up(G, 16)

    qf = q.astype(jnp.float32).reshape(B, Hkv, G, D)
    qf = jnp.pad(qf, ((0, 0), (0, 0), (0, Gp - G), (0, 0)))
    # Sub-bf16 metadata (fp8 serving config) must not also quantize the
    # QUERY: the einsum path upcasts both operands to f32, so keep q at
    # bf16 here to stay within ~the metadata's own rounding error.
    qdt = (k_max.dtype if jnp.dtype(k_max.dtype).itemsize >= 2
           else jnp.bfloat16)
    qc = jnp.concatenate([jnp.maximum(qf, 0.0), jnp.minimum(qf, 0.0)],
                         axis=2).astype(qdt)           # [B, Hkv, 2Gp, D]

    # Mosaic requires the output block's lane dim be a 128-multiple or
    # the whole axis: pick the largest 128-multiple divisor of P, else
    # stream the whole page axis in one block (e.g. P=1088 = 128*8.5
    # has none; a 1088-page block is ~278 KB of VMEM per operand).
    cands = [d for d in range(128, min(block_p, P) + 1, 128)
             if P % d == 0]
    bp = max(cands) if cands else P
    nb = P // bp

    def kv_index(b, h, j):
        if layer is None:
            return (b, h, j, 0)
        return (layer, b, h, j, 0)

    kv_block = (1, 1, bp, D) if layer is None else (1, 1, 1, bp, D)

    out = pl.pallas_call(
        functools.partial(_est_kernel, G, group_agg),
        grid=(B, Hkv, nb),
        in_specs=[
            pl.BlockSpec((1, 1, 2 * Gp, D), lambda b, h, j: (b, h, 0, 0)),
            pl.BlockSpec(kv_block, kv_index),
            pl.BlockSpec(kv_block, kv_index),
        ],
        # Unit axis before P: Mosaic wants the output block's trailing
        # two dims tileable — (1, bp) with the 1 equal to the array dim.
        out_specs=pl.BlockSpec((1, 1, 1, bp), lambda b, h, j: (b, h, 0, j)),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, 1, P), jnp.float32),
        interpret=interpret,
    )(qc, k_max, k_min)
    return out[:, :, 0]
