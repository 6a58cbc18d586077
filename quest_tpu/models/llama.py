"""Llama/Mistral-family decoder in JAX with Quest sparse decode.

Reference counterpart: the forked HF model + QuestAttention
(`/root/reference/quest/models/llama.py`,
`/root/reference/quest/models/QuestAttention.py:56-180`). TPU-first
redesign:

  * Pure-functional params pytree with **stacked layer weights** so the
    whole network is one `lax.scan` over layers — one compiled layer
    body instead of 32 unrolled ones.
  * The per-layer KV cache slices ride the scan's xs/ys, so cache
    updates are expressed functionally and XLA keeps them in-place via
    buffer donation (the reference instead mutates a global pool and
    re-uploads index tensors from the host every step,
    `controller.py:80-129`).
  * Layer-skip (first `skip_layers` layers always dense,
    `llama.py:537-538,427-439`) is a per-layer boolean in the scan xs
    feeding a `lax.cond` — no budget-swapping choreography.
  * Decode always runs estimate→top-k→sparse for non-skip layers; when
    the sequence has fewer pages than the budget the selection contains
    every page, which reproduces dense attention exactly (the
    reference's `need_estimate()` dense fallback,
    `QuestAttention.py:125-133`, with no second code path).
  * Batched (B≥1) and GQA-general from day one — the reference kernel
    path asserts bsz==1 and MHA (`QuestAttention.py:68`,
    `decode_handler.cuh:83`).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from quest_tpu.config import ModelConfig, QuestConfig
from quest_tpu.kv.paged_kv import (PagedKVCache, append_decode_at,
                                   append_prefill_at)
from quest_tpu.models.quantize import qdot
from quest_tpu.ops.dense_decode import dense_decode_attention
from quest_tpu.ops.estimate import page_scores_physical
from quest_tpu.ops.fused_decode import fused_sparse_decode
from quest_tpu.ops.prefill import prefill_attention
from quest_tpu.ops.rms_norm import rms_norm
from quest_tpu.ops.rope import apply_rope, compute_rope_params
from quest_tpu.ops.sparse_decode import sparse_decode_attention
from quest_tpu.ops.topk import select_pages

Params = Dict[str, Any]


def init_params(cfg: ModelConfig, key: jax.Array,
                dtype=None, linear_wrap=None) -> Params:
    """Random-initialized params (testing / benchmarking).

    ``linear_wrap(name, w) -> leaf`` is applied to every linear weight
    AT CREATION, one tensor at a time — with a quantizing wrap the bf16
    tensor is freed immediately, so full-size (32-layer) models
    initialize pre-quantized on device without ever materializing the
    ~16 GB bf16 pytree in HBM (models/quantize.py:
    init_params_quantized); a host->device push of the weights is not
    an option here (bulk transfer through remote dispatch measured
    <2 MB/s)."""
    dtype = dtype or cfg.dtype
    lw = linear_wrap or (lambda name, w: w)
    L, H, Hkv, D = cfg.num_layers, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    hid, inter, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    ks = jax.random.split(key, 10)

    def norm_init(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32)
                / math.sqrt(fan_in)).astype(dtype)

    def stacked(name, k, per_shape, fan_in):
        """[L, *per_shape] stacked weight, wrapped per LAYER under jit.

        With a quantizing wrap the live transient is one LAYER's f32
        tensor (fused normal->scale->quantize program), not the whole
        stack: the r5 32-layer e2e OOM'd at init because the eager
        stacked chain held [L, hid, inter] f32 TWICE (normal + the
        division result, ~15 GB at L=32) before quantization ever ran.
        Without a wrap, one fused jit builds the stack directly.
        """
        if linear_wrap is None:
            return norm_init(k, (L,) + per_shape, fan_in)
        mk = jax.jit(lambda kk: lw(name, norm_init(kk, per_shape,
                                                   fan_in)))
        ws = [mk(kk) for kk in jax.random.split(k, L)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *ws)

    params = {
        "embed": jax.jit(
            lambda kk: norm_init(kk, (V, hid), 1.0) * 0.02)(ks[0]),
        "layers": {
            "wq": stacked("wq", ks[1], (hid, H * D), hid),
            "wk": stacked("wk", ks[2], (hid, Hkv * D), hid),
            "wv": stacked("wv", ks[3], (hid, Hkv * D), hid),
            "wo": stacked("wo", ks[4], (H * D, hid), H * D),
            "w_gate": stacked("w_gate", ks[5], (hid, inter), hid),
            "w_up": stacked("w_up", ks[6], (hid, inter), hid),
            "w_down": stacked("w_down", ks[7], (inter, hid), inter),
            "ln_attn": jnp.ones((L, hid), dtype),
            "ln_mlp": jnp.ones((L, hid), dtype),
        },
        "final_norm": jnp.ones((hid,), dtype),
        "lm_head": jax.jit(
            lambda kk: lw("lm_head", norm_init(kk, (hid, V), hid)))(ks[8]),
    }
    return params


@dataclasses.dataclass(frozen=True)
class QuestModel:
    """Static model+engine configuration bound to forward functions.

    When ``tp_axis`` is set the model runs *inside* a ``shard_map`` over
    that mesh axis: ``cfg`` then describes the per-shard slice (local
    head counts), attention/MLP outputs are all-reduced over the axis
    (Megatron TP), and vocab-sharded logits are all-gathered. Quest's
    estimate/top-k/sparse-attention need no collectives at all — page
    selection is per KV head and heads are shard-local (parallel/mesh.py).
    """

    cfg: ModelConfig
    quest: QuestConfig
    tp_axis: str | None = None

    def _maybe_psum(self, x):
        if self.tp_axis is not None:
            return jax.lax.psum(x, self.tp_axis)
        return x

    # ------------------------------------------------------------------
    def _rope(self):
        return compute_rope_params(self.cfg.rope, self.cfg.head_dim)

    def _apply_rope(self, x, positions):
        """x: [B, T, H, D]; positions: [B, T]."""
        inv_freq, pos_scale, attn_scale = self._rope()
        return apply_rope(x, positions, inv_freq, pos_scale, attn_scale)

    # ------------------------------------------------------------------
    def _attn_decode(self, q, cache: PagedKVCache, layer: int,
                     use_sparse: bool, seq_lens):
        """q: [B, Hq, D]; reads layer ``layer`` (static) of the pool.
        Returns [B, Hq, D] f32. ``use_sparse`` is a static Python bool
        (the layer-skip rule is known at trace time), so there is no
        lax.cond — the reference's budget-swap choreography
        (`llama.py:427-439`) compiles away entirely."""
        cfg, quest = self.cfg, self.quest
        sm = 1.0 / math.sqrt(cfg.head_dim)

        # Fused path gates: per-KV-head selection; pool large enough to
        # stream in >= 2 lane-multiple blocks; budget small enough that
        # the whole-selection gather ring fits VMEM (ring = 2 slots x
        # page_budget pages x 8 KB; 256 pages = 4 MB). The shared-pool
        # metadata stream additionally needs block_pages compatible
        # with the 64-page lane quantum and the pool a >=2x multiple of
        # max(64, block_pages) — mirrored from fused_decode's own
        # constraints so an incompatible block_pages (e.g. 96) degrades
        # here instead of tripping a trace-time assert. Everything else
        # falls back to the 3-call pipeline, which has no such limits.
        bpp = cache.block_pages
        fq = max(64, bpp)
        if (use_sparse and quest.fused_decode
                and quest.selection == "per_kv_head"
                and cache.max_pages >= 128
                and (64 % bpp == 0 or bpp % 64 == 0)
                and cache.max_pages % fq == 0
                and cache.max_pages >= 2 * fq
                and quest.page_budget <= 256):
            # select_group must divide the (possibly TP-sharded local)
            # KV-head count and be a power of two (butterfly band
            # reductions): clamp the configured value down.
            sg = 1
            while (sg * 2 <= quest.fused_select_group
                   and cfg.num_kv_heads % (sg * 2) == 0):
                sg *= 2
            with jax.named_scope("quest_fused_decode"):
                return fused_sparse_decode(
                    q, cache.kv_pages, cache.k_max, cache.k_min,
                    seq_lens, sm_scale=sm,
                    budget_pages=quest.page_budget,
                    group_agg=quest.group_agg, layer=layer,
                    select_group=sg,
                    block_p=quest.fused_block_p,
                    gather_slots=quest.fused_gather_slots,
                    block_tab=cache.block_tab,
                    block_pages=cache.block_pages)
        if use_sparse:
            per_q = quest.selection == "per_q_head"
            with jax.named_scope("quest_estimate"):
                # XLA einsum, NOT ops.estimate.page_scores_kernel: the
                # Pallas variant wins standalone (~51 vs 64 us) but
                # composed with the sparse-attention custom call it
                # costs ~+180 us (operand copies between custom calls).
                # Scores the physical pool once for the whole batch,
                # then gathers per-slot logical scores (metadata is
                # physical-page-keyed; per_q_head is the
                # reference-faithful per-QUERY-head selection,
                # `/root/reference/quest/utils/controller.py:106,119`).
                scores = page_scores_physical(
                    q, cache.k_max[layer], cache.k_min[layer],
                    cache.block_tab, group_agg=quest.group_agg,
                    per_q_head=per_q)
            with jax.named_scope("quest_topk"):
                idx, num_valid = select_pages(scores, seq_lens,
                                              quest.page_size,
                                              quest.page_budget,
                                              method=quest.topk_method)
            with jax.named_scope("quest_sparse_attn"):
                # sorted_selection: select_pages sorts by page id, so
                # the forced current page sits at slot num_valid-1.
                return sparse_decode_attention(
                    q, cache.kv_pages, idx, num_valid, seq_lens,
                    sm_scale=sm, layer=layer, per_q_head=per_q,
                    block_tab=cache.block_tab,
                    block_pages=cache.block_pages,
                    sorted_selection=True)
        with jax.named_scope("dense_decode_attn"):
            return dense_decode_attention(q, cache.kv_pages, seq_lens,
                                          sm_scale=sm, layer=layer,
                                          block_tab=cache.block_tab,
                                          block_pages=cache.block_pages,
                                          max_pages=cache.max_pages)

    # ------------------------------------------------------------------
    def _layer(self, x, lp, cache: PagedKVCache, layer: int,
               use_sparse: bool, positions, is_prefill: bool, new_lens):
        """One transformer layer over the whole-model pool (static layer
        index — appends are in-place token writes, attention kernels
        read the persistent buffer; no per-layer slicing or stacking).
        x: [B, T, hid]. Returns (x, cache)."""
        cfg = self.cfg
        B, T, hid = x.shape
        H, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        sm = 1.0 / math.sqrt(D)

        # named_scope = the NVTX-range analogue
        # (`/root/reference/quest/models/QuestAttention.py:87-169`);
        # scopes show up in jax.profiler / XProf traces.
        with jax.named_scope("qkv_proj"):
            h = rms_norm(x, lp["ln_attn"], cfg.rms_norm_eps)
            q = qdot(h, lp["wq"]).reshape(B, T, H, D)
            k = qdot(h, lp["wk"]).reshape(B, T, Hkv, D)
            v = qdot(h, lp["wv"]).reshape(B, T, Hkv, D)
        with jax.named_scope("rope"):
            q = self._apply_rope(q, positions)
            k = self._apply_rope(k, positions)

        if is_prefill:
            with jax.named_scope("append_kv_prefill"):
                cache = append_prefill_at(cache, layer, k, v,
                                          new_lens=new_lens)
            seq_new = cache.seq_lens + new_lens
            with jax.named_scope("prefill_attn"):
                attn = prefill_attention(q, cache.kv_pages,
                                         cache.seq_lens, seq_new,
                                         sm_scale=sm, layer=layer,
                                         block_tab=cache.block_tab,
                                         block_pages=cache.block_pages,
                                         max_pages=cache.max_pages)
        else:
            with jax.named_scope("append_kv_decode"):
                # Inactive slots (new_lens==0) must not fold their
                # garbage key into the page metadata (the data write
                # itself lands in the garbage region and is harmless).
                cache = append_decode_at(cache, layer, k[:, 0], v[:, 0],
                                         active=new_lens > 0)
            seq_new = cache.seq_lens + 1
            attn = self._attn_decode(q[:, 0], cache, layer, use_sparse,
                                     seq_new)[:, None]

        with jax.named_scope("o_proj"):
            attn = attn.astype(x.dtype).reshape(B, T, H * D)
            x = x + self._maybe_psum(qdot(attn, lp["wo"]))
        with jax.named_scope("mlp"):
            h2 = rms_norm(x, lp["ln_mlp"], cfg.rms_norm_eps)
            mlp = qdot(jax.nn.silu(qdot(h2, lp["w_gate"]))
                       * qdot(h2, lp["w_up"]), lp["w_down"])
        return x + self._maybe_psum(mlp), cache

    # ------------------------------------------------------------------
    def _forward(self, params: Params, cache: PagedKVCache,
                 tokens: jnp.ndarray, is_prefill: bool,
                 new_lens: jnp.ndarray | None,
                 last_only: bool = False) -> Tuple[jnp.ndarray,
                                                   PagedKVCache]:
        cfg, quest = self.cfg, self.quest
        B, T = tokens.shape
        if new_lens is None:
            new_lens = jnp.full((B,), T, jnp.int32)
        x = params["embed"][tokens].astype(cfg.dtype)
        positions = cache.seq_lens[:, None] + jnp.arange(T)[None, :]

        # Layers are UNROLLED with static indices (not lax.scan): scan's
        # per-iteration xs/ys slicing forced whole-cache copies and
        # layout conversions around the Pallas custom calls (~1 full
        # cache copy per decode step, dominating long-context decode).
        # Static layer slices of the stacked weights fuse into their
        # matmuls; kernels across layers share one compiled binary.
        L = cache.kv_pages.shape[0]
        from quest_tpu.models.quantize import slice_layer
        for l in range(L):
            # slice_layer, not a blanket tree_map: quantized leaves
            # keep their packed q STACKED so qdot's hoisting barrier
            # wraps the full parameter (a barrier on a pre-sliced
            # operand copies the slice — 3x weight traffic, see qdot).
            lp = {k: slice_layer(v, l)
                  for k, v in params["layers"].items()}
            x, cache = self._layer(x, lp, cache, l,
                                   l >= quest.skip_layers, positions,
                                   is_prefill, new_lens)

        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        if last_only:
            # Project only each sequence's last real token: full-context
            # prefill logits are [B, T, V] — at 32K x 128K-vocab f32
            # that is ~17 GB, far beyond one chip's HBM.
            last = jnp.maximum(new_lens - 1, 0)                  # [B]
            x = jnp.take_along_axis(x, last[:, None, None], axis=1)
        # qdot (not an eager dequantize) so a quantized lm_head stays
        # packed until the matmul: its optimization_barrier ties the
        # weights to x, preventing XLA from hoisting a ~2 GB f32
        # [hid, V] dequant to program start (the OOM mode documented at
        # quantize.qdot).
        logits = qdot(x.astype(jnp.float32), params["lm_head"],
                      dtype=jnp.float32)
        if self.tp_axis is not None:  # vocab-sharded lm_head
            logits = jax.lax.all_gather(logits, self.tp_axis, axis=-1,
                                        tiled=True)
        new_cache = dataclasses.replace(
            cache, seq_lens=cache.seq_lens + new_lens)
        return logits, new_cache

    # Public steps ------------------------------------------------------
    def prefill(self, params: Params, cache: PagedKVCache,
                tokens: jnp.ndarray, new_lens: jnp.ndarray | None = None):
        """tokens: [B, T] (padded); returns (logits [B, T, V], cache)."""
        return self._forward(params, cache, tokens, True, new_lens)

    def prefill_last(self, params: Params, cache: PagedKVCache,
                     tokens: jnp.ndarray,
                     new_lens: jnp.ndarray | None = None):
        """Prefill returning logits only at each sequence's last real
        token: (logits [B, 1, V], cache). Use for generation — full
        [B, T, V] prefill logits do not fit HBM at long context."""
        return self._forward(params, cache, tokens, True, new_lens,
                             last_only=True)

    def decode_step(self, params: Params, cache: PagedKVCache,
                    tokens: jnp.ndarray,
                    active: jnp.ndarray | None = None):
        """tokens: [B]; returns (logits [B, V], cache).

        ``active`` [B] bool (optional): slots with ``active=False`` do
        not advance — their token is written into the garbage region at
        ``seq_len`` (overwritten by the slot's next real append) and
        ``seq_lens`` stays put. This is what lets a continuous-batching
        scheduler run one decode step over a partially-filled batch.
        """
        new_lens = None if active is None else active.astype(jnp.int32)
        logits, cache = self._forward(params, cache, tokens[:, None],
                                      False, new_lens)
        return logits[:, 0], cache

    def decode_token_step(self, params: Params, cache: PagedKVCache,
                          tokens: jnp.ndarray,
                          active: jnp.ndarray | None = None):
        """One greedy decode step returning the next token on device:
        tokens [B] -> (next_tokens [B], cache).

        The serving loop is a host loop of these donated dispatches with
        NO per-step host fetch — dispatches pipeline asynchronously, so
        the device runs back-to-back steps (measured 7.4 ms/token at 32K
        vs 38 ms for a lax.scan formulation, whose carried cache gets
        copied every iteration, and vs ~50 ms with a per-token fetch).
        ``active`` as in decode_step (continuous-batching bursts)."""
        logits, cache = self.decode_step(params, cache, tokens, active)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    def decode_token_burst(self, params: Params, cache: PagedKVCache,
                           tokens: jnp.ndarray, n: int,
                           active: jnp.ndarray | None = None):
        """``n`` greedy decode steps in ONE dispatch: tokens [B] ->
        (all_tokens [B, n], cache). ``n`` is static (unrolled — a
        lax.scan/fori carry of the cache gets copied every iteration,
        the round-1 38 ms/token failure mode; unrolled steps keep the
        pool in-place under donation).

        Rationale (exp/r5_chip/b1_floor.json): at batch 1 the host
        dispatch+append overhead of the per-token loop is ~1.2 ms/token
        against a 5.5 ms device step — an n-step burst amortizes it n-
        fold. Cost: program size scales with n*L (compile time), and
        generation length must be a multiple of n (callers round)."""
        outs = []
        for _ in range(n):
            tokens, cache = self.decode_token_step(params, cache,
                                                   tokens, active)
            outs.append(tokens)
        return jnp.stack(outs, axis=1), cache

    def decode_nll_step(self, params: Params, cache: PagedKVCache,
                        tokens: jnp.ndarray, targets: jnp.ndarray,
                        active: jnp.ndarray | None = None):
        """Teacher-forced decode step returning the negative log-likelihood
        of ``targets`` [B] under the step's logits: tokens [B] ->
        (nll [B] f32, cache). The eval-speed building block: a PG19-style
        token-by-token perplexity loop chains these asynchronously and
        fetches NLLs in bulk instead of pulling [B, V] logits through the
        host every token (the reference fetches logits per token,
        `/root/reference/evaluation/pg19/ppl_eval.py:85-100`)."""
        logits, cache = self.decode_step(params, cache, tokens, active)
        logits = logits.astype(jnp.float32)
        lse = jax.nn.logsumexp(logits, axis=-1)
        tgt = jnp.take_along_axis(logits, targets[:, None].astype(jnp.int32),
                                  axis=-1)[:, 0]
        return lse - tgt, cache

    def decode_sample_step(self, params: Params, cache: PagedKVCache,
                           tokens: jnp.ndarray, key: jax.Array,
                           temps: jnp.ndarray,
                           active: jnp.ndarray | None = None):
        """decode_token_step with on-device per-request sampling:
        rows with temps[b] > 0 draw from categorical(logits/temp), rows
        with temps[b] <= 0 take the argmax. Returns
        (next_tokens [B], new_key, cache) — the PRNG key is carried on
        device so sampled serving bursts need no host round-trip."""
        logits, cache = self.decode_step(params, cache, tokens, active)
        key, sub = jax.random.split(key)
        safe_t = jnp.where(temps > 0, temps, 1.0)[:, None]
        drawn = jax.random.categorical(
            sub, logits.astype(jnp.float32) / safe_t, axis=-1)
        greedy = jnp.argmax(logits, axis=-1)
        tok = jnp.where(temps > 0, drawn, greedy).astype(jnp.int32)
        return tok, key, cache
