"""Configuration dataclasses for quest-tpu.

The reference scatters configuration across hardcoded constants
(`/root/reference/quest/models/llama.py:536-538`: skip_layer=2,
max_page_limit, page budget derived from token budget) and argparse flags.
Here everything lives in two frozen dataclasses so the whole engine is
hashable/static under `jax.jit`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RopeConfig:
    """Rotary position embedding settings.

    Covers the model families the reference evaluates
    (`/root/reference/README.md:58`, `scripts/passkey.sh:3-4`):
      - plain llama2 / mistral (``scaling=None``)
      - LongChat-v1.5 linear PI (``scaling="linear"``,
        `/root/reference/quest/models/QuestAttention.py:46-49`)
      - Llama-3.1 frequency-banded scaling (``scaling="llama3"``)
      - Yarn-Llama-2 (``scaling="yarn"``)
    """

    theta: float = 10000.0
    scaling: Optional[str] = None  # None | "linear" | "llama3" | "yarn"
    factor: float = 1.0
    # llama3-specific
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_position_embeddings: int = 8192
    # yarn-specific
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    mscale: float = 1.0


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture of a Llama/Mistral-family decoder-only transformer."""

    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: int = 128
    rms_norm_eps: float = 1e-5
    rope: RopeConfig = dataclasses.field(default_factory=RopeConfig)
    tie_word_embeddings: bool = False
    max_position_embeddings: int = 32768
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def num_groups(self) -> int:
        assert self.num_heads % self.num_kv_heads == 0
        return self.num_heads // self.num_kv_heads


@dataclasses.dataclass(frozen=True)
class QuestConfig:
    """Engine (KV sparsity) settings.

    Mirrors the knobs of `quest_init()`
    (`/root/reference/quest/models/llama.py:520-552`) but with static
    shapes: ``page_budget`` page-slots are always materialized; when the
    sequence is shorter the extra slots are masked (the reference instead
    re-plans buffer sizes host-side every step,
    `/root/reference/quest/utils/controller.py:112-120`).
    """

    page_size: int = 16
    token_budget: int = 2048
    max_seq_len: int = 32768
    skip_layers: int = 2          # first N layers always run dense
    # How GQA groups combine page scores: "sum" | "max". Default "sum":
    # better in 7/8 cells of the selection-deviation study
    # (docs/gqa_selection.md) — sum approximates the group's total
    # score mass, max over-weights one head's bound. MHA is unaffected.
    group_agg: str = "sum"
    # Page-selection granularity: "per_kv_head" (default — the GQA
    # group shares one gathered page set; G-fold gather-bandwidth
    # reuse, and at EQUAL bandwidth strictly more accurate than
    # per-query-head selection at budget/G, docs/gqa_selection.md) or
    # "per_q_head" (reference-faithful
    # `/root/reference/quest/utils/controller.py:106,119`; each query
    # head gathers its own budget of pages at G x the HBM traffic).
    selection: str = "per_kv_head"
    kv_dtype: jnp.dtype = jnp.bfloat16
    # Storage dtype of the per-page min/max-Key metadata. None = same
    # as kv_dtype (paper-faithful). jnp.float8_e4m3fn halves the
    # estimate's HBM traffic (~1.5x faster estimate; ~2.6% relative
    # error on the criticality bound — ranking-only, so selection is
    # near-identical; see tests/test_estimate_topk.py).
    meta_dtype: Optional[object] = None
    # Top-K page selection: "exact" (lax.top_k) or "approx"
    # (lax.approx_max_k, ~3x faster on TPU). Approx is only sound when
    # every sequence's page count is far above the budget — see
    # ops/topk.py:select_pages for the failure mode on short rows.
    topk_method: str = "exact"
    # Run decode attention through the fused megakernel
    # (ops/fused_decode.py: estimate -> exact in-kernel top-k ->
    # gather -> flash decode in ONE Pallas call, overlapping the
    # metadata and gather DMA streams) instead of the 3-call pipeline.
    # Exact-selection semantics; requires per_kv_head selection and a
    # pool of >= 128 pages (models/llama.py gates and falls back).
    # DEMOTED (off by default, round 4): page_size=32 halves exactly
    # the streams fusion was built to overlap, and the measured fused
    # kernel then loses at every context length (32K: fused 243 us vs
    # unfused-p32 78-94; 128K: fused 403-413 vs serving-p32 < 274) —
    # the in-kernel radix select is real VPU/MXU work that the unfused
    # pipeline gets nearly free from XLA's tuned sort/PartialReduce.
    # Kept fully tested for pools where a single fused dispatch is
    # preferable; see docs/decode_pipeline_perf.md "Round-4 verdict".
    fused_decode: bool = False
    # Fused-kernel tuning (v5e chip sweep, exp/r3_chip: at 128K the
    # best measured config is SG=8/bp=1024 — 403 us vs dense 2857, the
    # context regime where the engine actually picks the fused path;
    # the model clamps select_group to the largest power of two
    # dividing the local KV-head count). block_p is the metadata pages
    # scored per grid step (lane width of the in-kernel score matrix).
    fused_select_group: int = 8
    fused_block_p: int = 1024
    fused_gather_slots: int = 3
    # Physical-pool allocation granularity, in pages. The shared data
    # pool (kv/paged_kv.py) is handed out in blocks of this many
    # CONTIGUOUS pages, so the per-slot page table is tiny
    # (max_pages/block_pages entries) and the dense/prefill kernels
    # stream whole blocks through one table lookup. 64 pages = 1024
    # tokens per block: at most one partially-used block per sequence.
    block_pages: int = 64

    def __post_init__(self):
        # Refuse measured anti-configs at construction (VERDICT r4 #5):
        # nothing downstream gates on dtype, so without this a user
        # could reach the fused kernel with fp8 operands by accident.
        meta = self.meta_dtype if self.meta_dtype is not None else self.kv_dtype
        if self.fused_decode and jnp.dtype(meta).itemsize < 2:
            raise ValueError(
                "fused_decode=True with sub-bf16 (fp8) metadata is a "
                "measured anti-config: the fused kernel's in-kernel "
                "fp8->bf16 upcast of the metadata stream has no native "
                "VPU path and runs ~2.6x SLOWER than bf16 metadata "
                "(1303.8 vs 501.0 us at 128K, BENCH_r04.json; root "
                "cause in docs/decode_pipeline_perf.md). Use the "
                "unfused pipeline (fused_decode=False) with fp8 "
                "metadata, or bf16 metadata with the fused kernel.")
        if self.fused_decode and jnp.dtype(self.kv_dtype).itemsize < 2:
            raise ValueError(
                "fused_decode=True does not support fp8 KV pages (the "
                "fused gather ring has no post-load upcast); use the "
                "unfused pipeline, whose kernels upcast fp8 pages "
                "after the DMA (ops/sparse_decode.py).")
        if self.token_budget < self.page_size:
            raise ValueError(
                f"token_budget={self.token_budget} below one page "
                f"({self.page_size}); the budget must cover at least "
                "the always-kept current page.")

    @property
    def resolved_meta_dtype(self):
        return self.meta_dtype if self.meta_dtype is not None else self.kv_dtype

    @property
    def page_budget(self) -> int:
        """Number of top-K page slots (includes the always-kept last page)."""
        return max(1, self.token_budget // self.page_size)

    @property
    def max_pages(self) -> int:
        """Per-sequence logical page-table size, rounded up to a
        multiple of the allocation block (>= 64 so the dense/prefill
        kernels' page-block tiling divides evenly; extra pages are never
        addressed; cost is <~3% of the logical space)."""
        p = (self.max_seq_len + self.page_size - 1) // self.page_size
        m = max(64, self.block_pages)
        return ((p + m - 1) // m) * m


def serving_quest_config(max_seq_len: int, token_budget: int = 2048,
                         **overrides) -> QuestConfig:
    """The measured-optimal SERVING configuration (v5e, round 4).

    Differences from the paper-faithful defaults, each backed by an
    on-chip A/B and an accuracy proxy (docs/decode_pipeline_perf.md,
    exp/r4_chip/page32_ab.log, scripts/accuracy_proxies.py):
      * page_size=32 — same token budget in half the pages: halves the
        metadata stream, halves the top-k input, gathers in 16 KB
        descriptors (~15% more DMA bandwidth). 32K exact pipeline:
        78-94 us vs 137-161 at page 16 (dense 717-726).
      * fp8 e4m3 metadata — halves the estimate's HBM traffic; proxy
        deltas <= 0.003 on every selection-quality metric.
      * verified-exact selection where its certificate is reliable,
        approx + per-row repair beyond (ops/topk.py:serving_method).
    Accuracy-critical deployments keep QuestConfig() defaults
    (page 16, bf16 metadata, exact top-k — the reference protocol).

    Capacity option: pass ``kv_dtype=jnp.float8_e4m3fn`` to halve the
    KV pool. As of round 5 (integer-ops in-kernel upcast,
    ops/pallas_utils.upcast_fp8) fp8 KV decodes at bf16 speed
    (full-depth llama31: 17.6 vs 17.4 ms/tok) and prefills 1.6x
    FASTER; accuracy deltas <= 0.005 on every selection proxy
    (exp/r5_chip/accuracy_proxies.json). Not the default because the
    fp8 data rounding does enter attention values (not just ranking).
    """
    import jax.numpy as jnp  # local: keep module import backend-free

    from quest_tpu.ops.topk import serving_method

    page = overrides.pop("page_size", 32)
    probe = QuestConfig(page_size=page, token_budget=token_budget,
                        max_seq_len=max_seq_len)
    return dataclasses.replace(
        probe,
        meta_dtype=overrides.pop("meta_dtype", jnp.float8_e4m3fn),
        topk_method=overrides.pop(
            "topk_method",
            serving_method(probe.max_pages, probe.page_budget)),
        **overrides)


# ---------------------------------------------------------------------------
# Presets for the models the reference evaluates.
# ---------------------------------------------------------------------------

def longchat_7b_v15_32k() -> ModelConfig:
    return ModelConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_layers=32, num_heads=32, num_kv_heads=32, head_dim=128,
        rms_norm_eps=1e-5, max_position_embeddings=32768,
        rope=RopeConfig(theta=10000.0, scaling="linear", factor=8.0),
    )


def yarn_llama2_7b_128k() -> ModelConfig:
    return ModelConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_layers=32, num_heads=32, num_kv_heads=32, head_dim=128,
        rms_norm_eps=1e-5, max_position_embeddings=131072,
        rope=RopeConfig(theta=10000.0, scaling="yarn", factor=32.0,
                        original_max_position_embeddings=4096),
    )


def llama31_8b() -> ModelConfig:
    return ModelConfig(
        vocab_size=128256, hidden_size=4096, intermediate_size=14336,
        num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
        rms_norm_eps=1e-5, max_position_embeddings=131072,
        rope=RopeConfig(theta=500000.0, scaling="llama3", factor=8.0,
                        low_freq_factor=1.0, high_freq_factor=4.0,
                        original_max_position_embeddings=8192),
    )


def mistral_7b_v03() -> ModelConfig:
    return ModelConfig(
        vocab_size=32768, hidden_size=4096, intermediate_size=14336,
        num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
        rms_norm_eps=1e-5, max_position_embeddings=32768,
        rope=RopeConfig(theta=1000000.0),
    )


def tiny_test_model(num_kv_heads: int = 4) -> ModelConfig:
    """Small config for unit tests (CPU-runnable)."""
    return ModelConfig(
        vocab_size=256, hidden_size=128, intermediate_size=352,
        num_layers=4, num_heads=4, num_kv_heads=num_kv_heads, head_dim=32,
        rms_norm_eps=1e-5, max_position_embeddings=4096,
        rope=RopeConfig(theta=10000.0),
    )


def small_tpu_model() -> ModelConfig:
    """Small config with TPU-tileable dims (head_dim 128) — smoke runs
    of the full stack on a real chip (the `tiny` preset's head_dim=32
    fails Mosaic's 128-lane tiling)."""
    return ModelConfig(
        vocab_size=2048, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=2, num_kv_heads=2, head_dim=128,
        rms_norm_eps=1e-5, max_position_embeddings=8192,
        rope=RopeConfig(theta=10000.0),
    )
