"""Config validation guards.

VERDICT r4 #5: the measured-bad corners (fused megakernel + fp8
operands — see docs/decode_pipeline_perf.md and BENCH_r04.json's
fused_fp8 rows) must be unreachable by accident. QuestConfig refuses
them at construction; the model's fused gate (models/llama.py)
degrades unsupported block_pages geometries to the unfused pipeline
instead of tripping fused_decode's trace-time asserts (ADVICE r4).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from quest_tpu.config import (ModelConfig, QuestConfig,
                              serving_quest_config)


def test_fused_fp8_metadata_refused():
    with pytest.raises(ValueError, match="anti-config"):
        QuestConfig(fused_decode=True, meta_dtype=jnp.float8_e4m3fn)


def test_fused_fp8_kv_refused():
    # (meta_dtype=None resolves to the fp8 kv_dtype, so the metadata
    # guard fires first; either message refuses the combination.)
    with pytest.raises(ValueError, match="fused_decode"):
        QuestConfig(fused_decode=True, kv_dtype=jnp.float8_e4m3fn)
    with pytest.raises(ValueError, match="fp8 KV"):
        QuestConfig(fused_decode=True, kv_dtype=jnp.float8_e4m3fn,
                    meta_dtype=jnp.bfloat16)


def test_fused_bf16_ok():
    cfg = QuestConfig(fused_decode=True)
    assert cfg.resolved_meta_dtype == jnp.bfloat16


def test_budget_below_page_refused():
    with pytest.raises(ValueError, match="token_budget"):
        QuestConfig(page_size=32, token_budget=16)


def test_serving_config_cannot_reach_fused_fp8():
    # The serving preset uses fp8 metadata; flipping fused_decode on it
    # must refuse rather than silently run the anti-config.
    cfg = serving_quest_config(max_seq_len=32768)
    assert jnp.dtype(cfg.resolved_meta_dtype).itemsize == 1
    with pytest.raises(ValueError, match="anti-config"):
        dataclasses.replace(cfg, fused_decode=True)


def test_fused_gate_falls_back_on_incompatible_block_pages():
    """block_pages=96 violates fused_decode's 64-page lane-quantum
    divisibility; the model gate must route to the unfused pipeline
    (previously: trace-time AssertionError inside fused_sparse_decode)."""
    from quest_tpu.kv.paged_kv import init_cache
    from quest_tpu.models.llama import QuestModel

    model_cfg = ModelConfig(
        vocab_size=64, hidden_size=256, intermediate_size=512,
        num_layers=1, num_heads=2, num_kv_heads=2, head_dim=128,
        max_position_embeddings=8192)
    quest = QuestConfig(page_size=16, token_budget=256, max_seq_len=4096,
                        fused_decode=True, block_pages=96)
    assert quest.max_pages % 96 == 0 and quest.max_pages >= 128
    cache = init_cache(model_cfg, quest, batch_size=1, num_layers=1)
    # Pretend 40 tokens are cached; garbage pool data is fine for a
    # smoke trace (all-finite zeros).
    cache = dataclasses.replace(
        cache, seq_lens=jnp.asarray([40], jnp.int32))
    m = QuestModel(model_cfg, quest)
    q = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((1, 2, 128)).astype(np.float32))
    out = m._attn_decode(q, cache, layer=0, use_sparse=True,
                         seq_lens=cache.seq_lens)
    assert out.shape == (1, 2, 128)
    assert np.isfinite(np.asarray(out)).all()
