"""Multi-device sharding: sharded forward == single-device forward.

Runs on the 8-device virtual CPU mesh (conftest). The reference has no
distributed tests at all (SURVEY.md §4); this is new coverage required
by the north star.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quest_tpu.config import ModelConfig, QuestConfig, RopeConfig
from quest_tpu.engine.engine import QuestEngine
from quest_tpu.kv.paged_kv import init_cache
from quest_tpu.models.llama import QuestModel, init_params
from quest_tpu.parallel import (make_mesh, make_sharded_fns,
                                init_sharded_cache, shard_params)


def make_cfg():
    return ModelConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                       num_layers=2, num_heads=8, num_kv_heads=4,
                       head_dim=16, rope=RopeConfig(), dtype=jnp.float32)


@pytest.mark.parametrize("dp,tp", [(1, 4), (2, 2), (2, 4)])
def test_sharded_matches_single_device(dp, tp):
    cfg = make_cfg()
    quest = QuestConfig(page_size=8, token_budget=32, max_seq_len=128,
                        skip_layers=1, kv_dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    B = max(2, dp)
    rng = np.random.default_rng(0)
    toks = rng.integers(0, 256, size=(B, 24)).astype(np.int32)
    lens = np.full((B,), 24, np.int32)

    # Single-device reference
    model = QuestModel(cfg, quest)
    cache0 = init_cache(cfg, quest, B)
    logits0, cache0 = model.prefill(params, cache0, jnp.asarray(toks),
                                    jnp.asarray(lens))
    dec0, cache0 = model.decode_step(params, cache0,
                                     jnp.asarray([3] * B, jnp.int32))

    # Sharded
    mesh = make_mesh(dp, tp)
    prefill_fn, decode_fn = make_sharded_fns(cfg, quest, mesh)
    sparams = shard_params(params, mesh)
    cache = init_sharded_cache(cfg, quest, mesh, B)
    logits, cache = prefill_fn(sparams, cache, jnp.asarray(toks),
                               jnp.asarray(lens))
    dec, cache = decode_fn(sparams, cache, jnp.asarray([3] * B, jnp.int32))

    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(dec0),
                               rtol=2e-4, atol=2e-4)
    assert np.asarray(cache.seq_lens).tolist() == [25] * B


def test_sharded_multi_step_decode():
    """Several decode steps under the mesh keep matching."""
    cfg = make_cfg()
    quest = QuestConfig(page_size=8, token_budget=16, max_seq_len=128,
                        skip_layers=1, kv_dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    mesh = make_mesh(2, 4)
    B = 2
    rng = np.random.default_rng(1)
    toks = rng.integers(0, 256, size=(B, 40)).astype(np.int32)
    lens = np.full((B,), 40, np.int32)

    model = QuestModel(cfg, quest)
    cache0 = init_cache(cfg, quest, B)
    _, cache0 = model.prefill(params, cache0, jnp.asarray(toks),
                              jnp.asarray(lens))
    prefill_fn, decode_fn = make_sharded_fns(cfg, quest, mesh)
    sparams = shard_params(params, mesh)
    cache = init_sharded_cache(cfg, quest, mesh, B)
    _, cache = prefill_fn(sparams, cache, jnp.asarray(toks),
                          jnp.asarray(lens))

    for step in range(3):
        t = jnp.asarray([step + 1, step + 7], jnp.int32)
        d0, cache0 = model.decode_step(params, cache0, t)
        d, cache = decode_fn(sparams, cache, t)
        np.testing.assert_allclose(np.asarray(d), np.asarray(d0),
                                   rtol=2e-4, atol=2e-4)
