"""On-device generation loop (lax.scan over decode steps) must produce
exactly the same tokens as the per-step host loop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quest_tpu.config import ModelConfig, QuestConfig, RopeConfig
from quest_tpu.engine import QuestEngine
from quest_tpu.models.llama import init_params


@pytest.mark.slow
def test_ondevice_matches_host_loop():
    cfg = ModelConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      head_dim=16, rope=RopeConfig(), dtype=jnp.float32)
    quest = QuestConfig(page_size=8, token_budget=32, max_seq_len=256,
                        skip_layers=1, kv_dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 256, size=n).tolist() for n in (19, 11)]

    host = QuestEngine(cfg, quest, params, batch_size=2, prefill_bucket=16)
    want = host.generate(prompts, max_new_tokens=7)

    dev = QuestEngine(cfg, quest, params, batch_size=2, prefill_bucket=16)
    got = dev.generate_ondevice(prompts, max_new_tokens=7)
    assert got == want

    # EOS trimming
    eos = want[0][2]
    dev2 = QuestEngine(cfg, quest, params, batch_size=2, prefill_bucket=16)
    got2 = dev2.generate_ondevice(prompts, max_new_tokens=7,
                                  eos_token_id=eos)
    assert got2[0] == want[0][:3]


def test_decode_token_burst_matches_steps():
    """decode_token_burst(n) must produce exactly the tokens of n
    sequential decode_token_step calls (same cache evolution)."""
    cfg = ModelConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      head_dim=16, rope=RopeConfig(), dtype=jnp.float32)
    quest = QuestConfig(page_size=8, token_budget=32, max_seq_len=256,
                        skip_layers=1, kv_dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)
    rng = np.random.default_rng(1)
    prompts = [rng.integers(1, 256, size=n).tolist() for n in (19, 11)]

    a = QuestEngine(cfg, quest, params, batch_size=2, prefill_bucket=16)
    a.prefill(prompts)
    tok = jnp.asarray([3, 5], jnp.int32)
    want = []
    ca = a.cache
    for _ in range(6):
        tok, ca = a.model.decode_token_step(params, ca, tok)
        want.append(np.asarray(tok))

    b = QuestEngine(cfg, quest, params, batch_size=2, prefill_bucket=16)
    b.prefill(prompts)
    tok = jnp.asarray([3, 5], jnp.int32)
    got = []
    cb = b.cache
    bf = jax.jit(lambda p, c, t: b.model.decode_token_burst(p, c, t, 3),
                 donate_argnums=(1,))
    for _ in range(2):
        toks, cb = bf(params, cb, tok)
        got.extend(np.asarray(toks).T)
        tok = toks[:, -1]
    np.testing.assert_array_equal(np.stack(want), np.stack(got))
    np.testing.assert_array_equal(np.asarray(ca.seq_lens),
                                  np.asarray(cb.seq_lens))
