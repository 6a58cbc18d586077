"""Eval harness smoke tests with a tiny random model + toy tokenizer."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quest_tpu.config import ModelConfig, QuestConfig, RopeConfig
from quest_tpu.engine.engine import QuestEngine
from quest_tpu.evals.longbench_metrics import (classification_score,
                                               qa_f1_score, retrieval_score,
                                               rouge_l_score, score_task)
from quest_tpu.evals.passkey import build_passkey_prompt, evaluate_passkey
from quest_tpu.evals.perplexity import evaluate_perplexity
from quest_tpu.evals.sim_attention import quest_sim_attention
from quest_tpu.models.llama import init_params


class ToyTokenizer:
    """Byte-level tokenizer for smoke tests."""

    eos_token_id = 0

    def encode(self, text, add_special_tokens=True):
        return [1 + (b % 250) for b in text.encode()][:4000]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(max(32, i)) for i in ids)


def tiny_engine(budget=64, max_seq=2048):
    cfg = ModelConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=4, head_dim=16,
                      rope=RopeConfig(), dtype=jnp.float32)
    quest = QuestConfig(page_size=16, token_budget=budget,
                        max_seq_len=max_seq, skip_layers=1,
                        kv_dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return QuestEngine(cfg, quest, params, batch_size=1, prefill_bucket=64)


def test_perplexity_smoke():
    eng = tiny_engine()
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 256, size=120).tolist()
    ppl = evaluate_perplexity(eng, ids, num_eval_tokens=40,
                              warmup_prefill=16)
    assert math.isfinite(ppl) and ppl > 1.0
    # Random model on random tokens: ppl should be near vocab size.
    assert 20 < ppl < 4000


def test_score_ondevice_matches_per_token_loop():
    """The on-device teacher-forced NLL burst must reproduce the slow
    fetch-logits-per-token protocol exactly (same engine, f32)."""
    rng = np.random.default_rng(7)
    ids = rng.integers(1, 256, size=60).tolist()
    warm = 16

    eng = tiny_engine()
    logits = eng.prefill([ids[:warm]])
    slow = []
    for t in range(warm, len(ids)):
        x = logits[0] - logits[0].max()
        slow.append(float(np.log(np.exp(x).sum()) - x[ids[t]]))
        if t < len(ids) - 1:
            logits = eng.decode([ids[t]])

    eng2 = tiny_engine()
    logits = eng2.prefill([ids[:warm]])
    x = logits[0] - logits[0].max()
    first = float(np.log(np.exp(x).sum()) - x[ids[warm]])
    fast = [first] + eng2.score_ondevice(
        np.asarray([ids[warm:-1]]), np.asarray([ids[warm + 1:]]),
        sync_every=8)[0].tolist()
    np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-5)


def test_feed_and_greedy_ondevice_match_slow_loop():
    """feed_ondevice + greedy_ondevice (the eval serving path) must
    produce the same tokens as the per-token decode loop."""
    rng = np.random.default_rng(9)
    prompt = rng.integers(1, 256, size=40).tolist()
    question = rng.integers(1, 256, size=9).tolist()
    n_new = 6

    eng = tiny_engine()
    eng.prefill([prompt])
    logits = None
    for tid in question:
        logits = eng.decode([tid])
    slow = []
    for _ in range(n_new):
        nxt = int(logits[0].argmax())
        slow.append(nxt)
        logits = eng.decode([nxt])

    eng2 = tiny_engine()
    eng2.prefill([prompt])
    eng2.feed_ondevice([question[:-1]], sync_every=4)
    fast = eng2.greedy_ondevice([question[-1]], n_new,
                                sync_every=4)[0].tolist()
    assert fast == slow


def test_passkey_prompt_structure():
    ctx, question, key = build_passkey_prompt(2000, seed=3,
                                              depth_ratio=0.5)
    assert key in ctx and len(key) == 5
    assert "pass key" in question
    ctx2, _, key2 = build_passkey_prompt(2000, seed=3, depth_ratio=0.5)
    assert ctx2 == ctx and key2 == key  # deterministic per seed


def test_passkey_harness_runs():
    eng = tiny_engine(budget=64, max_seq=2048)
    tok = ToyTokenizer()
    res = evaluate_passkey(eng, tok, n_garbage=800, iterations=2,
                           max_new_tokens=3, depth_ratios=[0.5])
    assert res.total == 2
    assert 0.0 <= res.accuracy <= 1.0


def test_metrics():
    assert qa_f1_score("Paris", "paris") == 1.0
    assert qa_f1_score("the answer is Paris", "Paris") > 0
    assert qa_f1_score("London", "Paris") == 0.0
    assert rouge_l_score("a b c d", "a b c d") == 1.0
    assert 0 < rouge_l_score("a b x d", "a b c d") < 1.0
    assert retrieval_score("Paragraph 7", "Paragraph 7") == 1.0
    assert retrieval_score("Paragraph 3", "Paragraph 7") == 0.0
    # Fraction semantics (reference metrics.py:56-66): hedging across
    # several paragraph numbers scores the matching fraction, not 1.0.
    assert retrieval_score("Paragraph 7 or 3", "Paragraph 7") == 0.5
    assert retrieval_score("no numbers here", "Paragraph 7") == 0.0
    assert classification_score("label_a", "label_a",
                                ["label_a", "label_b"]) == 1.0
    s = score_task("qasper", ["Paris", "no"], [["paris"], ["yes"]])
    assert s == 50.0


def test_sim_attention_matches_dense_when_budget_full():
    rng = np.random.default_rng(1)
    B, H, T, D = 1, 2, 37, 16
    q = jnp.asarray(rng.standard_normal((B, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
    sm = 1 / math.sqrt(D)
    out = quest_sim_attention(q, k, v, token_budget=10_000, chunk_size=16,
                              sm_scale=sm)
    # full budget -> all chunks kept -> plain softmax attention
    s = jnp.einsum("bhd,bhtd->bht", q, k) * sm
    p = jax.nn.softmax(s, axis=-1)
    want = jnp.einsum("bht,bhtd->bhd", p, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_sim_attention_selects_heavy_chunk():
    """A chunk holding a huge-score key must survive selection."""
    rng = np.random.default_rng(2)
    B, H, T, D, chunk = 1, 1, 64, 16, 16
    q = jnp.ones((B, H, D), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32)) * 0.01
    v = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
    k = k.at[0, 0, 40].set(5.0)  # heavy hitter in chunk 2
    out = quest_sim_attention(q, k, v, token_budget=48, chunk_size=chunk,
                              sm_scale=1 / math.sqrt(D))
    # heavy key dominates: output ~ its value
    np.testing.assert_allclose(np.asarray(out[0, 0]),
                               np.asarray(v[0, 0, 40]), atol=0.2)


def test_longbench_all_tasks_have_prompts_and_metrics():
    """Every scorable task has a prompt + maxlen and vice versa — all 21
    LongBench tasks (`/root/reference/evaluation/LongBench/config/
    dataset2prompt.json`, `eval.py:18-40`)."""
    from quest_tpu.evals.longbench import TASK_MAXLEN, TASK_PROMPTS
    from quest_tpu.evals.longbench_metrics import TASK_METRICS

    assert len(TASK_PROMPTS) == 21
    assert set(TASK_PROMPTS) == set(TASK_MAXLEN)
    assert set(TASK_METRICS) == set(TASK_PROMPTS)
    for task, tpl in TASK_PROMPTS.items():
        assert "{context}" in tpl, task


def test_zh_metrics():
    from quest_tpu.evals.longbench_metrics import (qa_f1_zh_score,
                                                   retrieval_zh_score,
                                                   rouge_zh_score)
    assert qa_f1_zh_score("北京是中国的首都", "中国的首都是北京") > 0.9
    assert qa_f1_zh_score("完全不同", "毫无关联答案") < 0.3
    assert rouge_zh_score("会议讨论了预算", "会议讨论了明年的预算") > 0.7
    assert retrieval_zh_score("答案是段落3", "段落3") == 1.0
    assert retrieval_zh_score("答案是段落4", "段落3") == 0.0
    assert retrieval_zh_score("段落3或段落5", "段落3") == 0.5
