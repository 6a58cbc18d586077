"""Weight-only int8/int4 quantization.

New capability mirroring the reference's AWQ 4-bit path (its 2.23x e2e
configuration, `/root/reference/README.md:102`) — here as TPU-friendly
weight-only quantization fused into the matmuls.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quest_tpu.config import ModelConfig, QuestConfig, RopeConfig
from quest_tpu.engine import QuestEngine
from quest_tpu.models.llama import init_params
from quest_tpu.models.quantize import (dequantize_weight, qdot,
                                       quantize_params, quantize_weight)


@pytest.mark.parametrize("bits,tol", [(8, 0.01), (4, 0.15)])
def test_roundtrip_error(bits, tol):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((3, 64, 32)).astype(np.float32))
    qw = quantize_weight(w, bits)
    back = dequantize_weight(qw, jnp.float32)
    scale = np.abs(np.asarray(w)).max(axis=1, keepdims=True)
    err = np.abs(np.asarray(back) - np.asarray(w)) / scale
    assert err.max() < tol


@pytest.mark.parametrize("bits", [8, 4])
def test_qdot_matches_dequant_matmul(bits):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((5, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    qw = quantize_weight(w, bits)
    got = qdot(x, qw)
    want = x @ dequantize_weight(qw, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # plain passthrough
    np.testing.assert_allclose(np.asarray(qdot(x, w)), np.asarray(x @ w),
                               rtol=1e-6)


@pytest.mark.parametrize("bits", [8, 4])
def test_quantized_model_generates_close_to_full(bits):
    cfg = ModelConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=4,
                      head_dim=16, rope=RopeConfig(), dtype=jnp.float32)
    quest = QuestConfig(page_size=8, token_budget=64, max_seq_len=256,
                        skip_layers=1, kv_dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    qparams = quantize_params(params, bits)

    rng = np.random.default_rng(3)
    prompt = rng.integers(1, 256, size=24).tolist()

    full = QuestEngine(cfg, quest, params, prefill_bucket=16)
    logits_full = full.prefill([prompt])
    quant = QuestEngine(cfg, quest, qparams, prefill_bucket=16)
    logits_q = quant.prefill([prompt])

    # Close logits for int8; correlated for int4 (random weights are a
    # worst case for 4-bit — real checkpoints fare far better, and the
    # reference's AWQ additionally does activation-aware scaling).
    corr = np.corrcoef(logits_full[0], logits_q[0])[0, 1]
    assert corr > (0.999 if bits == 8 else 0.85), corr
    # generation still runs end-to-end in decode mode
    out = quant.generate([prompt], max_new_tokens=4)
    assert len(out[0]) == 4


@pytest.mark.slow
def test_awq_beats_rtn_and_folded_path_is_exact():
    """AWQ property test (models/awq.py): activation-aware scaling must
    not lose to plain RTN at int4 on held-out activations (per linear,
    output MSE), and the folded runtime path (qdot with inv_s) must
    equal x @ effective_weight."""
    from quest_tpu.kv.paged_kv import init_cache
    from quest_tpu.models.awq import awq_quantize_params
    from quest_tpu.models.llama import QuestModel
    from quest_tpu.models.quantize import QuantizedLinear

    cfg = ModelConfig(vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_layers=2, num_heads=4,
                      num_kv_heads=2, head_dim=16, rope=RopeConfig(),
                      dtype=jnp.float32)
    quest = QuestConfig(page_size=8, token_budget=64, max_seq_len=256,
                        skip_layers=1, kv_dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)
    # Salient-channel structure: scale up a few input channels of wq so
    # activation-aware scaling has something to find (real models have
    # exactly this structure; i.i.d. random weights are the degenerate
    # case where AWQ == RTN).
    rngs = np.random.default_rng(9)
    boost = np.ones(64, np.float32)
    boost[rngs.choice(64, 8, replace=False)] = 6.0
    emb = np.asarray(params["embed"]) * boost[None, :]
    params = {**params, "embed": jnp.asarray(emb)}

    model = QuestModel(cfg, quest)
    cache = init_cache(cfg, quest, batch_size=1)
    toks = jnp.asarray(rngs.integers(0, 128, size=(1, 64)), jnp.int32)

    aparams = awq_quantize_params(model, params, cache, toks, bits=4,
                                  n_grid=12)

    # (a) per-linear: AWQ error <= RTN error on fresh activations.
    from quest_tpu.models.awq import awq_calibrate
    calib = awq_calibrate(model, params, cache, toks)
    for name in ("wq", "w_down"):
        for l in range(cfg.num_layers):
            w = np.asarray(params["layers"][name][l], np.float32)
            x = calib[name][l]["rows"]
            ref = x @ w
            rtn = np.asarray(dequantize_weight(
                quantize_weight(jnp.asarray(w), 4), jnp.float32))
            e_rtn = float(np.mean((x @ rtn - ref) ** 2))
            aq = aparams["layers"][name]
            aw = np.asarray(dequantize_weight(
                QuantizedLinear(q=aq.q[l], s=aq.s[l], bits=4,
                                inv_s=aq.inv_s[l]), jnp.float32))
            e_awq = float(np.mean((x @ aw - ref) ** 2))
            assert e_awq <= e_rtn * 1.001, (name, l, e_awq, e_rtn)

    # (b) folded qdot == x @ effective_weight.
    aq = aparams["layers"]["wq"]
    one = QuantizedLinear(q=aq.q[0], s=aq.s[0], bits=4, inv_s=aq.inv_s[0])
    x = jnp.asarray(rngs.standard_normal((5, 64)).astype(np.float32))
    got = np.asarray(qdot(x, one, dtype=jnp.float32))
    want = np.asarray(x @ dequantize_weight(one, jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    # (c) the AWQ model still runs end-to-end.
    eng = QuestEngine(cfg, quest, aparams, prefill_bucket=16)
    out = eng.generate([rngs.integers(1, 128, size=24).tolist()],
                       max_new_tokens=3)
    assert len(out[0]) == 3
