"""RoPE vs HuggingFace rotary embeddings (torch CPU ground truth)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from quest_tpu.config import RopeConfig
from quest_tpu.ops.rope import apply_rope, compute_rope_params


def _hf_rope(x_np, positions, config_kwargs):
    """Apply HF llama rotary embedding to x [T, H, D] at given positions."""
    from transformers import LlamaConfig
    from transformers.models.llama.modeling_llama import (
        LlamaRotaryEmbedding, apply_rotary_pos_emb)

    T, H, D = x_np.shape
    cfg = LlamaConfig(hidden_size=H * D, num_attention_heads=H,
                      head_dim=D, **config_kwargs)
    rot = LlamaRotaryEmbedding(config=cfg)
    x = torch.from_numpy(x_np).float().permute(1, 0, 2).unsqueeze(0)  # [1,H,T,D]
    pos = torch.from_numpy(positions).long().unsqueeze(0)
    cos, sin = rot(x, pos)
    out, _ = apply_rotary_pos_emb(x, x, cos, sin)
    return out.squeeze(0).permute(1, 0, 2).numpy()


CASES = [
    ("plain", RopeConfig(theta=10000.0), dict(rope_theta=10000.0)),
    ("linear", RopeConfig(theta=10000.0, scaling="linear", factor=8.0),
     dict(rope_theta=10000.0,
          rope_scaling={"rope_type": "linear", "factor": 8.0},
          max_position_embeddings=32768)),
    ("llama3", RopeConfig(theta=500000.0, scaling="llama3", factor=8.0,
                          low_freq_factor=1.0, high_freq_factor=4.0,
                          original_max_position_embeddings=8192),
     dict(rope_theta=500000.0,
          rope_scaling={"rope_type": "llama3", "factor": 8.0,
                        "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                        "original_max_position_embeddings": 8192},
          max_position_embeddings=131072)),
    ("yarn", RopeConfig(theta=10000.0, scaling="yarn", factor=32.0,
                        original_max_position_embeddings=4096),
     dict(rope_theta=10000.0,
          rope_scaling={"rope_type": "yarn", "factor": 32.0,
                        "original_max_position_embeddings": 4096},
          max_position_embeddings=131072)),
]


@pytest.mark.parametrize("name,ours,hf_kwargs", CASES,
                         ids=[c[0] for c in CASES])
def test_rope_matches_hf(name, ours, hf_kwargs):
    rng = np.random.default_rng(0)
    T, H, D = 7, 4, 64
    x = rng.standard_normal((T, H, D)).astype(np.float32)
    # Large positions make |angle| huge; XLA's f32 sin/cos range reduction
    # then legitimately diverges from torch's, so check a tight tolerance
    # at moderate positions and a loose one at extreme positions.
    for hi, tol in [(2048, 3e-4), (30000, 3e-2)]:
        positions = rng.integers(0, hi, size=(T,)).astype(np.int64)
        expected = _hf_rope(x, positions, hf_kwargs)
        inv_freq, pos_scale, attn_scale = compute_rope_params(ours, D)
        got = apply_rope(jnp.asarray(x), jnp.asarray(positions), inv_freq,
                         pos_scale, attn_scale)
        np.testing.assert_allclose(np.asarray(got), expected,
                                   rtol=tol, atol=tol)


def test_rope_offset_decode_matches_prefill():
    """Rotating token t alone == rotating it within a batch."""
    rng = np.random.default_rng(1)
    T, H, D = 9, 2, 32
    x = jnp.asarray(rng.standard_normal((T, H, D)).astype(np.float32))
    inv_freq, s, a = compute_rope_params(RopeConfig(), D)
    full = apply_rope(x, jnp.arange(T), inv_freq, s, a)
    one = apply_rope(x[5:6], jnp.asarray([5]), inv_freq, s, a)
    np.testing.assert_allclose(np.asarray(one[0]), np.asarray(full[5]),
                               rtol=1e-6, atol=1e-6)
