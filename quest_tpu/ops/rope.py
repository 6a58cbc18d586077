"""Rotary position embeddings, TPU-native.

The reference applies RoPE in-place with a CUDA kernel
(`/root/reference/kernels/include/decode/decode_page.cuh:644-728`,
`quest/ops/csrc/page.cu:212`) supporting plain + linear-PI scaling.
On TPU the rotation is a pair of fused elementwise multiplies that XLA
folds into the surrounding matmuls, so no Pallas kernel is needed; we
additionally support llama3 and yarn frequency scaling (the reference
gets these "for free" through HF models in its eval-only path,
`/root/reference/evaluation/quest_attention.py:121-124`).

Convention matches HF `apply_rotary_pos_emb` (rotate-half):
  out[..., :D/2] = x1*cos - x2*sin ;  out[..., D/2:] = x2*cos + x1*sin
so that weights loaded from HF checkpoints are directly compatible.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from quest_tpu.config import RopeConfig


def _base_inv_freq(head_dim: int, theta: float) -> jnp.ndarray:
    exponent = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    return 1.0 / (theta ** exponent)


def compute_rope_params(cfg: RopeConfig, head_dim: int):
    """Return (inv_freq [D/2] f32, position_scale, attention_scaling).

    - ``inv_freq`` are the per-channel angular frequencies (possibly
      rescaled for llama3/yarn).
    - ``position_scale`` divides positions (linear PI; reference
      `QuestAttention.py:46-49` / `decode_page.cuh` rope_scale).
    - ``attention_scaling`` multiplies cos/sin (yarn mscale).
    """
    inv_freq = _base_inv_freq(head_dim, cfg.theta)
    position_scale = 1.0
    attention_scaling = 1.0

    if cfg.scaling is None:
        pass
    elif cfg.scaling == "linear":
        position_scale = float(cfg.factor)
    elif cfg.scaling == "llama3":
        # HF Llama-3.1 rope scaling: low-frequency channels are slowed by
        # `factor`, high-frequency channels untouched, smooth ramp between.
        low_wavelen = cfg.original_max_position_embeddings / cfg.low_freq_factor
        high_wavelen = cfg.original_max_position_embeddings / cfg.high_freq_factor
        wavelen = 2.0 * math.pi / inv_freq
        smooth = (cfg.original_max_position_embeddings / wavelen
                  - cfg.low_freq_factor) / (cfg.high_freq_factor - cfg.low_freq_factor)
        smooth = jnp.clip(smooth, 0.0, 1.0)
        scaled = inv_freq / cfg.factor
        blended = (1.0 - smooth) * scaled + smooth * inv_freq
        inv_freq = jnp.where(wavelen > low_wavelen, scaled,
                             jnp.where(wavelen < high_wavelen, inv_freq, blended))
    elif cfg.scaling == "yarn":
        # YaRN (arXiv 2309.00071): NTK-by-parts interpolation + mscale.
        def find_dim(num_rot):
            return (head_dim * math.log(cfg.original_max_position_embeddings
                                        / (num_rot * 2 * math.pi))) / (2 * math.log(cfg.theta))
        low = max(math.floor(find_dim(cfg.beta_fast)), 0)
        high = min(math.ceil(find_dim(cfg.beta_slow)), head_dim - 1)
        dims = jnp.arange(head_dim // 2, dtype=jnp.float32)
        ramp = jnp.clip((dims - low) / max(high - low, 1e-3), 0.0, 1.0)
        # extrapolation_factor = 1 - ramp: channels below `low` (fast, short
        # wavelength) keep the original frequency; channels above `high`
        # are fully position-interpolated (divided by `factor`).
        extrap = 1.0 - ramp
        inv_freq = (inv_freq / cfg.factor) * (1.0 - extrap) + inv_freq * extrap
        attention_scaling = float(0.1 * math.log(cfg.factor) + 1.0) * cfg.mscale
    else:
        raise ValueError(f"unknown rope scaling {cfg.scaling!r}")

    return inv_freq, position_scale, attention_scaling


@partial(jax.jit, static_argnames=())
def apply_rope(x: jnp.ndarray, positions: jnp.ndarray, inv_freq: jnp.ndarray,
               position_scale: float = 1.0,
               attention_scaling: float = 1.0) -> jnp.ndarray:
    """Rotate ``x [..., T, H, D]`` by ``positions [..., T]`` (int).

    Computation in f32, result cast back to x.dtype.
    """
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    pos = positions.astype(jnp.float32) / position_scale
    angles = pos[..., None] * inv_freq  # [..., T, D/2]
    cos = jnp.cos(angles) * attention_scaling
    sin = jnp.sin(angles) * attention_scaling
    # broadcast over the head axis: x is [..., T, H, D]
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(orig_dtype)


def rope_for(cfg: RopeConfig, head_dim: int):
    """Convenience: returns fn(x, positions) -> rotated x."""
    inv_freq, pos_scale, attn_scale = compute_rope_params(cfg, head_dim)

    def fn(x, positions):
        return apply_rope(x, positions, inv_freq, pos_scale, attn_scale)

    return fn
