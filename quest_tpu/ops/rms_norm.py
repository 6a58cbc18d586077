"""RMSNorm.

The reference ships a hand-vectorized CUDA RMSNorm
(`/root/reference/quest/ops/csrc/rms_norm.cu:83-213`). On TPU, XLA fuses
the reduction + rsqrt + scale into neighbouring ops, so a plain jnp
implementation already runs at speed of light; no Pallas kernel needed.
Numerics match HF LlamaRMSNorm: variance in f32, weight applied in the
input dtype.
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    return (xf.astype(dtype) * weight.astype(dtype)).astype(dtype)
