"""Weight-only quantization — the TPU analogue of the reference's AWQ path.

The reference's best end-to-end number (2.23x at 32K ctx) uses 4-bit
AWQ weights (`/root/reference/README.md:17,102`); decode latency is
weight-bandwidth-bound, so shrinking weights is the complementary win
to Quest's KV sparsity. Here: symmetric per-output-channel int8 (and
packed int4) weight-only quantization. Dequantization is a cast+scale
that XLA fuses into the matmul operand load — no custom kernel; HBM
weight traffic halves (int8) or quarters (int4).

``QuantizedLinear`` is a registered pytree whose ``bits`` is *static*
metadata, so quantized layers ride `lax.scan` over stacked layers and
`shard_map` sharding specs exactly like plain weights.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedLinear:
    q: jnp.ndarray                 # int8 [..., in, out] (int4: [..., in/2, out])
    s: jnp.ndarray                 # f32  [..., 1, out]
    bits: int = dataclasses.field(default=8, metadata=dict(static=True))
    # AWQ activation fold (models/awq.py): the stored q/s quantize
    # W * (1/inv_s) per input channel; qdot multiplies the activation
    # by inv_s [..., in] so the product is unchanged while salient
    # channels round with finer granularity. None = plain RTN.
    inv_s: Any = None
    # STATIC layer index into a stacked ``q`` [L, in, out] (see
    # slice_layer): qdot then barriers the STACKED tensor and slices
    # AFTER — a barrier on a pre-sliced operand materializes the slice
    # as an s8 HLO-temp copy, tripling weight HBM traffic (measured
    # 254 vs 748-751 GB/s, exp/r4_chip/qdot_barrier_ab.log — the
    # ~6.5 ms 8-layer decode-step 'base' of rounds 2-3). None = ``q``
    # is already per-layer (e.g. lm_head).
    layer: Any = dataclasses.field(default=None,
                                   metadata=dict(static=True))


QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_weight(w: jnp.ndarray, bits: int = 8) -> QuantizedLinear:
    """Symmetric per-output-channel quantization of ``[..., in, out]``."""
    assert bits in (4, 8), bits
    wf = w.astype(jnp.float32)
    qmax = 127.0 if bits == 8 else 7.0
    s = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / qmax  # [..., 1, out]
    s = jnp.maximum(s, 1e-8)
    q = jnp.clip(jnp.round(wf / s), -qmax, qmax).astype(jnp.int8)
    if bits == 4:
        # BLOCK-split pack along the *in* axis: rows [0, in/2) in the
        # low nibble, rows [in/2, in) in the high nibble. qdot then
        # computes x_top @ lo + x_bot @ hi as two matmuls whose nibble
        # shifts fuse into the operand reads — an element-interleaved
        # pack would need an unpack/stack that XLA materializes (~17x
        # slower, measured).
        half = q.shape[-2] // 2
        lo = q[..., :half, :] & 0x0F
        hi = (q[..., half:, :] & 0x0F) << 4
        q = (lo | hi).astype(jnp.int8)
    return QuantizedLinear(q=q, s=s.astype(jnp.float32), bits=bits)


def dequantize_weight(qw: QuantizedLinear, dtype=jnp.bfloat16) -> jnp.ndarray:
    q = qw.q
    if qw.bits == 4:
        lo = (q << 4) >> 4          # sign-extend low nibble (arith shift)
        hi = q >> 4                  # sign-extend high nibble
        q = jnp.concatenate([lo, hi], axis=-2)   # block-split pack
    w = q.astype(jnp.float32) * qw.s
    if qw.inv_s is not None:        # effective weight incl. AWQ fold
        w = w * qw.inv_s[..., :, None]
    return w.astype(dtype)


def qdot(x: jnp.ndarray, w, dtype=None) -> jnp.ndarray:
    """``x @ w`` where ``w`` is a plain array or a QuantizedLinear.

    Dequant is expressed as cast*scale feeding the dot — XLA fuses it
    into the matmul's operand read, so int8 weights stream from HBM at
    their compressed width. int4 runs as two fused matmuls over the
    nibble halves of the block-split pack (int8-speed, half the
    weight memory).
    """
    if hasattr(w, "record_and_matmul"):   # AWQ calibration pass (eager)
        return w.record_and_matmul(x)
    if not isinstance(w, QuantizedLinear):
        return x @ w
    dtype = dtype or x.dtype
    # Barrier: without it XLA's scheduler may hoist every layer's
    # dequantized bf16 weights to program start (they only depend on
    # params), materializing the FULL bf16 model in HBM — observed as
    # runtime OOM for 32-layer int4 models that statically fit with
    # >6 GB to spare. Tying the packed weights to x forces just-in-time
    # dequant and buffer reuse across layers.
    #
    # The barrier operand must be the FULL parameter, never a slice:
    # barriering a pre-sliced per-layer tensor materializes the slice
    # as an HLO-temp copy — 3x weight HBM traffic, measured 254 vs
    # 748-751 GB/s (exp/r4_chip/qdot_barrier_ab.log). With a stacked
    # ``q`` the static ``layer`` index slices AFTER the barrier; the
    # slice then fuses into the matmul's operand read.
    wq, x = jax.lax.optimization_barrier((w.q, x))
    if w.layer is not None:
        wq = wq[w.layer]
    if w.inv_s is not None:
        x = x * w.inv_s.astype(x.dtype)
    if w.bits == 4:
        half = wq.shape[-2]
        lo = (((wq << 4) >> 4).astype(jnp.float32) * w.s).astype(dtype)
        hi = ((wq >> 4).astype(jnp.float32) * w.s).astype(dtype)
        return x[..., :half] @ lo + x[..., half:] @ hi
    return x @ (wq.astype(jnp.float32) * w.s).astype(dtype)


def slice_layer(v, l: int):
    """Per-layer view of a stacked params leaf for the unrolled layer
    loop (models/llama.py). Plain arrays slice eagerly; QuantizedLinear
    keeps its packed ``q`` STACKED and records the static layer index —
    qdot barriers the stacked tensor and slices after (see qdot)."""
    if isinstance(v, QuantizedLinear):
        return dataclasses.replace(
            v, s=v.s[l],
            inv_s=None if v.inv_s is None else v.inv_s[l],
            layer=l)
    if hasattr(v, "record_and_matmul"):   # AWQ calibration recorder:
        # slice its stacked weight leaf, keep the recording aux.
        return jax.tree_util.tree_map(lambda a: a[l], v)
    return v[l]


def init_params_quantized(cfg, key, bits: int = 8) -> Dict[str, Any]:
    """Random-initialized params, quantized tensor-by-tensor AT
    CREATION (models/llama.py:init_params ``linear_wrap``): peak HBM is
    the quantized total plus ONE bf16 tensor, so full-size (32-layer)
    models initialize directly on the chip."""
    from quest_tpu.models.llama import init_params

    def wrap(name, w):
        if name in QUANT_KEYS or name == "lm_head":
            return quantize_weight(w, bits)
        return w

    return init_params(cfg, key, linear_wrap=wrap)


def quantize_params(params: Dict[str, Any], bits: int = 8) -> Dict[str, Any]:
    """Quantize every linear in the stacked-params pytree
    (models/llama.py layout). Embedding and norms stay in their dtype
    (embedding reads are gathers, not matmuls)."""
    out = {"embed": params["embed"],
           "final_norm": params["final_norm"],
           "layers": {}}
    for k, v in params["layers"].items():
        out["layers"][k] = (quantize_weight(v, bits)
                            if k in QUANT_KEYS else v)
    out["lm_head"] = quantize_weight(params["lm_head"], bits)
    return out
