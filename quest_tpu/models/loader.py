"""HF checkpoint → quest_tpu params conversion.

The reference loads weights through HF `from_pretrained` into its forked
model (`/root/reference/scripts/bench_textgen.py:32-36`). Here we convert
an HF Llama/Mistral state dict (torch CPU) into the stacked-layer JAX
pytree used by models/llama.py. Works with any local checkpoint dir or
an in-memory HF model (used by the parity tests).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from quest_tpu.config import ModelConfig, RopeConfig


def config_from_hf(hf_config) -> ModelConfig:
    """Map a transformers Llama/Mistral config to ModelConfig."""
    rope_scaling = getattr(hf_config, "rope_scaling", None) or {}
    rope_type = rope_scaling.get("rope_type",
                                 rope_scaling.get("type", None))
    if rope_type in (None, "default"):
        rope = RopeConfig(theta=float(hf_config.rope_theta))
    elif rope_type == "linear":
        rope = RopeConfig(theta=float(hf_config.rope_theta),
                          scaling="linear",
                          factor=float(rope_scaling["factor"]))
    elif rope_type == "llama3":
        rope = RopeConfig(
            theta=float(hf_config.rope_theta), scaling="llama3",
            factor=float(rope_scaling["factor"]),
            low_freq_factor=float(rope_scaling["low_freq_factor"]),
            high_freq_factor=float(rope_scaling["high_freq_factor"]),
            original_max_position_embeddings=int(
                rope_scaling["original_max_position_embeddings"]))
    elif rope_type == "yarn":
        rope = RopeConfig(
            theta=float(hf_config.rope_theta), scaling="yarn",
            factor=float(rope_scaling["factor"]),
            original_max_position_embeddings=int(
                rope_scaling["original_max_position_embeddings"]))
    else:
        raise ValueError(f"unsupported rope scaling {rope_type!r}")

    num_heads = hf_config.num_attention_heads
    head_dim = getattr(hf_config, "head_dim", None) or (
        hf_config.hidden_size // num_heads)
    return ModelConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        intermediate_size=hf_config.intermediate_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=num_heads,
        num_kv_heads=getattr(hf_config, "num_key_value_heads", num_heads),
        head_dim=head_dim,
        rms_norm_eps=hf_config.rms_norm_eps,
        rope=rope,
        tie_word_embeddings=getattr(hf_config, "tie_word_embeddings", False),
        max_position_embeddings=hf_config.max_position_embeddings,
    )


def params_from_state_dict(state_dict: Dict[str, Any], cfg: ModelConfig,
                           dtype=None) -> Dict[str, Any]:
    """Convert an HF Llama/Mistral state dict (torch tensors or numpy
    arrays) to the stacked params pytree. Linear weights are transposed
    to [in, out] for right-multiplication."""
    dtype = dtype or cfg.dtype

    def get(name):
        t = state_dict[name]
        if hasattr(t, "detach"):
            t = t.detach().to("cpu").float().numpy()
        return np.asarray(t)

    def lin(name):  # [out, in] -> [in, out]
        return get(name).T

    L = cfg.num_layers
    stack = {k: [] for k in ("wq", "wk", "wv", "wo", "w_gate", "w_up",
                             "w_down", "ln_attn", "ln_mlp")}
    for i in range(L):
        p = f"model.layers.{i}."
        stack["wq"].append(lin(p + "self_attn.q_proj.weight"))
        stack["wk"].append(lin(p + "self_attn.k_proj.weight"))
        stack["wv"].append(lin(p + "self_attn.v_proj.weight"))
        stack["wo"].append(lin(p + "self_attn.o_proj.weight"))
        stack["w_gate"].append(lin(p + "mlp.gate_proj.weight"))
        stack["w_up"].append(lin(p + "mlp.up_proj.weight"))
        stack["w_down"].append(lin(p + "mlp.down_proj.weight"))
        stack["ln_attn"].append(get(p + "input_layernorm.weight"))
        stack["ln_mlp"].append(get(p + "post_attention_layernorm.weight"))

    embed = get("model.embed_tokens.weight")
    if cfg.tie_word_embeddings or "lm_head.weight" not in state_dict:
        lm_head = embed.T
    else:
        lm_head = lin("lm_head.weight")

    return {
        "embed": jnp.asarray(embed, dtype),
        "layers": {k: jnp.asarray(np.stack(v), dtype)
                   for k, v in stack.items()},
        "final_norm": jnp.asarray(get("model.norm.weight"), dtype),
        "lm_head": jnp.asarray(lm_head, dtype),
    }


def load_hf_model(model_path: str, dtype=None):
    """Load a local HF checkpoint dir → (ModelConfig, params)."""
    import transformers

    hf_cfg = transformers.AutoConfig.from_pretrained(model_path)
    cfg = config_from_hf(hf_cfg)
    model = transformers.AutoModelForCausalLM.from_pretrained(
        model_path, torch_dtype="float32", low_cpu_mem_usage=True)
    params = params_from_state_dict(model.state_dict(), cfg, dtype)
    del model
    return cfg, params
