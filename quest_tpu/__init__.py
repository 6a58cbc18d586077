"""quest-tpu: TPU-native query-aware KV-cache sparsity inference engine.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
mit-han-lab/Quest (reference at /root/reference): paged KV cache with
per-page min/max Key metadata, query-conditioned page criticality
estimation, top-K page selection, and sparse paged flash-decode — plus
the things the reference lacks: GQA in the fast path, batching, and
multi-chip tensor parallelism over a device mesh.
"""

from quest_tpu.config import (ModelConfig, QuestConfig, RopeConfig,
                              llama31_8b, longchat_7b_v15_32k,
                              mistral_7b_v03, yarn_llama2_7b_128k,
                              tiny_test_model)

__version__ = "0.1.0"

__all__ = [
    "ModelConfig", "QuestConfig", "RopeConfig",
    "llama31_8b", "longchat_7b_v15_32k", "mistral_7b_v03",
    "yarn_llama2_7b_128k", "tiny_test_model",
]
