"""Device mesh + sharding rules.

The reference has **no** distributed support (single GPU, bsz=1 —
SURVEY.md §2.4); this module is a new first-class component per the
north star: weights and KV pages tensor-sharded along the KV-head axis
so that Quest's per-head page selection (estimate → top-k → sparse
attention) is entirely shard-local, with collectives only on attention
and MLP outputs (Megatron-style TP) and the vocab-sharded logits gather.
Data parallelism shards the request batch.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
TP_AXIS = "tp"


def make_mesh(dp: int, tp: int,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    assert dp * tp <= len(devices), (dp, tp, len(devices))
    dev = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(dev, axis_names=(DP_AXIS, TP_AXIS))


# PartitionSpecs for the stacked params pytree (models/llama.py).
def param_specs() -> dict:
    return {
        "embed": P(),                              # replicated
        "layers": {
            "wq": P(None, None, TP_AXIS),          # heads sharded
            "wk": P(None, None, TP_AXIS),
            "wv": P(None, None, TP_AXIS),
            "wo": P(None, TP_AXIS, None),          # row-parallel
            "w_gate": P(None, None, TP_AXIS),
            "w_up": P(None, None, TP_AXIS),
            "w_down": P(None, TP_AXIS, None),
            "ln_attn": P(),
            "ln_mlp": P(),
        },
        "final_norm": P(),
        "lm_head": P(None, TP_AXIS),               # vocab sharded
    }


def cache_specs() -> object:
    """PagedKVCache: batch/physical pages on dp, KV heads on tp.

    The shared physical pool has no batch axis; its PAGE axis shards on
    dp (pages are interchangeable, each dp group runs its own
    allocator), block-table VALUES are shard-local by construction
    (kv/paged_kv.py:init_cache dp= layout). The min/max metadata is
    physical-BLOCK-keyed (parallel to the pool), so it shards exactly
    like kv_pages: heads on tp, physical blocks on dp.
    """
    from quest_tpu.kv.paged_kv import PagedKVCache
    return PagedKVCache(
        kv_pages=P(None, TP_AXIS, DP_AXIS, None, None, None),
        k_max=P(None, TP_AXIS, DP_AXIS, None, None),
        k_min=P(None, TP_AXIS, DP_AXIS, None, None),
        block_tab=P(DP_AXIS, None),
        seq_lens=P(DP_AXIS),
    )


def shard_params(params, mesh: Mesh):
    specs = param_specs()
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: isinstance(x, P))
