"""Tensor/data-parallel step functions via shard_map.

New component vs the reference (which is single-GPU; SURVEY.md §2.4).
The whole forward runs inside one ``shard_map`` over a ``(dp, tp)``
mesh: Pallas kernels see per-shard arrays (GSPMD cannot partition
custom kernels, shard_map can), the only TP collectives are the two
psums per layer + the logits all-gather (emitted over ICI by XLA), and
dp shards the request batch. Sharding layout in parallel/mesh.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P

from quest_tpu.config import ModelConfig, QuestConfig
from quest_tpu.kv.paged_kv import PagedKVCache, init_cache
from quest_tpu.models.llama import QuestModel
from quest_tpu.parallel.mesh import (DP_AXIS, TP_AXIS, cache_specs,
                                     param_specs)


def local_config(cfg: ModelConfig, tp: int) -> ModelConfig:
    assert cfg.num_heads % tp == 0 and cfg.num_kv_heads % tp == 0, (
        f"heads ({cfg.num_heads}/{cfg.num_kv_heads}) not divisible by tp={tp}")
    assert cfg.vocab_size % tp == 0, "vocab must divide tp for lm_head shard"
    return dataclasses.replace(cfg, num_heads=cfg.num_heads // tp,
                               num_kv_heads=cfg.num_kv_heads // tp)


def make_sharded_fns(cfg: ModelConfig, quest: QuestConfig, mesh: Mesh):
    """Returns (prefill_fn, decode_fn), both jitted with donated cache.

    prefill_fn(params, cache, tokens [B, T], new_lens [B]) ->
        (logits [B, T, V], cache)
    decode_fn(params, cache, tokens [B]) -> (logits [B, V], cache)

    Batch B must be divisible by mesh dp; heads by mesh tp.
    """
    tp = mesh.shape[TP_AXIS]
    model = QuestModel(local_config(cfg, tp), quest, tp_axis=TP_AXIS)
    pspecs = param_specs()
    cspecs = cache_specs()

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(pspecs, cspecs, P(DP_AXIS, None), P(DP_AXIS)),
             out_specs=(P(DP_AXIS, None, None), cspecs),
             check_vma=False)
    def _prefill(params, cache, tokens, new_lens):
        return model.prefill(params, cache, tokens, new_lens)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(pspecs, cspecs, P(DP_AXIS)),
             out_specs=(P(DP_AXIS, None), cspecs),
             check_vma=False)
    def _decode(params, cache, tokens):
        return model.decode_step(params, cache, tokens)

    prefill_fn = jax.jit(_prefill, donate_argnums=(1,))
    decode_fn = jax.jit(_decode, donate_argnums=(1,))
    return prefill_fn, decode_fn


def make_serving_fns(cfg: ModelConfig, quest: QuestConfig, mesh: Mesh):
    """Sharded step functions for the continuous-batching scheduler:
    (prefill_last_fn, decode_token_fn, decode_sample_fn), each jitted
    with donated cache. Same signatures as the single-device model
    methods, so the scheduler swaps them in transparently:

    prefill_last_fn(params, cache, tokens [B, T], new_lens [B])
        -> (logits [B, 1, V], cache)
    decode_token_fn(params, cache, tokens [B], active [B])
        -> (next_tokens [B], cache)
    decode_sample_fn(params, cache, tokens [B], key, temps [B],
        active [B]) -> (next_tokens [B], key, cache)

    The PRNG key is replicated: dp shards draw with the same key over
    different rows (row draws within a shard are independent; identical
    logits in different dp groups would correlate — harmless for
    serving).
    """
    tp = mesh.shape[TP_AXIS]
    model = QuestModel(local_config(cfg, tp), quest, tp_axis=TP_AXIS)
    pspecs = param_specs()
    cspecs = cache_specs()

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(pspecs, cspecs, P(DP_AXIS, None), P(DP_AXIS)),
             out_specs=(P(DP_AXIS, None, None), cspecs),
             check_vma=False)
    def _prefill_last(params, cache, tokens, new_lens):
        return model.prefill_last(params, cache, tokens, new_lens)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(pspecs, cspecs, P(DP_AXIS), P(DP_AXIS)),
             out_specs=(P(DP_AXIS), cspecs),
             check_vma=False)
    def _tok(params, cache, tokens, active):
        return model.decode_token_step(params, cache, tokens, active)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(pspecs, cspecs, P(DP_AXIS), P(), P(DP_AXIS),
                       P(DP_AXIS)),
             out_specs=(P(DP_AXIS), P(), cspecs),
             check_vma=False)
    def _sample(params, cache, tokens, key, temps, active):
        return model.decode_sample_step(params, cache, tokens, key,
                                        temps, active)

    return (jax.jit(_prefill_last, donate_argnums=(1,)),
            jax.jit(_tok, donate_argnums=(1,)),
            jax.jit(_sample, donate_argnums=(1,)))


# (Round 3 had a `make_recompute_fn` here — the sharded wrapper of the
# prefix-cache metadata recompute. Physical-block-keyed metadata made
# the whole per-admission recompute machinery unnecessary: shared
# blocks carry their min/max metadata, see kv/paged_kv.py.)


def init_sharded_cache(cfg: ModelConfig, quest: QuestConfig, mesh: Mesh,
                       batch_size: int,
                       total_pages: int | None = None) -> PagedKVCache:
    """Allocate the cache directly with its target sharding.

    ``total_pages`` counts physical pages PER DP SHARD (each dp group
    owns an independent slice of the pool; block tables are
    shard-local — see cache_specs).
    """
    from jax.sharding import NamedSharding

    cspecs = cache_specs()
    dp = mesh.shape[DP_AXIS]

    def alloc():
        return init_cache(cfg, quest, batch_size, total_pages=total_pages,
                          dp=dp)

    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), cspecs,
                             is_leaf=lambda x: isinstance(x, P))
    return jax.jit(alloc, out_shardings=shardings)()
