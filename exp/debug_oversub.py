"""Minimal repro of the oversubscribed-pool NaN for request 3."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")

import sys
sys.path.insert(0, "/root/repo")
from quest_tpu.config import ModelConfig, QuestConfig, RopeConfig
from quest_tpu.engine import ContinuousBatchingEngine, QuestEngine, Request
from quest_tpu.models.llama import init_params

cfg = ModelConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                  num_layers=2, num_heads=4, num_kv_heads=4,
                  head_dim=16, rope=RopeConfig(), dtype=jnp.float32)
quest = dataclasses.replace(
    QuestConfig(page_size=8, token_budget=32, max_seq_len=256,
                skip_layers=1, kv_dtype=jnp.float32), block_pages=8)
params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)

engine = ContinuousBatchingEngine(cfg, quest, params, max_batch=3,
                                  prefill_bucket=16, total_pages=16)
rng = np.random.default_rng(11)
prompts = [rng.integers(1, 256, size=n).tolist() for n in (40, 25, 50, 12, 33)]
n_new = [6, 4, 5, 7, 3]
for i, (p, k) in enumerate(zip(prompts, n_new)):
    engine.submit(Request(uid=i, prompt=p, max_new_tokens=k))

gens = {i: [] for i in range(5)}
tick = 0
while engine.has_work():
    occupants = [None if s is None else s.req.uid for s in engine.slots]
    evs = engine.step()
    sl = np.asarray(engine.cache.seq_lens)
    bt = np.asarray(engine.cache.block_tab)
    print(f"tick {tick} [{engine.last_tick}] occ={occupants} "
          f"seq_lens={sl.tolist()} btab={bt.tolist()} "
          f"evs={[(e.uid, e.token, e.finished) for e in evs]}")
    # NaN scan of cache
    for name in ("kv_pages", "k_max", "k_min"):
        a = np.asarray(getattr(engine.cache, name))
        if np.isnan(a).any():
            print(f"  !! NaN in {name}")
    for ev in evs:
        gens[ev.uid].append(ev.token)
    tick += 1
    if tick > 60:
        break

for i, (p, k) in enumerate(zip(prompts, n_new)):
    eng = QuestEngine(cfg, quest, params, batch_size=1, prefill_bucket=16)
    ref = eng.generate([p], max_new_tokens=k)[0]
    print(f"req {i}: got {gens[i]}  ref {ref}  {'OK' if gens[i] == ref else 'MISMATCH'}")
