"""Continuous batching scheduler over a shared physical page pool.

The reference is strictly batch-size-1 (`assert bsz == 1`,
`/root/reference/quest/models/QuestAttention.py:68`) and shares one
physical pool across sequences via per-seq page lists
(`/root/reference/quest/utils/kv_cache.py:7-133`); multi-request
serving is a new first-class component of the TPU build (SURVEY.md
§2.4). Design:

  * The paged pool has ``max_batch`` **slots** with independent
    ``seq_lens`` — all shapes static, so slot occupancy never triggers
    recompilation. Slots map logical pages onto the SHARED physical
    pool through per-slot block tables (kv/paged_kv.py): pool capacity
    is set by ``total_pages``, independent of max_batch × max_seq_len.
  * Physical blocks are managed by the native **PagePool** allocator
    (kv/pool.py, csrc/pagepool.cpp) at ``block_pages``-page
    granularity. A request's full need (prompt + max_new_tokens) is
    reserved at admission, so an admitted request can never hit pool
    exhaustion mid-stream (deadlock-free by construction); admission
    is FIFO-deferred while blocks are short.
  * **Chunked prefill**: prompts are written in ``prefill_chunk``-token
    chunks, interleaved with decode bursts, so a long prompt never
    stalls active decode streams (vLLM-style). Busy rows ride every
    tick masked-inactive: their writes are routed to the reserved
    scratch block (block 0) and cannot touch pages owned by anyone.
  * Finished slots release their blocks back to the allocator and
    reset their table row to scratch (the `quest_clear()` analogue,
    `/root/reference/quest/models/llama.py:554-560`).

Greedy requests decode in **bursts**: ``burst`` chained on-device
dispatches (argmax token fed straight back, cache donated) per host
round-trip, because a per-token logits fetch costs ~tens of ms through
remote dispatch (see models/llama.py:decode_token_step). A request
that finishes mid-burst over-generates into its slot until the burst
ends; the junk is trimmed host-side and the slot (recycled to
seq_len 0) never exposes it. Sampled requests burst too: the PRNG key
rides on device (models/llama.py:decode_sample_step); only the first
token of each request (at prompt completion) is sampled host-side from
the prefill logits.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from quest_tpu.config import ModelConfig, QuestConfig
from quest_tpu.kv.paged_kv import init_cache
from quest_tpu.kv.pool import PagePool
from quest_tpu.models.llama import Params, QuestModel
from quest_tpu.ops.pallas_utils import round_up as _round_up


@dataclasses.dataclass
class Request:
    uid: int
    prompt: List[int]
    max_new_tokens: int = 64
    temperature: float = 0.0
    eos_token_id: Optional[int] = None


@dataclasses.dataclass
class _Slot:
    req: Request
    generated: List[int]
    pending: int              # next token to feed (decode phase)
    rng: np.random.Generator
    sid: int                  # PagePool sequence id
    prefill_pos: int          # prompt tokens written so far
    # Prefix cache: physical blocks borrowed from the registry (this
    # slot holds one pages_retain on them until it finishes).
    shared_blocks: List[int] = dataclasses.field(default_factory=list)

    @property
    def prefilling(self) -> bool:
        return self.prefill_pos < len(self.req.prompt)


@dataclasses.dataclass
class StepEvent:
    uid: int
    token: int
    finished: bool


class ContinuousBatchingEngine:
    """Serve many requests through a fixed-capacity slot pool.

    ``total_pages``: physical pool size in pages (+1 scratch block is
    added internally). Default = max_batch × max_pages (full static
    reservation). Set it smaller to oversubscribe: admission then
    waits for blocks, and max_batch × max_seq_len may exceed pool
    capacity.

    ``prefill_chunk``: max prompt tokens written per prefill tick
    (rounded up to ``prefill_bucket``). None = whole prompt in one
    tick. Chunked admission interleaves one prefill tick with each
    decode burst so long prompts do not stall active streams.
    """

    def __init__(self, cfg: ModelConfig, quest: QuestConfig, params: Params,
                 max_batch: int = 4, prefill_bucket: int = 256,
                 seed: int = 0, burst: int = 16,
                 total_pages: Optional[int] = None,
                 prefill_chunk: Optional[int] = None,
                 mesh=None, prefix_cache_entries: int = 64):
        """``mesh``: optional jax.sharding.Mesh (parallel/mesh.py). The
        step functions then run inside shard_map (tp over heads/vocab,
        dp over batch slots); each dp group owns an independent slice of
        the physical pool with its own allocator, and ``total_pages``
        counts usable pages PER DP GROUP. max_batch must divide dp."""
        self.cfg = cfg
        self.quest = quest
        self.max_batch = max_batch
        self.prefill_bucket = prefill_bucket
        self.burst = max(1, burst)
        self.prefill_chunk = prefill_chunk
        self.mesh = mesh
        bpp = min(quest.block_pages, quest.max_pages)
        self.block_tokens = bpp * quest.page_size
        dp = 1
        if mesh is None:
            self.model = QuestModel(cfg, quest)
            self.params = params
            if total_pages is None:
                total_pages = max_batch * quest.max_pages
            self.cache = init_cache(cfg, quest, max_batch,
                                    total_pages=bpp + total_pages)
            self._prefill_fn = jax.jit(self.model.prefill_last,
                                       donate_argnums=(1,))
            self._tok_fn = jax.jit(self.model.decode_token_step,
                                   donate_argnums=(1,))
            self._sample_fn = jax.jit(self.model.decode_sample_step,
                                      donate_argnums=(1,))
        else:
            from quest_tpu.parallel.mesh import DP_AXIS, shard_params
            from quest_tpu.parallel.tp import (init_sharded_cache,
                                               make_serving_fns)
            dp = mesh.shape[DP_AXIS]
            assert max_batch % dp == 0, (max_batch, dp)
            self.params = shard_params(params, mesh)
            if total_pages is None:
                total_pages = (max_batch // dp) * quest.max_pages
            self.cache = init_sharded_cache(cfg, quest, mesh, max_batch,
                                            total_pages=bpp + total_pages)
            (self._prefill_fn, self._tok_fn,
             self._sample_fn) = make_serving_fns(cfg, quest, mesh)
        # All table rows start at scratch; the allocators own the rest.
        self.cache = dataclasses.replace(
            self.cache,
            block_tab=self.cache.block_tab.at[:].set(0))
        self.dp = dp
        self._slots_per_group = max_batch // dp
        n_blocks = self.cache.num_phys_pages // dp // bpp - 1  # - scratch
        self.pools = [PagePool(n_blocks, self.block_tokens,
                               max_seqs=self._slots_per_group)
                      for _ in range(dp)]
        self.pool = self.pools[0]       # single-group convenience alias
        self._table_width = self.cache.block_tab.shape[1]
        self.slots: List[Optional[_Slot]] = [None] * max_batch
        self.queue: deque[Request] = deque()
        self._seed = seed
        self._key = jax.random.PRNGKey(seed)
        # Host mirror of per-slot lengths: burst bounds without device
        # fetches.
        self._hlens = np.zeros((max_batch,), np.int64)
        self._prefer_prefill = True
        self.last_tick: Optional[str] = None   # introspection for tests
        # Prefix cache (vLLM-style prompt caching — no reference
        # counterpart): registry of published block-aligned prompt
        # prefixes per dp group, LRU-capped; each entry holds one
        # pages_retain on its physical blocks, so shared KV survives
        # the donor request. Min/max metadata is keyed by PHYSICAL
        # block (kv/paged_kv.py), so borrowed blocks carry their
        # metadata and admission is pure host bookkeeping — zero
        # device dispatches (round 3's per-slot metadata needed an
        # on-device recompute per admission, a measured net slowdown).
        # Registries, allocators, and published block ids are per dp
        # group.
        self._bpp = bpp
        self._prefix_cap = prefix_cache_entries
        from collections import OrderedDict
        self._prefix: List[OrderedDict] = [OrderedDict()
                                           for _ in range(dp)]
        self._chains: Dict[int, List[bytes]] = {}
        self.prefix_hits = 0            # introspection for tests
        self.prefix_hit_tokens = 0

    # ------------------------------------------------------------------
    def _blocks_needed(self, req: Request) -> int:
        return -(-(len(req.prompt) + req.max_new_tokens)
                 // self.block_tokens)

    def _group(self, b: int) -> int:
        """dp group owning slot ``b`` (batch axis is dp-sharded)."""
        return b // self._slots_per_group

    def submit(self, req: Request) -> None:
        if len(req.prompt) + req.max_new_tokens > self.quest.max_seq_len:
            raise ValueError(f"request {req.uid} exceeds max_seq_len")
        if self._blocks_needed(req) > self.pools[0].total_pages:
            raise ValueError(
                f"request {req.uid} needs {self._blocks_needed(req)} "
                f"blocks; each pool group holds "
                f"{self.pools[0].total_pages}")
        self.queue.append(req)

    @property
    def num_active(self) -> int:
        return sum(s is not None for s in self.slots)

    def has_work(self) -> bool:
        return bool(self.queue) or self.num_active > 0

    # ------------------------------------------------------------------
    def _prefix_chain(self, req: Request) -> List[bytes]:
        """Chain hashes of the prompt's full blocks, capped so at least
        one prompt token is always freshly prefilled (the slot needs
        real last-token logits). blake2b content hashing — Python's
        hash() over int tuples is trivially collidable, and a collision
        would silently alias another request's KV into the borrower.
        Cached per request uid (a queued head is re-examined every
        tick)."""
        cached = self._chains.get(req.uid)
        if cached is not None:
            return cached
        import hashlib
        prompt = req.prompt
        m = (len(prompt) - 1) // self.block_tokens
        keys, h = [], b""
        for i in range(m):
            chunk = np.asarray(prompt[i * self.block_tokens:
                                      (i + 1) * self.block_tokens],
                               np.int64).tobytes()
            h = hashlib.blake2b(h + chunk, digest_size=16).digest()
            keys.append(h)
        self._chains[req.uid] = keys
        return keys

    def _prefix_lookup(self, g: int, keys: List[int]):
        """(n_shared_blocks, blocks) — longest registered prefix."""
        reg = self._prefix[g]
        for i in range(len(keys), 0, -1):
            ent = reg.get(keys[i - 1])
            if ent is not None:
                reg.move_to_end(keys[i - 1])
                return i, ent
        return 0, []

    def _admit_slots(self) -> None:
        """Move queued requests into free slots (bookkeeping only; the
        prompt is written by subsequent prefill ticks). FIFO: a large
        request short on blocks also blocks later ones (no starvation).
        A registered prompt prefix is borrowed instead of re-prefilled:
        its physical blocks alias into the slot's table row and only
        the remainder is reserved and written.
        """
        free = [b for b, s in enumerate(self.slots) if s is None]
        while free and self.queue:
            req = self.queue[0]
            keys = self._prefix_chain(req) if self._prefix_cap else []

            def find_slot():
                # First free slot whose dp group's allocator has room
                # for the UNSHARED remainder (FIFO over requests: the
                # head blocks later ones — no starvation).
                for i, b in enumerate(free):
                    g = self._group(b)
                    n_sh, blocks = self._prefix_lookup(g, keys)
                    if (self.pools[g].free_pages()
                            >= self._blocks_needed(req) - n_sh):
                        return i, (n_sh, blocks)
                return None, None

            pick, hit = find_slot()
            # Allocation pressure: registry holds must never starve
            # admission (submit() guaranteed raw schedulability), so
            # evict LRU prefix entries until the head fits or the
            # registries are empty.
            while pick is None:
                evicted = False
                for b in free:
                    reg = self._prefix[self._group(b)]
                    if reg:
                        _, old = reg.popitem(last=False)
                        self.pools[self._group(b)].pages_release(old)
                        evicted = True
                if not evicted:
                    break
                pick, hit = find_slot()
            if pick is None:
                break
            self.queue.popleft()
            b = free.pop(pick)
            pool = self.pools[self._group(b)]
            n_sh, shared = hit
            shared = list(shared)
            sh_tokens = n_sh * self.block_tokens
            if n_sh:
                pool.pages_retain(shared)       # slot hold until finish
                self.prefix_hits += 1
                self.prefix_hit_tokens += sh_tokens
            sid = pool.seq_create()
            # Reserve the FULL remaining need up front: admitted
            # requests never wait for memory again.
            pool.seq_extend(sid, len(req.prompt) + req.max_new_tokens
                            - sh_tokens)
            raw, _ = pool.fill_batch_tables([sid], self._table_width,
                                            pad_page=-1)
            row = np.where(raw[0] < 0, 0, raw[0] + 1).astype(np.int32)
            row = np.concatenate([np.asarray(shared, np.int32) + 1,
                                  row])[:self._table_width]
            rng = np.random.default_rng(self._seed * 7919 + req.uid)
            self.slots[b] = _Slot(req=req, generated=[], pending=-1,
                                  rng=rng, sid=sid, prefill_pos=sh_tokens,
                                  shared_blocks=shared)
            self._hlens[b] = sh_tokens
            # Borrowed blocks carry their min/max metadata (it is keyed
            # by physical block, kv/paged_kv.py) — aliasing the table
            # row IS the whole admission; no device work.
            self.cache = dataclasses.replace(
                self.cache,
                block_tab=self.cache.block_tab.at[b].set(jnp.asarray(row)),
                seq_lens=self.cache.seq_lens.at[b].set(sh_tokens))

    def _publish_prefix(self, b: int, s: _Slot) -> None:
        """Register the completed prompt's full blocks for reuse. Each
        entry takes its own pages_retain; LRU eviction releases it."""
        if not self._prefix_cap:
            return
        g = self._group(b)
        reg = self._prefix[g]
        keys = self._prefix_chain(s.req)
        if not keys:
            return
        own = self.pools[g].seq_pages(s.sid)
        blocks = s.shared_blocks + own
        pool = self.pools[g]
        for i, key in enumerate(keys, start=1):
            if key in reg:
                reg.move_to_end(key)
                continue
            ent = blocks[:i]
            pool.pages_retain(ent)
            reg[key] = ent
            while len(reg) > self._prefix_cap:
                _, old = reg.popitem(last=False)
                pool.pages_release(old)

    # ------------------------------------------------------------------
    def _prefill_tick(self) -> List[StepEvent]:
        """Write one prompt chunk for every prefilling slot."""
        pf = [b for b, s in enumerate(self.slots)
              if s is not None and s.prefilling]
        if not pf:
            return []
        B = self.max_batch
        chunk = self.prefill_chunk or max(
            len(self.slots[b].req.prompt) - self.slots[b].prefill_pos
            for b in pf)
        T = _round_up(
            max(min(chunk,
                    len(self.slots[b].req.prompt) - self.slots[b].prefill_pos)
                for b in pf),
            self.prefill_bucket)
        toks = np.zeros((B, T), np.int32)
        new_lens = np.zeros((B,), np.int32)
        for b in pf:
            s = self.slots[b]
            n = min(T, len(s.req.prompt) - s.prefill_pos)
            toks[b, :n] = s.req.prompt[s.prefill_pos:s.prefill_pos + n]
            new_lens[b] = n
        logits, self.cache = self._prefill_fn(
            self.params, self.cache, jnp.asarray(toks),
            jnp.asarray(new_lens))
        logits = np.asarray(logits)

        events: List[StepEvent] = []
        for b in pf:
            s = self.slots[b]
            s.prefill_pos += int(new_lens[b])
            self._hlens[b] += int(new_lens[b])
            if not s.prefilling:  # prompt complete -> first token
                self._publish_prefix(b, s)
                first = self._sample(logits[b, 0], s.req.temperature, s.rng)
                s.generated.append(first)
                s.pending = first
                events.append(self._maybe_finish(b, s, first))
        return events

    # ------------------------------------------------------------------
    def step(self) -> List[StepEvent]:
        """One scheduler tick; returns per-request token events."""
        self._admit_slots()
        prefilling = [b for b, s in enumerate(self.slots)
                      if s is not None and s.prefilling]
        decoding = [b for b, s in enumerate(self.slots)
                    if s is not None and not s.prefilling]

        # Alternate prefill chunks and decode bursts so neither phase
        # starves the other.
        if prefilling and (self._prefer_prefill or not decoding):
            self._prefer_prefill = False
            self.last_tick = "prefill"
            return self._prefill_tick()
        self._prefer_prefill = True
        if not decoding:
            self.last_tick = None
            return []
        self.last_tick = "decode"

        B = self.max_batch
        toks = np.zeros((B,), np.int32)
        active = np.zeros((B,), bool)
        for b in decoding:
            toks[b] = self.slots[b].pending
            active[b] = True

        # Burst: K chained on-device steps, ONE host fetch at the end.
        # K is bounded by the logical headroom of every decoding slot
        # (finished-mid-burst slots keep appending junk until the burst
        # ends) and by the longest remaining request. Sampling happens
        # on device too (decode_sample_step carries the PRNG key), so
        # temperature > 0 requests burst just like greedy ones.
        remaining = max(self.slots[b].req.max_new_tokens
                        - len(self.slots[b].generated)
                        for b in decoding)
        headroom = min(self.quest.max_seq_len - int(self._hlens[b])
                       for b in decoding)
        K = max(1, min(self.burst, remaining, headroom))
        greedy = all(self.slots[b].req.temperature <= 0.0
                     for b in decoding)
        act_dev = jnp.asarray(active)
        tok = jnp.asarray(toks)
        outs = []
        if greedy:
            for _ in range(K):
                tok, self.cache = self._tok_fn(self.params, self.cache,
                                               tok, act_dev)
                outs.append(tok)
        else:
            temps = np.zeros((B,), np.float32)
            for b in decoding:
                temps[b] = max(self.slots[b].req.temperature, 0.0)
            temps = jnp.asarray(temps)
            for _ in range(K):
                tok, self._key, self.cache = self._sample_fn(
                    self.params, self.cache, tok, self._key, temps,
                    act_dev)
                outs.append(tok)
        arr = np.stack([np.asarray(t) for t in outs], axis=1)  # [B, K]
        for b in decoding:
            self._hlens[b] += K
        # Emit in token-time order (step-major) so cross-request
        # finish ordering matches the unbatched semantics.
        events: List[StepEvent] = []
        done = set()
        for k in range(K):
            for b in decoding:
                if b in done:
                    continue        # junk tail of the burst is dropped
                slot = self.slots[b]
                nxt = int(arr[b, k])
                slot.generated.append(nxt)
                slot.pending = nxt
                ev = self._maybe_finish(b, slot, nxt)
                events.append(ev)
                if ev.finished:
                    done.add(b)
        return events

    def _maybe_finish(self, b: int, slot: _Slot, token: int) -> StepEvent:
        req = slot.req
        done = (len(slot.generated) >= req.max_new_tokens
                or (req.eos_token_id is not None
                    and token == req.eos_token_id))
        if done:
            self.slots[b] = None
            # Recycle: blocks back to the slot's group allocator, table
            # row to scratch, fill pointer reset. Borrowed prefix
            # blocks drop this slot's hold (the registry keeps its own).
            pool = self.pools[self._group(b)]
            if slot.shared_blocks:
                pool.pages_release(slot.shared_blocks)
            pool.seq_release(slot.sid)
            self._chains.pop(req.uid, None)
            self._hlens[b] = 0
            self.cache = dataclasses.replace(
                self.cache,
                block_tab=self.cache.block_tab.at[b].set(0),
                seq_lens=self.cache.seq_lens.at[b].set(0))
        return StepEvent(uid=req.uid, token=token, finished=done)

    @staticmethod
    def _sample(logits: np.ndarray, temperature: float,
                rng: np.random.Generator) -> int:
        if temperature <= 0.0:
            return int(np.argmax(logits))
        x = logits.astype(np.float64) / temperature
        x -= x.max()
        p = np.exp(x)
        p /= p.sum()
        return int(rng.choice(len(p), p=p))

    # ------------------------------------------------------------------
    def run(self, requests: Sequence[Request]) -> Dict[int, List[int]]:
        """Submit everything, tick until drained, return generations."""
        for r in requests:
            self.submit(r)
        out: Dict[int, List[int]] = {}
        gens: Dict[int, List[int]] = {r.uid: [] for r in requests}
        while self.has_work():
            for ev in self.step():
                gens[ev.uid].append(ev.token)
                if ev.finished:
                    out[ev.uid] = gens[ev.uid]
        return out
