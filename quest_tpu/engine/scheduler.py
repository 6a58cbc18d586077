"""Continuous batching scheduler.

The reference is strictly batch-size-1 (`assert bsz == 1`,
`/root/reference/quest/models/QuestAttention.py:68`); multi-request
serving is a new first-class component of the TPU build (SURVEY.md
§2.4). Design:

  * The paged pool has ``max_batch`` **slots** with independent
    ``seq_lens`` — all shapes static, so slot occupancy never triggers
    recompilation.
  * A **tick** is either one whole-batch decode step (idle slots ride
    along masked-inactive and do not advance — models/llama.py
    ``decode_step(active=...)``) or one prefill step that admits queued
    requests into free slots (busy slots pass ``new_lens=0`` and are
    untouched: prefill scratch lands in their garbage region beyond
    ``seq_len``, see kv/paged_kv.py invariant).
  * Finished slots are recycled by zeroing their ``seq_lens`` entry —
    the pool itself is reused (the `quest_clear()` analogue,
    `/root/reference/quest/models/llama.py:554-560`).

This is non-chunked continuous batching: admissions happen between
decode steps, like early vLLM. Per-request sampling params are applied
host-side on the returned logits.

Greedy requests decode in **bursts**: ``burst`` chained on-device
dispatches (argmax token fed straight back, cache donated) per host
round-trip, because a per-token logits fetch costs ~tens of ms through
remote dispatch (see models/llama.py:decode_token_step). A request
that finishes mid-burst over-generates into its slot until the burst
ends; the junk is trimmed host-side and the slot (recycled to
seq_len 0) never exposes it. Sampled requests burst too: the PRNG key
rides on device (models/llama.py:decode_sample_step); only the first
token of each request (at admission) is sampled host-side from the
prefill logits.
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
    pending: int              # next token to feed
    rng: np.random.Generator


@dataclasses.dataclass
class StepEvent:
    uid: int
    token: int
    finished: bool


class ContinuousBatchingEngine:
    """Serve many requests through a fixed-capacity slot pool."""

    def __init__(self, cfg: ModelConfig, quest: QuestConfig, params: Params,
                 max_batch: int = 4, prefill_bucket: int = 256,
                 seed: int = 0, burst: int = 16):
        self.cfg = cfg
        self.quest = quest
        self.params = params
        self.max_batch = max_batch
        self.prefill_bucket = prefill_bucket
        self.burst = max(1, burst)
        self.model = QuestModel(cfg, quest)
        self.cache = init_cache(cfg, quest, max_batch)
        self._prefill_fn = jax.jit(self.model.prefill_last,
                                   donate_argnums=(1,))
        self._tok_fn = jax.jit(self.model.decode_token_step,
                               donate_argnums=(1,))
        self._sample_fn = jax.jit(self.model.decode_sample_step,
                                  donate_argnums=(1,))
        self.slots: List[Optional[_Slot]] = [None] * max_batch
        self.queue: deque[Request] = deque()
        self._seed = seed
        self._key = jax.random.PRNGKey(seed)
        # Host mirror of per-slot lengths: admission headroom and burst
        # bounds without device fetches.
        self._hlens = np.zeros((max_batch,), np.int64)

    # ------------------------------------------------------------------
    def submit(self, req: Request) -> None:
        if len(req.prompt) + req.max_new_tokens > self.quest.max_seq_len:
            raise ValueError(f"request {req.uid} exceeds max_seq_len")
        self.queue.append(req)

    @property
    def num_active(self) -> int:
        return sum(s is not None for s in self.slots)

    def has_work(self) -> bool:
        return bool(self.queue) or self.num_active > 0

    # ------------------------------------------------------------------
    def _admit(self) -> List[StepEvent]:
        """Move queued requests into free slots via one prefill tick.

        Admission is deferred while any BUSY slot lacks ``T`` tokens of
        pool headroom: the whole-batch prefill writes ``T`` scratch
        tokens beyond every busy slot's ``seq_len``, and past the pool
        end the clamped window write would corrupt its valid tokens.
        Busy slots always finish (max_new_tokens is bounded), so
        deferral cannot deadlock.
        """
        free = [b for b, s in enumerate(self.slots) if s is None]
        if not free or not self.queue:
            return []
        pool_tokens = self.quest.max_pages * self.quest.page_size
        busy_max = max((int(self._hlens[b])
                        for b, s in enumerate(self.slots) if s is not None),
                      default=0)
        headroom = pool_tokens - busy_max
        admits: List[tuple] = []
        while free and self.queue:
            T_next = _round_up(len(self.queue[0].prompt),
                               self.prefill_bucket)
            if T_next > headroom:
                break
            admits.append((free.pop(0), self.queue.popleft()))
        if not admits:
            return []

        B = self.max_batch
        max_len = max(len(r.prompt) for _, r in admits)
        T = _round_up(max_len, self.prefill_bucket)
        toks = np.zeros((B, T), np.int32)
        new_lens = np.zeros((B,), np.int32)
        # Free the admitted slots' previous state (the quest_clear
        # analogue), then prefill at offset 0.
        for b, req in admits:
            toks[b, : len(req.prompt)] = req.prompt
            new_lens[b] = len(req.prompt)
            self._hlens[b] = len(req.prompt)
        reset = np.asarray([b for b, _ in admits], np.int32)
        self.cache = dataclasses.replace(
            self.cache,
            seq_lens=self.cache.seq_lens.at[reset].set(0))

        logits, self.cache = self._prefill_fn(
            self.params, self.cache, jnp.asarray(toks),
            jnp.asarray(new_lens))
        logits = np.asarray(logits)

        events: List[StepEvent] = []
        for b, req in admits:
            rng = np.random.default_rng(self._seed * 7919 + req.uid)
            first = self._sample(logits[b, 0], req.temperature, rng)
            slot = _Slot(req=req, generated=[first], pending=first, rng=rng)
            self.slots[b] = slot
            events.append(self._maybe_finish(b, slot, first))
        return events

    # ------------------------------------------------------------------
    def step(self) -> List[StepEvent]:
        """One scheduler tick; returns per-request token events."""
        events = self._admit()

        active_idx = [b for b, s in enumerate(self.slots) if s is not None]
        if not active_idx:
            return events

        B = self.max_batch
        toks = np.zeros((B,), np.int32)
        active = np.zeros((B,), bool)
        for b in active_idx:
            toks[b] = self.slots[b].pending
            active[b] = True

        # Burst: K chained on-device steps, ONE host fetch at the end.
        # K is bounded by the pool headroom of every active slot
        # (finished-mid-burst slots keep appending junk until the burst
        # ends) and by the longest remaining request. Sampling happens
        # on device too (decode_sample_step carries the PRNG key), so
        # temperature > 0 requests burst just like greedy ones.
        remaining = max(self.slots[b].req.max_new_tokens
                        - len(self.slots[b].generated)
                        for b in active_idx)
        headroom = min(self.quest.max_seq_len - int(self._hlens[b])
                       for b in active_idx)
        K = max(1, min(self.burst, remaining, headroom))
        greedy = all(self.slots[b].req.temperature <= 0.0
                     for b in active_idx)
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
            for b in active_idx:
                temps[b] = max(self.slots[b].req.temperature, 0.0)
            temps = jnp.asarray(temps)
            for _ in range(K):
                tok, self._key, self.cache = self._sample_fn(
                    self.params, self.cache, tok, self._key, temps,
                    act_dev)
                outs.append(tok)
        arr = np.stack([np.asarray(t) for t in outs], axis=1)  # [B, K]
        for b in active_idx:
            self._hlens[b] += K
        # Emit in token-time order (step-major) so cross-request
        # finish ordering matches the unbatched semantics.
        done = set()
        for k in range(K):
            for b in active_idx:
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
            # Recycle the slot: pool reused, fill pointer reset.
            self._hlens[b] = 0
            self.cache = dataclasses.replace(
                self.cache,
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
