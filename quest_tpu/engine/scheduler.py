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
                 seed: int = 0):
        self.cfg = cfg
        self.quest = quest
        self.params = params
        self.max_batch = max_batch
        self.prefill_bucket = prefill_bucket
        self.model = QuestModel(cfg, quest)
        self.cache = init_cache(cfg, quest, max_batch)
        self._prefill_fn = jax.jit(self.model.prefill_last,
                                   donate_argnums=(1,))
        self._decode_fn = jax.jit(self.model.decode_step,
                                  donate_argnums=(1,))
        self.slots: List[Optional[_Slot]] = [None] * max_batch
        self.queue: deque[Request] = deque()
        self._seed = seed

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
        busy_max = max((int(np.asarray(self.cache.seq_lens)[b])
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
        seq_lens = np.array(self.cache.seq_lens)  # writable copy
        for b, req in admits:
            toks[b, : len(req.prompt)] = req.prompt
            new_lens[b] = len(req.prompt)
            seq_lens[b] = 0
        self.cache = dataclasses.replace(
            self.cache, seq_lens=jnp.asarray(seq_lens))

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
        logits, self.cache = self._decode_fn(
            self.params, self.cache, jnp.asarray(toks),
            jnp.asarray(active))
        logits = np.asarray(logits)

        for b in active_idx:
            slot = self.slots[b]
            if slot is None:
                continue
            nxt = self._sample(logits[b], slot.req.temperature, slot.rng)
            slot.generated.append(nxt)
            slot.pending = nxt
            events.append(self._maybe_finish(b, slot, nxt))
        return events

    def _maybe_finish(self, b: int, slot: _Slot, token: int) -> StepEvent:
        req = slot.req
        done = (len(slot.generated) >= req.max_new_tokens
                or (req.eos_token_id is not None
                    and token == req.eos_token_id))
        if done:
            self.slots[b] = None
            # Recycle the slot: pool reused, fill pointer reset.
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
