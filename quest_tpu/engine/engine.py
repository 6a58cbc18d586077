"""Inference engine — the controller + generation loop.

Reference counterparts: `InferenceController`
(`/root/reference/quest/utils/controller.py`) and the
`quest_init`/`quest_clear` lifecycle
(`/root/reference/quest/models/llama.py:520-560`) plus the manual decode
loops in `scripts/bench_textgen.py:39-106`.

TPU-first: all per-step state (pages, metadata, seq_lens) lives on
device inside a donated pytree; a decode step is ONE jitted call with no
host-side planning, index uploads, or per-step allocation (the
reference's `begin_forward` rebuilds device tensors and calls into a
CUDA planner each token). `clear()` is a scalar reset — the pool is
reused, mirroring `quest_clear()` semantics.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from quest_tpu.config import ModelConfig, QuestConfig
from quest_tpu.kv.paged_kv import PagedKVCache, init_cache
from quest_tpu.models.llama import Params, QuestModel
from quest_tpu.ops.pallas_utils import round_up as _round_up


class QuestEngine:
    """Single-host engine: paged cache + jitted prefill/decode steps."""

    def __init__(self, cfg: ModelConfig, quest: QuestConfig, params: Params,
                 batch_size: int = 1, prefill_bucket: int = 256,
                 prefill_chunk: int = 16384):
        self.cfg = cfg
        self.quest = quest
        self.params = params
        self.batch_size = batch_size
        self.prefill_bucket = prefill_bucket
        # Long prompts prefill in chunks of at most this many tokens:
        # a single whole-prompt call materializes [B, T, hid] (+ q/k/v)
        # activations — at 128K x 4096 hid that is several GB each and
        # OOMs one chip (measured: 20.6 G needed vs 15.75 G HBM).
        self.prefill_chunk = prefill_chunk
        self.model = QuestModel(cfg, quest)
        self.cache = init_cache(cfg, quest, batch_size)

        # Host mirror of seq_lens: overflow guards without device syncs.
        self._host_lens = np.zeros((batch_size,), np.int64)
        self._prefill_fn = jax.jit(self.model.prefill_last,
                                   donate_argnums=(1,))
        self._decode_fn = jax.jit(self.model.decode_step, donate_argnums=(1,))
        self._tok_fn = jax.jit(self.model.decode_token_step,
                               donate_argnums=(1,))
        self._nll_fn = jax.jit(self.model.decode_nll_step,
                               donate_argnums=(1,))

    # -- lifecycle (quest_init/quest_clear analogues) --------------------
    def clear(self) -> None:
        """Reset for a new conversation; the pool is reused
        (`quest_clear`/`clean_states`, `controller.py:144-146`)."""
        self.cache = dataclasses.replace(
            self.cache,
            seq_lens=jnp.zeros((self.batch_size,), jnp.int32))
        self._host_lens[:] = 0

    @property
    def seq_lens(self) -> np.ndarray:
        return np.asarray(self.cache.seq_lens)

    # -- steps -----------------------------------------------------------
    def prefill(self, prompts: Sequence[Sequence[int]]) -> np.ndarray:
        """Prefill (or continue) each sequence; returns last-token logits
        [B, V]. Prompts are padded to a bucket multiple to bound jit
        recompilation across prompt lengths; prompts longer than
        ``prefill_chunk`` run as several chunked calls (bounds the
        activation footprint at long context)."""
        B = self.batch_size
        assert len(prompts) == B
        remaining = [list(p) for p in prompts]
        out = np.zeros((B, self.cfg.vocab_size), np.float32)
        while any(remaining):
            chunk = [p[:self.prefill_chunk] for p in remaining]
            remaining = [p[self.prefill_chunk:] for p in remaining]
            lens = np.array([len(p) for p in chunk], np.int32)
            T = _round_up(max(int(lens.max()), 1), self.prefill_bucket)
            if int(self._host_lens.max()) + T > self.quest.max_seq_len:
                raise ValueError(
                    f"prompt chunk of {T} (bucketed) tokens exceeds "
                    f"max_seq_len={self.quest.max_seq_len} at current "
                    f"fill {self._host_lens.max()}")
            toks = np.zeros((B, T), np.int32)
            for b, p in enumerate(chunk):
                toks[b, :len(p)] = np.asarray(p, np.int32)
            logits, self.cache = self._prefill_fn(
                self.params, self.cache, jnp.asarray(toks),
                jnp.asarray(lens))
            self._host_lens += lens
            # Keep each row's logits from the chunk holding ITS last
            # real token (rows finishing early ride later chunks with
            # lens=0, whose returned row logits are garbage for them).
            got = np.asarray(logits)[:, 0]
            out[lens > 0] = got[lens > 0]
        return out

    def _check_decode_room(self, n: int = 1) -> None:
        if int(self._host_lens.max()) + n > self.quest.max_seq_len:
            raise ValueError(
                f"decode past max_seq_len={self.quest.max_seq_len}: the "
                "append would clamp into the last page and corrupt it; "
                "raise QuestConfig.max_seq_len or clear() the engine")

    def decode(self, tokens: Sequence[int]) -> np.ndarray:
        """One decode step for the batch; returns logits [B, V]."""
        self._check_decode_room()
        logits, self.cache = self._decode_fn(
            self.params, self.cache,
            jnp.asarray(np.asarray(tokens, np.int32)))
        self._host_lens += 1
        return np.asarray(logits)

    # -- generation -------------------------------------------------------
    def generate(self, prompts: Sequence[Sequence[int]],
                 max_new_tokens: int, temperature: float = 0.0,
                 eos_token_id: Optional[int] = None,
                 seed: int = 0) -> List[List[int]]:
        """Greedy (temperature=0) or sampled generation."""
        B = self.batch_size
        logits = self.prefill(prompts)
        key = jax.random.PRNGKey(seed)
        out: List[List[int]] = [[] for _ in range(B)]
        done = np.zeros((B,), bool)
        next_tok = self._sample(logits, temperature, key, 0)
        for step in range(max_new_tokens):
            for b in range(B):
                if not done[b]:
                    out[b].append(int(next_tok[b]))
                    if eos_token_id is not None and next_tok[b] == eos_token_id:
                        done[b] = True
            if done.all() or step == max_new_tokens - 1:
                break
            logits = self.decode(next_tok)
            next_tok = self._sample(logits, temperature, key, step + 1)
        return out

    def generate_ondevice(self, prompts: Sequence[Sequence[int]],
                          max_new_tokens: int,
                          eos_token_id: Optional[int] = None
                          ) -> List[List[int]]:
        """Greedy generation as a pipeline of async donated decode
        dispatches with NO per-step host sync — the device runs steps
        back-to-back while the host races ahead enqueueing (the serving
        path; a per-token fetch costs ~ms through remote dispatch).
        Tokens are fetched once at the end; EOS is trimmed host-side."""
        logits = self.prefill(prompts)
        self._check_decode_room(max_new_tokens - 1)
        tok = jnp.asarray(np.argmax(logits, axis=-1).astype(np.int32))
        toks = [tok]
        for _ in range(max_new_tokens - 1):
            tok, self.cache = self._tok_fn(self.params, self.cache, tok)
            toks.append(tok)
        self._host_lens += max_new_tokens - 1
        out = np.stack([np.asarray(t) for t in toks], axis=1)  # [B, N]
        res: List[List[int]] = []
        for row in out:
            row = row.tolist()
            if eos_token_id is not None and eos_token_id in row:
                row = row[: row.index(eos_token_id) + 1]
            res.append(row)
        return res

    # -- on-device eval bursts -------------------------------------------
    # The eval harnesses run at serving speed through these: every decode
    # dispatch is async + donated, the host never fetches per token (a
    # per-token fetch costs ~tens of ms through remote dispatch), and
    # tiny results are pulled in bulk every ``sync_every`` steps (which
    # also bounds the dispatch queue depth).

    def feed_ondevice(self, tokens: np.ndarray,
                      sync_every: int = 512) -> None:
        """Advance the cache over known tokens ([B, N], e.g. a question
        fed as decode so sparsity applies, reference `passkey.py:68-97`)
        without fetching any logits."""
        tokens = np.asarray(tokens, np.int32)
        B, N = tokens.shape
        assert B == self.batch_size
        self._check_decode_room(N)
        sync = None
        for t in range(N):
            logits, self.cache = self._decode_fn(
                self.params, self.cache, jnp.asarray(tokens[:, t]))
            if (t + 1) % sync_every == 0:
                np.asarray(logits[:, 0])    # throttle the dispatch queue
        self._host_lens += N

    def score_ondevice(self, tokens: np.ndarray, targets: np.ndarray,
                       sync_every: int = 256) -> np.ndarray:
        """Teacher-forced decode NLLs: feed ``tokens[:, t]``, score
        ``targets[:, t]`` (usually ``tokens`` shifted by one). Returns
        [B, N] f32 NLLs, fetched one stacked chunk per ``sync_every``
        steps — the perplexity-eval hot loop."""
        tokens = np.asarray(tokens, np.int32)
        targets = np.asarray(targets, np.int32)
        B, N = tokens.shape
        assert targets.shape == (B, N) and B == self.batch_size
        self._check_decode_room(N)
        out = np.empty((B, N), np.float32)
        pend: List = []
        base = 0
        for t in range(N):
            nll, self.cache = self._nll_fn(
                self.params, self.cache, jnp.asarray(tokens[:, t]),
                jnp.asarray(targets[:, t]))
            pend.append(nll)
            if len(pend) == sync_every or t == N - 1:
                out[:, base:base + len(pend)] = np.asarray(
                    jnp.stack(pend, axis=1))
                base += len(pend)
                pend = []
        self._host_lens += N
        return out

    def greedy_ondevice(self, first_tokens: Sequence[int],
                        n: int, sync_every: int = 512) -> np.ndarray:
        """Feed ``first_tokens`` [B] and greedily generate ``n`` tokens
        on device (argmax fed straight back); returns [B, n] int32.
        Unlike :meth:`generate_ondevice` this continues from the current
        cache state (e.g. right after a decoded question)."""
        self._check_decode_room(n)
        tok = jnp.asarray(np.asarray(first_tokens, np.int32))
        toks = []
        for t in range(n):
            tok, self.cache = self._tok_fn(self.params, self.cache, tok)
            toks.append(tok)
            if (t + 1) % sync_every == 0:
                np.asarray(tok)             # throttle the dispatch queue
        self._host_lens += n
        return np.stack([np.asarray(t) for t in toks], axis=1)

    @staticmethod
    def _sample(logits: np.ndarray, temperature: float, key, step: int):
        if temperature <= 0.0:
            return np.argmax(logits, axis=-1).astype(np.int32)
        k = jax.random.fold_in(key, step)
        g = jax.random.categorical(k, jnp.asarray(logits) / temperature,
                                   axis=-1)
        return np.asarray(g, np.int32)
