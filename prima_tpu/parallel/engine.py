"""Distributed inference engine: continuous batching over the piped ring.

The reference's hardest interaction (SURVEY §7 hard part 5): server slots
share the ring so the pipeline never idles. Here the slot pool is the
pipeline's microbatch grid — slot (m, b) is row b of microbatch m — and one
step() drives a full piped-ring pass for every active slot:

  prefill pass: each PREFILL slot contributes its next prompt chunk
  decode pass:  every DECODE slot advances one token

Parked rows ride along (their KV writes land at/after their cache_pos and
are overwritten before the causal mask ever admits them — same invariant as
the single-chip engine). The per-shape jitted pipeline functions are cached
by sequence-length bucket.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from enum import Enum
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.llama import ForwardOptions
from ..sampling import Sampler, SamplerParams
from .pipeline import PipeSpec, init_pipe_kv, make_pipe_forward
from ..runtime.engine import SlotState, StepEvent, _bucket


@dataclass
class DSlot:
    m: int
    b: int
    state: SlotState = SlotState.IDLE
    prompt: list[int] = field(default_factory=list)
    n_prompt_done: int = 0
    generated: list[int] = field(default_factory=list)
    sampler: Sampler | None = None
    n_predict: int = -1
    request_id: Any = None
    stop_reason: str | None = None

    @property
    def id(self) -> tuple[int, int]:
        return (self.m, self.b)


class DistributedEngine:
    """Engine-compatible surface over the (dp, pp, tp) mesh pipeline."""

    def __init__(self, cfg: ModelConfig, params: dict, spec: PipeSpec, mesh,
                 batch_per_micro: int = 1, max_seq: int = 2048, n_batch: int = 64,
                 opts: ForwardOptions | None = None, kv_dtype=jnp.bfloat16,
                 eog_ids: set[int] | None = None):
        self.cfg = cfg
        self.params = params
        self.spec = spec
        self.mesh = mesh
        self.opts = opts or ForwardOptions()
        self.M, self.B = spec.microbatches, batch_per_micro
        self.max_seq = max_seq
        self.n_batch = n_batch
        self.eog_ids = eog_ids or set()
        self.kv = init_pipe_kv(cfg, spec, mesh, batch_per_micro, max_seq, kv_dtype)
        self.cache_pos = np.zeros((self.M, self.B), np.int32)
        self.slots = [DSlot(m, b) for m in range(self.M) for b in range(self.B)]
        self.n_decode_calls = 0
        self._fwd_cache: dict[int, Any] = {}

    def _fwd(self, s_len: int):
        fn = self._fwd_cache.get(s_len)
        if fn is None:
            fn = jax.jit(make_pipe_forward(self.cfg, self.spec, self.mesh, self.opts))
            self._fwd_cache[s_len] = fn
        return fn

    # -- request management --------------------------------------------------

    def find_idle_slot(self) -> DSlot | None:
        for s in self.slots:
            if s.state == SlotState.IDLE:
                return s
        return None

    def submit(self, prompt_tokens: list[int], sampler: Sampler | None = None,
               n_predict: int = -1, request_id: Any = None) -> DSlot:
        if not prompt_tokens:
            raise ValueError("empty prompt")
        if len(prompt_tokens) >= self.max_seq - self.n_batch:
            # leave decode headroom: dynamic_update_slice would CLAMP an
            # overshooting write and silently corrupt cached cells
            raise ValueError(
                f"prompt ({len(prompt_tokens)}) exceeds max_seq - n_batch "
                f"({self.max_seq - self.n_batch})")
        slot = self.find_idle_slot()
        if slot is None:
            raise RuntimeError("no idle slot")
        self.cache_pos[slot.m, slot.b] = 0
        slot.state = SlotState.PREFILL
        slot.prompt = list(prompt_tokens)
        slot.n_prompt_done = 0
        slot.generated = []
        slot.sampler = sampler or Sampler(SamplerParams(temp=0.0))
        slot.n_predict = n_predict
        slot.request_id = request_id
        slot.stop_reason = None
        for t in prompt_tokens:
            slot.sampler.accept(t, accept_grammar=False)
        if len(prompt_tokens) == 1:
            slot.state = SlotState.DECODE
        return slot

    def cancel(self, request_id: Any) -> bool:
        for s in self.slots:
            if s.request_id == request_id and s.state != SlotState.IDLE:
                s.state = SlotState.IDLE
                s.stop_reason = "cancelled"
                return True
        return False

    # -- scheduler tick --------------------------------------------------------

    def _run_pass(self, s_len: int, tokens: np.ndarray, positions: np.ndarray):
        fwd = self._fwd(s_len)
        logits, self.kv = fwd(self.params, jnp.asarray(tokens),
                              jnp.asarray(positions), jnp.asarray(self.cache_pos),
                              self.kv)
        self.n_decode_calls += 1
        return np.asarray(logits, dtype=np.float32)

    def step(self) -> list[StepEvent]:
        events: list[StepEvent] = []

        prefill = [s for s in self.slots if s.state == SlotState.PREFILL]
        if prefill:
            chunk_len = min(self.n_batch,
                            max(len(s.prompt) - 1 - s.n_prompt_done for s in prefill))
            s_len = _bucket(max(chunk_len, 1), self.n_batch)
            tokens = np.zeros((self.M, self.B, s_len), np.int32)
            positions = (np.broadcast_to(
                np.arange(s_len, dtype=np.int32), (self.M, self.B, s_len)
            ) + self.cache_pos[..., None]).astype(np.int32)
            took = {}
            for s in prefill:
                chunk = s.prompt[s.n_prompt_done : min(s.n_prompt_done + s_len,
                                                       len(s.prompt) - 1)]
                tokens[s.m, s.b, : len(chunk)] = chunk
                took[s.id] = len(chunk)
            self._run_pass(s_len, tokens, positions)
            for s in prefill:
                n = took[s.id]
                self.cache_pos[s.m, s.b] += n
                s.n_prompt_done += n
                if s.n_prompt_done >= len(s.prompt) - 1:
                    s.state = SlotState.DECODE

        active = [s for s in self.slots if s.state == SlotState.DECODE]
        if not active:
            return events

        tokens = np.zeros((self.M, self.B, 1), np.int32)
        for s in active:
            tokens[s.m, s.b, 0] = s.generated[-1] if s.generated else s.prompt[-1]
        positions = self.cache_pos[..., None].copy()
        logits = self._run_pass(1, tokens, positions)
        for s in active:
            self.cache_pos[s.m, s.b] += 1

        for s in active:
            tok = s.sampler.sample_and_accept(logits[s.m, s.b, -1])
            s.generated.append(tok)
            done, reason = self._check_stop(s, tok)
            if done:
                s.state = SlotState.IDLE
                s.stop_reason = reason
            events.append(StepEvent(s.id, s.request_id, tok, done, reason))
        return events

    def _check_stop(self, slot: DSlot, tok: int) -> tuple[bool, str | None]:
        if tok in self.eog_ids:
            return True, "eog"
        if slot.n_predict >= 0 and len(slot.generated) >= slot.n_predict:
            return True, "length"
        # stop n_batch early: a parked row must never sit within s_len of the
        # cache end while another slot prefills (dynamic_update_slice clamps
        # its start index and would overwrite the parked tail)
        if self.cache_pos[slot.m, slot.b] >= self.max_seq - self.n_batch:
            return True, "context_full"
        return False, None

    def run_to_completion(self, prompt_tokens: list[int], **kw) -> list[int]:
        slot = self.submit(prompt_tokens, **kw)
        while slot.state != SlotState.IDLE:
            self.step()
        return list(slot.generated)
