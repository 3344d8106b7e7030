"""Distributed inference engine: continuous batching over the piped ring.

The reference's hardest interaction (SURVEY §7 hard part 5): server slots
share the ring so the pipeline never idles (update_slots + llama_decode(ctx,
batch_view, true), examples/server/server.cpp:1996-2451). Here the slot pool
is the pipeline's microbatch grid — slot (m, b) is row b of microbatch m —
and one step() drives a full piped-ring pass for every active slot:

  prefill pass: each PREFILL slot contributes its next prompt chunk
  decode pass:  every DECODE slot advances one token

Parked rows ride along (their KV writes land at/after their cache_pos and
are overwritten before the causal mask ever admits them — same invariant as
the single-chip engine). The per-shape jitted pipeline functions are cached
by sequence-length bucket.

The engine exposes the SAME surface as runtime.engine.Engine (n_slots,
slots[flat_id], kv with seq ops, embed, perf counters, ctx-shift), so the
server's EngineWorker drives a mesh-distributed model unchanged — the
analogue of the reference server calling llama_decode on a distributed ctx
(server.cpp:2431).
"""

from __future__ import annotations

import time as _time
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.llama import ForwardOptions
from ..sampling import Sampler, SamplerParams
from ..runtime.engine import SlotState, StepEvent, _bucket
from .pipe_kv import PipeKV
from .pipeline import PipeSpec, make_pipe_forward


@dataclass
class DSlot:
    m: int
    b: int
    n_slots_b: int = 1  # batch_per_micro (for flat id)
    state: SlotState = SlotState.IDLE
    prompt: list[int] = field(default_factory=list)
    n_prompt_done: int = 0
    generated: list[int] = field(default_factory=list)
    sampler: Sampler | None = None
    n_predict: int = -1
    request_id: Any = None
    stop_reason: str | None = None
    n_probs: int = 0
    shifts: list = field(default_factory=list)
    # Self-Extend grouped attention (main.cpp:618-640)
    ga_i: int = 0
    pos_delta: int = 0  # logical (RoPE) position - physical write index
    pos_map: Any = None  # per-cell logical positions (lazy)

    @property
    def id(self) -> int:
        """Flat slot id (server-visible, like the reference's slot.id)."""
        return self.m * self.n_slots_b + self.b


class DistributedEngine:
    """Engine-compatible surface over the (dp, pp, tp) mesh pipeline."""

    use_scan = False  # stacked-scan is a single-chip concept

    def __init__(self, cfg: ModelConfig, params: dict, spec: PipeSpec, mesh,
                 batch_per_micro: int = 1, max_seq: int = 2048, n_batch: int = 64,
                 opts: ForwardOptions | None = None, kv_dtype=jnp.bfloat16,
                 eog_ids: set[int] | None = None, ctx_shift: bool = False,
                 n_keep: int = 0, grp_attn_n: int = 1, grp_attn_w: int = 512):
        self.cfg = cfg
        self.params = params
        self.spec = spec
        self.mesh = mesh
        self.opts = opts or ForwardOptions()
        self.M, self.B = spec.microbatches, batch_per_micro
        self.max_seq = max_seq
        self.n_batch = n_batch
        self.eog_ids = eog_ids or set()
        self.ctx_shift = ctx_shift
        self.n_keep = n_keep
        assert grp_attn_n >= 1
        assert grp_attn_n == 1 or grp_attn_w % grp_attn_n == 0, \
            "grp_attn_w must be a multiple of grp_attn_n (main.cpp:221)"
        assert not (ctx_shift and grp_attn_n > 1), \
            "context-shift and Self-Extend are mutually exclusive"
        self.grp_attn_n = grp_attn_n
        self.grp_attn_w = grp_attn_w
        self.kv = PipeKV(cfg, spec, mesh, batch_per_micro, max_seq, kv_dtype)
        # KV writes are dynamic_update_slice (clamped starts): every grid
        # row participates in every pipelined ubatch, so with >1 slot a
        # PARKED row within s_len of the end would have its garbage write
        # shifted onto real cells — reserve n_batch. A single-slot grid has
        # no parked rows and gets the full cache (single-chip semantics).
        self._row_limit = (max_seq if self.M * self.B == 1
                           else max_seq - n_batch)
        assert self._row_limit > 0, "n_batch must be < max_seq"
        self.slots = [DSlot(m, b, batch_per_micro)
                      for m in range(self.M) for b in range(self.B)]
        self.n_decode_calls = 0
        self.perf = {"n_prompt": 0, "n_decode": 0, "t_prompt_s": 0.0,
                     "t_decode_s": 0.0}
        self._fwd_cache: dict[tuple, Any] = {}

    @property
    def n_slots(self) -> int:
        return self.M * self.B

    @property
    def cache_pos(self) -> np.ndarray:
        """(M, B) view of the flat per-slot cache positions."""
        return self.kv.cache_pos.reshape(self.M, self.B)

    def _fwd(self, s_len: int, return_hidden: bool = False):
        key = (s_len, return_hidden)
        fn = self._fwd_cache.get(key)
        if fn is None:
            fn = jax.jit(make_pipe_forward(self.cfg, self.spec, self.mesh,
                                           self.opts,
                                           return_hidden=return_hidden))
            self._fwd_cache[key] = fn
        return fn

    # -- request management --------------------------------------------------

    def find_idle_slot(self) -> DSlot | None:
        for s in self.slots:
            if s.state == SlotState.IDLE:
                return s
        return None

    def submit(self, prompt_tokens: list[int], sampler: Sampler | None = None,
               n_predict: int = -1, request_id: Any = None,
               reuse_prefix: bool = True, n_probs: int = 0) -> DSlot:
        if not prompt_tokens:
            raise ValueError("empty prompt")
        if len(prompt_tokens) >= self._row_limit:
            raise ValueError(
                f"prompt ({len(prompt_tokens)}) exceeds the per-slot "
                f"context limit ({self._row_limit})")
        slot = self.find_idle_slot()
        if slot is None:
            raise RuntimeError("no idle slot")
        # prompt-prefix reuse (cache_prompt / slot_prompt_similarity)
        common = 0
        if reuse_prefix and slot.prompt:
            limit = min(len(slot.prompt), len(prompt_tokens) - 1,
                        self.kv.used(slot.id))
            while common < limit and slot.prompt[common] == prompt_tokens[common]:
                common += 1
        self.kv.seq_rm(slot.id, p0=common)
        slot.state = SlotState.PREFILL
        slot.prompt = list(prompt_tokens)
        slot.n_prompt_done = common
        slot.generated = []
        slot.sampler = sampler or Sampler(SamplerParams(temp=0.0))
        slot.n_predict = n_predict
        slot.request_id = request_id
        slot.stop_reason = None
        slot.n_probs = n_probs
        slot.shifts = []
        slot.ga_i = 0
        slot.pos_delta = 0
        slot.pos_map = None
        for t in prompt_tokens:
            slot.sampler.accept(t, accept_grammar=False)
        if slot.n_prompt_done >= len(slot.prompt) - 1:
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

    def _run_pass(self, s_len: int, tokens: np.ndarray, positions: np.ndarray,
                  mask_positions: np.ndarray | None = None):
        fwd = self._fwd(s_len)
        logits, self.kv.arrays = fwd(
            self.params, jnp.asarray(tokens), jnp.asarray(positions),
            jnp.asarray(self.cache_pos), self.kv.arrays,
            jnp.asarray(positions if mask_positions is None
                        else mask_positions))
        self.n_decode_calls += 1
        return np.asarray(logits, dtype=np.float32)

    # -- Self-Extend grouped attention ----------------------------------------

    def _rope_delta_grid(self, pool) -> np.ndarray:
        """(M, B) per-slot logical-minus-physical rope offsets."""
        d = np.zeros((self.M, self.B), np.int32)
        for s in pool:
            d[s.m, s.b] = s.pos_delta
        return d

    def _apply_self_extend(self, slot: DSlot) -> None:
        """Shared compression logic (runtime.engine.apply_self_extend) over
        the SHARDED cache — pipe_kv.rope_shift re-rotates every owned
        window in one program, so no ring-wide kv-signal protocol is
        needed."""
        from ..runtime.engine import apply_self_extend

        apply_self_extend(slot, self.kv.used(slot.id), self.max_seq,
                          self.grp_attn_n, self.grp_attn_w,
                          lambda d: self.kv.rope_shift(slot.id, d))

    def _record_positions(self, slot: DSlot, pos0: int, n: int) -> None:
        if self.grp_attn_n <= 1:
            return
        if slot.pos_map is None:
            slot.pos_map = np.arange(self.max_seq, dtype=np.int64)
        slot.pos_map[pos0:pos0 + n] = (
            pos0 + slot.pos_delta + np.arange(n, dtype=np.int64))

    def _prefill_tick(self, only: list | None = None) -> bool:
        """One batched prefill pass over PREFILL slots (optionally a subset).
        Returns True if any prompt tokens were ingested."""
        t0 = _time.perf_counter()
        pool = only if only is not None else self.slots
        prefill = [s for s in pool if s.state == SlotState.PREFILL]
        if not prefill:
            return False
        if self.grp_attn_n > 1:
            for s in prefill:
                if s.pos_map is None:
                    s.pos_map = np.arange(self.max_seq, dtype=np.int64)
                self._apply_self_extend(s)
        chunk_len = min(self.n_batch,
                        max(len(s.prompt) - 1 - s.n_prompt_done for s in prefill))
        s_len = _bucket(max(chunk_len, 1), self.n_batch)
        # cap the padded bucket at the cache tail over EVERY grid row
        # (parked included): a clamped dynamic_update_slice write must
        # never shift onto real cells
        cap = self.max_seq - int(self.kv.cache_pos.max())
        s_len = min(s_len, max(cap, 1))
        tokens = np.zeros((self.M, self.B, s_len), np.int32)
        mask_positions = (np.broadcast_to(
            np.arange(s_len, dtype=np.int32), (self.M, self.B, s_len)
        ) + self.cache_pos[..., None]).astype(np.int32)
        positions = mask_positions + self._rope_delta_grid(prefill)[..., None]
        took = {}
        for s in prefill:
            chunk = s.prompt[s.n_prompt_done : min(s.n_prompt_done + s_len,
                                                   len(s.prompt) - 1)]
            tokens[s.m, s.b, : len(chunk)] = chunk
            took[s.id] = len(chunk)
        self._run_pass(s_len, tokens, positions, mask_positions)
        for s in prefill:
            n = took[s.id]
            self._record_positions(s, self.kv.used(s.id), n)
            self.kv.cache_pos[s.id] += n
            s.n_prompt_done += n
            self.perf["n_prompt"] += n
            if s.n_prompt_done >= len(s.prompt) - 1:
                s.state = SlotState.DECODE
        self.perf["t_prompt_s"] += _time.perf_counter() - t0
        return True

    # -- speculative-decoding protocol ----------------------------------------

    def prefill_only(self, slot: DSlot) -> None:
        while slot.state == SlotState.PREFILL:
            self._prefill_tick(only=[slot])

    def verify_chain(self, slot_id: int, chain: list[int]) -> np.ndarray:
        """Batched verification through the distributed pipeline: logits at
        every position of `chain` for one slot (draft-on-host + distributed
        target verify — reference server.cpp:2493-2560)."""
        s_len = len(chain)
        m, b = divmod(int(slot_id), self.B)
        pos0 = self.kv.used(slot_id)
        # every grid row writes padding at its own cache_pos: [pos, pos+s_len)
        # must stay inside the cache (clamped writes corrupt real cells)
        assert pos0 + s_len <= self.max_seq and (
            self.M * self.B == 1 or s_len <= self.n_batch), \
            f"verify chain of {s_len} does not fit at {pos0}"
        tokens = np.zeros((self.M, self.B, s_len), np.int32)
        tokens[m, b] = chain
        mask_positions = (np.broadcast_to(
            np.arange(s_len, dtype=np.int32), (self.M, self.B, s_len)
        ) + self.cache_pos[..., None]).astype(np.int32)
        positions = mask_positions.copy()
        slot = self.slots[slot_id]
        positions[m, b] += slot.pos_delta  # Self-Extend rope offset
        self._record_positions(slot, pos0, s_len)
        logits = self._run_pass(s_len, tokens, positions, mask_positions)
        self.kv.cache_pos[slot_id] = pos0 + s_len
        return logits[m, b]

    def step(self) -> list[StepEvent]:
        events: list[StepEvent] = []
        self._prefill_tick()

        active = [s for s in self.slots if s.state == SlotState.DECODE]
        if not active:
            return events

        # context-shift instead of stopping when a slot's cache fills
        # (main.cpp:584-617 — the KV mutation runs ONCE on the sharded
        # cache; no ring-wide signal protocol needed, see pipe_kv.py)
        if self.ctx_shift:
            for s in active:
                if self.kv.used(s.id) >= self._row_limit - 1:
                    used = self.kv.used(s.id)
                    n_discard = max((used - self.n_keep) // 2, 1)
                    self.kv.context_shift(s.id, self.n_keep, n_discard)
                    s.shifts.append((self.n_keep, n_discard))

        if self.grp_attn_n > 1:
            for s in active:
                if s.pos_map is None:
                    s.pos_map = np.arange(self.max_seq, dtype=np.int64)
                self._apply_self_extend(s)
                self._record_positions(s, self.kv.used(s.id), 1)

        t0 = _time.perf_counter()
        tokens = np.zeros((self.M, self.B, 1), np.int32)
        for s in active:
            tokens[s.m, s.b, 0] = s.generated[-1] if s.generated else s.prompt[-1]
        mask_positions = self.cache_pos[..., None].copy()
        positions = mask_positions + self._rope_delta_grid(active)[..., None]
        logits = self._run_pass(1, tokens, positions, mask_positions)
        for s in active:
            self.kv.cache_pos[s.id] += 1
        self.perf["t_decode_s"] += _time.perf_counter() - t0
        self.perf["n_decode"] += len(active)

        from ..runtime.generate import (SlotSampleParams, fused_eligible,
                                        sample_one)

        for s in active:
            row = logits[s.m, s.b, -1]
            # same draw-path invariance as the single-chip engine: eligible
            # dist slots use the (seed, token index) device key schedule on
            # EVERY path, so streams never depend on engine routing
            if s.sampler.p.temp > 0 and fused_eligible(s.sampler):
                tok = sample_one(row, SlotSampleParams.from_sampler(s.sampler),
                                 list(s.sampler.prev), len(s.generated),
                                 logit_bias=s.sampler.p.logit_bias)
                s.sampler.accept(tok)
            else:
                tok = s.sampler.sample_and_accept(row)
            s.generated.append(tok)
            lp = None
            if s.n_probs > 0:
                from ..sampling import softmax as _softmax

                probs = np.log(np.maximum(_softmax(row), 1e-30))
                top = np.argsort(-row)[: s.n_probs]
                ids = list(dict.fromkeys([int(t) for t in top] + [tok]))
                lp = [(int(t), float(probs[t])) for t in ids]
            done, reason = self._check_stop(s, tok)
            if done:
                s.state = SlotState.IDLE
                s.stop_reason = reason
            events.append(StepEvent(s.id, s.request_id, tok, done, reason,
                                    logprobs=lp))
        return events

    # -- fused on-device decode+sample over the mesh pipeline -------------------

    def _decode_raw_flat(self):
        """(params, kv_arrays, token (F,1), cache_pos (F,), rope_pos (F,))
        -> (logits (F,V), kv_arrays): the FusedGenerator-shaped body over
        the piped-ring forward — the whole multi-chip pipeline runs inside
        the chunk loop, so a multi-host serving step ships one (F, chunk)
        token array per host round-trip instead of a 512 KB logits row per
        token per slot."""
        pipe_fwd = make_pipe_forward(self.cfg, self.spec, self.mesh,
                                     self.opts)
        M, B = self.M, self.B

        def fwd(params, kv_arrays, token, cache_pos, rope_pos):
            t = token.reshape(M, B, 1)
            cp = cache_pos.reshape(M, B)
            pos = rope_pos.reshape(M, B)[..., None]
            logits, kv_arrays = pipe_fwd(params, t, pos, cp, kv_arrays,
                                         mask_positions=cp[..., None])
            return logits[:, :, -1].reshape(M * B, -1), kv_arrays

        return fwd

    def _fused_ready(self) -> list | None:
        from ..runtime.generate import fused_eligible

        if any(s.state == SlotState.PREFILL for s in self.slots):
            return None
        active = [s for s in self.slots if s.state == SlotState.DECODE]
        if not active:
            return []
        if not all(fused_eligible(s.sampler) for s in active):
            return None
        bias0 = active[0].sampler.p.logit_bias
        if any(s.sampler.p.logit_bias != bias0 for s in active):
            return None
        # a context-shift would trigger mid-chunk: let step() handle it
        if any(self.kv.used(s.id) >= self._row_limit - 1 for s in active):
            return None
        return active

    def step_fused(self, max_chunk: int | None = None) -> list[StepEvent]:
        """Chunked decode over the distributed pipeline: same semantics and
        key schedule as runtime.engine.Engine.step_fused (seeded draws
        keyed by (seed, token index) only), with the piped-ring forward as
        the loop body. Falls back to step() whenever any slot needs the
        host chain."""
        active = self._fused_ready()
        if active is None:
            return self.step()
        if not active:
            return []
        from ..runtime.generate import FusedGenerator, SlotSampleParams

        if getattr(self, "_fused_gen", None) is None:
            self._fused_gen = FusedGenerator(self._decode_raw_flat(),
                                             self.cfg.n_vocab)

        F = self.n_slots
        chunk = max_chunk or self._fused_gen.chunk
        if self.grp_attn_n > 1:
            for s in active:
                if s.pos_map is None:
                    s.pos_map = np.arange(self.max_seq, dtype=np.int64)
                self._apply_self_extend(s)
                n_past = self.kv.used(s.id) + s.pos_delta
                to_boundary = (s.ga_i + self.grp_attn_w) - n_past
                chunk = max(1, min(chunk, int(to_boundary)))
        probs_k = max((s.n_probs for s in active), default=0)
        token = np.zeros((F, 1), np.int32)
        rope_delta = np.zeros(F, np.int32)
        n_left = np.zeros(F, np.int32)
        gen_count = np.zeros(F, np.int32)
        slot_params: list = [None] * F
        recent: list = [[] for _ in range(F)]
        for s in active:
            token[s.id, 0] = (s.generated[-1] if s.generated
                              else s.prompt[-1])
            rope_delta[s.id] = s.pos_delta
            room = self._row_limit - self.kv.used(s.id)
            want = (s.n_predict - len(s.generated)
                    if s.n_predict >= 0 else chunk)
            n_left[s.id] = max(min(want, room, chunk), 1)
            gen_count[s.id] = len(s.generated)
            slot_params[s.id] = SlotSampleParams.from_sampler(s.sampler)
            recent[s.id] = list(s.sampler.prev)
        cache_pos = self.kv.cache_pos.copy()
        for s in self.slots:
            if slot_params[s.id] is None and cache_pos[s.id] >= self.max_seq:
                cache_pos[s.id] = 0
                s.prompt = []

        t0 = _time.perf_counter()
        arrays, toks, new_pos, lp = self._fused_gen.generate(
            self.params, self.kv.arrays, token, cache_pos, rope_delta,
            slot_params, recent, n_left, gen_count,
            logit_bias=active[0].sampler.p.logit_bias, chunk=chunk,
            eog_ids=sorted(self.eog_ids), probs_k=probs_k)
        self.kv.arrays = arrays
        self.n_decode_calls += 1
        self.perf["t_decode_s"] += _time.perf_counter() - t0

        events: list[StepEvent] = []
        for s in active:
            kept = [int(t) for t in toks[s.id] if t >= 0]
            pos_before = int(cache_pos[s.id])
            self.kv.cache_pos[s.id] = int(new_pos[s.id])
            if self.grp_attn_n > 1 and kept:
                self._record_positions(s, pos_before, len(kept))
            for j, tok_ in enumerate(kept):
                s.generated.append(tok_)
                s.sampler.accept(tok_)
                self.perf["n_decode"] += 1
                lprobs = None
                if s.n_probs > 0 and lp is not None:
                    pv, pi, lse, tl = (lp[0][s.id, j], lp[1][s.id, j],
                                       lp[2][s.id, j], lp[3][s.id, j])
                    ids = [int(t) for t in pi[: s.n_probs]]
                    pairs = {int(t): float(v - lse)
                             for t, v in zip(pi, pv)}
                    pairs.setdefault(tok_, float(tl - lse))
                    order = list(dict.fromkeys(ids + [tok_]))
                    lprobs = [(t, pairs[t]) for t in order]
                done, reason = (self._check_stop(s, tok_)
                                if j == len(kept) - 1 else (False, None))
                if done:
                    s.state = SlotState.IDLE
                    s.stop_reason = reason
                events.append(StepEvent(s.id, s.request_id, tok_, done,
                                        reason, logprobs=lprobs))
        return events

    def _check_stop(self, slot: DSlot, tok: int) -> tuple[bool, str | None]:
        if tok in self.eog_ids:
            return True, "eog"
        if slot.n_predict >= 0 and len(slot.generated) >= slot.n_predict:
            return True, "length"
        # a parked row must never sit within s_len of the cache end while
        # another slot prefills (dynamic_update_slice clamps its start index
        # and would overwrite the parked tail) — _row_limit encodes that
        if not self.ctx_shift and \
                self.kv.used(slot.id) >= self._row_limit:
            return True, "context_full"
        return False, None

    # -- aux surfaces (server parity) ------------------------------------------

    def embed(self, prompt_tokens: list[int], pooling: str = "mean") -> np.ndarray:
        """/v1/embeddings through the full pipeline (hidden-state output)."""
        from ..models.llama import model_norm
        from .pipeline import init_pipe_kv

        s_len = _bucket(len(prompt_tokens),
                        max(self.n_batch, len(prompt_tokens)))
        tokens = np.zeros((self.M, self.B, s_len), np.int32)
        tokens[0, 0, : len(prompt_tokens)] = prompt_tokens
        positions = np.broadcast_to(np.arange(s_len, dtype=np.int32),
                                    (self.M, self.B, s_len)).copy()
        kv = init_pipe_kv(self.cfg, self.spec, self.mesh, self.B, s_len,
                          jnp.bfloat16)
        fwd = self._fwd(s_len, return_hidden=True)
        hidden, _ = fwd(self.params, jnp.asarray(tokens),
                        jnp.asarray(positions),
                        jnp.zeros((self.M, self.B), jnp.int32), kv)
        hidden = model_norm(hidden, self.params.get("output_norm"),
                            self.params.get("output_norm_b"), self.cfg)
        h = np.asarray(hidden[0, 0, : len(prompt_tokens)], dtype=np.float32)
        if pooling == "last":
            return h[-1]
        if pooling == "cls":
            return h[0]
        return h.mean(axis=0)

    def perf_summary(self) -> str:
        p = self.perf
        pp = p["n_prompt"] / p["t_prompt_s"] if p["t_prompt_s"] > 0 else 0.0
        tg = p["n_decode"] / p["t_decode_s"] if p["t_decode_s"] > 0 else 0.0
        return (f"prompt eval: {p['n_prompt']} tokens in {p['t_prompt_s']:.2f}s "
                f"({pp:.1f} tok/s) | decode: {p['n_decode']} tokens in "
                f"{p['t_decode_s']:.2f}s ({tg:.1f} tok/s) | "
                f"{self.n_decode_calls} decode calls")

    def run_to_completion(self, prompt_tokens: list[int], **kw) -> list[int]:
        slot = self.submit(prompt_tokens, **kw)
        while slot.state != SlotState.IDLE:
            self.step()
        return list(slot.generated)
