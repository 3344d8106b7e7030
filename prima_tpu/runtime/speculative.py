"""Speculative decoding: draft-model proposal + batched target verification.

The analogue of common/speculative.cpp (+ the server's per-slot speculative
branch, server.cpp:2493-2560): the draft model greedily proposes up to
n_draft tokens (stopping when its own confidence drops below p_min); the
target verifies the whole chain in ONE batched forward and accepts the
longest prefix that matches its own sampling. Lossless: greedy output is
token-identical to plain decoding regardless of draft quality.

The reference keeps the draft whole on rank 0 (speculative.cpp:73-76); the
TPU analogue is a replicated single-chip draft Engine next to the (possibly
distributed) target: the target only needs the engine-agnostic protocol
{submit, prefill_only, verify_chain, kv.used/cache_pos}, so Engine,
DistributedEngine (mesh pipeline) and TcpRingEngine all verify drafts —
draft-on-host + distributed batched verify (server.cpp:2493-2560).

Per-slot: generate_stream allocates a (target, draft) slot pair per call,
so multiple requests speculate concurrently (the server's per-slot
speculative branch, vs a serialized global decoder).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import ForwardOptions, forward
from ..sampling import Sampler, SamplerParams, softmax
from .engine import Engine, _bucket


@dataclass
class SpecStats:
    n_target_calls: int = 0
    n_draft_calls: int = 0
    n_drafted: int = 0
    n_accepted: int = 0

    @property
    def acceptance(self) -> float:
        return self.n_accepted / self.n_drafted if self.n_drafted else 0.0


class SpeculativeDecoder:
    def __init__(self, target, draft: Engine, n_draft: int = 8,
                 p_min: float = 0.75):
        assert target.n_slots >= 1 and draft.n_slots >= 1
        self.target = target
        self.draft = draft
        self.n_draft = n_draft
        self.p_min = p_min

    # -- draft proposal (common_speculative_gen_draft) -------------------------

    def _gen_draft(self, stats: SpecStats, d_slot) -> list[int]:
        """Greedy draft continuation from the draft slot's state."""
        d = self.draft
        sid = d_slot.id
        out: list[int] = []
        for _ in range(self.n_draft):
            tokens = np.zeros((d.n_slots, 1), dtype=np.int32)
            cur = d_slot.generated[-1] if d_slot.generated else d_slot.prompt[-1]
            tokens[sid, 0] = cur
            cache_pos = d.kv.cache_pos.copy()
            logits_j, d.kv.caches = d._decode(
                d.params, d.kv.caches, jnp.asarray(tokens), jnp.asarray(cache_pos),
                jnp.asarray(cache_pos)
            )
            stats.n_draft_calls += 1
            d.kv.cache_pos[sid] += 1
            logits = np.asarray(logits_j[sid], dtype=np.float32)
            probs = softmax(logits)
            tok = int(np.argmax(probs))
            if probs[tok] < self.p_min and out:
                d.kv.cache_pos[sid] -= 1  # un-commit the peeked position
                break
            d_slot.generated.append(tok)
            out.append(tok)
        stats.n_drafted += len(out)
        return out

    # -- main loop -----------------------------------------------------------

    def generate(self, prompt_tokens: list[int], sampler: Sampler | None = None,
                 n_predict: int = 64) -> tuple[list[int], SpecStats]:
        stats = SpecStats()
        out: list[int] = []
        for chunk in self.generate_stream(prompt_tokens, sampler, n_predict,
                                          stats=stats):
            out.extend(chunk)
        return out[:n_predict], stats

    def _fused_spec(self, sampler: Sampler):
        """The on-device fused pipeline (speculative_fused.py) when both
        engines are plain single-host Engines and the chain is supported:
        one dispatch per R draft+verify rounds instead of a host round-trip
        per draft token. PRIMA_SPEC_FUSED=0 forces the host path."""
        import os

        if os.environ.get("PRIMA_SPEC_FUSED", "1") == "0":
            return None
        from .speculative_fused import FusedSpeculative, fused_spec_eligible

        if type(self.target) is not Engine or type(self.draft) is not Engine:
            return None
        if not fused_spec_eligible(sampler):
            return None
        if getattr(self, "_fused_impl", None) is None:
            self._fused_impl = FusedSpeculative(
                self.target, self.draft, n_draft=max(self.n_draft, 1),
                p_min=self.p_min)
        return self._fused_impl

    def generate_stream(self, prompt_tokens: list[int],
                        sampler: Sampler | None = None, n_predict: int = 64,
                        stats: SpecStats | None = None):
        """Yield lists of newly accepted tokens, one list per verify round
        (the streaming server path: SSE deltas arrive per round). Slots 0 of
        both engines are released when the generator finishes."""
        sampler = sampler or Sampler(SamplerParams(temp=0.0))
        stats = stats if stats is not None else SpecStats()
        if self.n_draft > 0:
            fused = self._fused_spec(sampler)
            if fused is not None:
                yield from fused.generate_stream(prompt_tokens, sampler,
                                                 n_predict, stats=stats)
                return
        t, d = self.target, self.draft

        # ingest prompt[:-1] in both engines (slot 0 each); submit() accepts
        # the prompt tokens into the sampler (penalty window)
        t_slot = t.submit(prompt_tokens, sampler=sampler, n_predict=-1)
        d_slot = d.submit(prompt_tokens, n_predict=-1)
        tid, did = t_slot.id, d_slot.id
        try:
            t.prefill_only(t_slot)
            d.prefill_only(d_slot)

            n_out = 0
            cur = prompt_tokens[-1]
            while n_out < n_predict:
                # draft continuation: next input token is `cur`
                d_slot.generated = [cur]
                draft = self._gen_draft(stats, d_slot) if self.n_draft > 0 else []

                # target verifies [cur, draft...] in one forward
                chain = [cur] + draft
                s_len = len(chain)
                pos0 = np.int32(t.kv.used(tid))
                logits = t.verify_chain(tid, chain)
                stats.n_target_calls += 1

                accepted: list[int] = []
                for j in range(s_len):
                    tok = sampler.sample_and_accept(logits[j])
                    accepted.append(tok)
                    if t.eog_ids and tok in t.eog_ids:
                        break  # stop at EOG like plain decoding
                    if j < len(draft) and tok == draft[j] \
                            and n_out + len(accepted) < n_predict:
                        stats.n_accepted += 1
                        continue
                    break
                n_out += len(accepted)
                cur = accepted[-1]

                # target consumed j+1 positions; roll back the unaccepted tail
                t.kv.cache_pos[tid] = int(pos0) + len(accepted)
                # draft cache must hold exactly the verified history
                # [prompt .. out[:-1]] (next round's input is out[-1]);
                # with n_draft == 0 the draft engine is never consulted
                hist = len(prompt_tokens) + n_out - 1
                if self.n_draft <= 0:
                    pass
                elif d.kv.used(did) > hist:
                    d.kv.cache_pos[did] = hist
                elif d.kv.used(did) < hist:
                    # full-acceptance round: the draft never consumed the
                    # last drafted token — feed it so its conditioning
                    # history stays complete (at most one token short)
                    assert hist - d.kv.used(did) == 1 and len(accepted) >= 2
                    d_slot.generated = [accepted[-2]]
                    feed = np.zeros((d.n_slots, 1), dtype=np.int32)
                    feed[did, 0] = accepted[-2]
                    cp = d.kv.cache_pos.copy()
                    _lg, d.kv.caches = d._decode(
                        d.params, d.kv.caches, jnp.asarray(feed),
                        jnp.asarray(cp), jnp.asarray(cp))
                    stats.n_draft_calls += 1
                    d.kv.cache_pos[did] += 1

                yield accepted[: n_predict - (n_out - len(accepted))]

                if t.eog_ids and accepted[-1] in t.eog_ids:
                    break
                if t.kv.used(tid) >= t.max_seq - self.n_draft - 2:
                    break
        finally:
            from .engine import SlotState

            t_slot.state = SlotState.IDLE
            d_slot.state = SlotState.IDLE
