"""Continuous-batching inference engine (single host).

The analogue of the server's slot machinery + llama_decode driving loop
(examples/server/server.cpp update_slots @1996, llama_decode_internal
src/llama.cpp:18229): N slots share one dense KV cache; prompts prefill in
bucketed chunks; every step() decodes ONE token for every active slot in a
single batched forward (XLA-friendly static shapes — inactive rows are
parked, their writes overwritten before ever being read).

Uniform decode invariant: prefill ingests prompt[:-1] only; the last prompt
token always enters through the batched decode step, so first-token logits
need no special casing.
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
from ..models.llama import ForwardOptions, forward
from ..sampling import Sampler, SamplerParams
from .kv import KVCache, StackedKVCache


def _scan_eligible(cfg: ModelConfig, params: dict) -> bool:
    """forward_scan requires uniform stacked layers: every layer present,
    identical key sets, no MoE, no per-layer mask switching (gemma2 SWA)."""
    if cfg.n_expert or cfg.swa_window:
        return False
    layers = params.get("layers")
    if not isinstance(layers, list) or not layers or any(l is None for l in layers):
        return False
    keys = set(layers[0])
    if any(set(l) != keys for l in layers[1:]):
        return False
    if any(l.get(k) is None for l in layers for k in keys):
        return False
    # LoRA / control-vector wrapped layers keep the indexable path
    if any(k.endswith("_lora") or k == "cvec" for k in keys):
        return False
    return True


class SlotState(Enum):
    IDLE = 0
    PREFILL = 1
    DECODE = 2


def apply_self_extend(slot, used: int, max_seq: int, ga_n: int, ga_w: int,
                      rope_shift) -> None:
    """Self-Extend grouped-attention compression (main.cpp:618-640), shared
    by every engine/KV backend: once the logical position passes
    ga_i + ga_w, compress the window's rope positions by ga_n. Cells never
    move (causality-by-index holds); `rope_shift(delta)` re-rotates the
    slot's cached K by the per-cell position delta, and future tokens carry
    slot.pos_delta as a negative logical-position offset. Mutates
    slot.{pos_map, ga_i, pos_delta} (the reference's seq_add / seq_div /
    seq_add triple, composed in logical-position space over live cells)."""
    if ga_n <= 1:
        return
    if slot.pos_map is None:
        slot.pos_map = np.arange(max_seq, dtype=np.int64)
    n_past = used + slot.pos_delta  # logical
    while n_past >= slot.ga_i + ga_w:
        ib = (ga_n * slot.ga_i) // ga_w
        bd = (ga_w // ga_n) * (ga_n - 1)
        dd = (ga_w // ga_n) - ib * bd - ga_w
        L = slot.pos_map
        base = slot.ga_i + ib * bd
        L1 = np.where((L >= slot.ga_i) & (L < n_past), L + ib * bd, L)
        L2 = np.where((L1 >= base) & (L1 < base + ga_w), L1 // ga_n, L1)
        L3 = np.where((L2 >= base + ga_w) & (L2 < n_past + ib * bd),
                      L2 + dd, L2)
        live = np.arange(max_seq) < used
        L3 = np.where(live, L3, L)
        rope_shift((L3 - L).astype(np.int32))
        slot.pos_map = L3
        n_past -= bd
        slot.ga_i += ga_w // ga_n
    slot.pos_delta = n_past - used


def record_positions(slot, pos0: int, n: int, max_seq: int) -> None:
    """Track the logical position of newly written cells (Self-Extend)."""
    if slot.pos_map is None:
        slot.pos_map = np.arange(max_seq, dtype=np.int64)
    slot.pos_map[pos0:pos0 + n] = (
        pos0 + slot.pos_delta + np.arange(n, dtype=np.int64))


@dataclass
class Slot:
    id: int
    state: SlotState = SlotState.IDLE
    prompt: list[int] = field(default_factory=list)
    n_prompt_done: int = 0
    generated: list[int] = field(default_factory=list)
    sampler: Sampler | None = None
    n_predict: int = -1
    request_id: Any = None
    stop_reason: str | None = None
    n_probs: int = 0  # top-N logprobs per sampled token (OpenAI logprobs)
    # Self-Extend grouped attention state (main.cpp:618-640)
    ga_i: int = 0
    pos_delta: int = 0  # logical (RoPE) position - physical write index
    pos_map: Any = None  # per-cell logical positions (lazy)
    # context-shift history: (n_keep, n_discard) per shift, in order — the
    # dropped middle spans needed to reconstruct the cached token list
    shifts: list = field(default_factory=list)

    @property
    def n_past(self) -> int:
        return self.n_prompt_done + len(self.generated)


@dataclass
class StepEvent:
    slot_id: int
    request_id: Any
    token: int | None
    done: bool
    reason: str | None = None
    logprobs: list | None = None  # [(token_id, logprob)] top-N + sampled


class Engine:
    def __init__(
        self,
        cfg: ModelConfig,
        params: dict,
        n_slots: int = 4,
        max_seq: int = 2048,
        n_batch: int = 256,
        opts: ForwardOptions | None = None,
        kv_dtype=jnp.bfloat16,
        eog_ids: set[int] | None = None,
        ctx_shift: bool = False,
        n_keep: int = 0,
        grp_attn_n: int = 1,
        grp_attn_w: int = 512,
        scan: bool | None = None,
    ):
        self.cfg = cfg
        self.opts = opts or ForwardOptions()
        self.n_slots = n_slots
        self.max_seq = max_seq
        self.n_batch = n_batch
        # scan mode: uniform-layer models run forward_scan (one compiled
        # layer body + stacked KV) — ~n_layers x faster compilation and far
        # fewer per-token dispatches. On TPU the UNROLLED per-layer path
        # wins ~1.6x at decode instead (XLA copies each scan iteration's
        # weight slice before the Pallas kernel can stream it, tripling
        # weight traffic — measured in BENCH_r03), so scan auto-enables
        # only off-TPU; PRIMA_ENGINE_SCAN=1/0 overrides.
        if scan is None:
            import os as _os

            env = _os.environ.get("PRIMA_ENGINE_SCAN")
            if env is not None:
                scan = env == "1"
            else:
                scan = (_scan_eligible(cfg, params)
                        and jax.default_backend() != "tpu")
        self.use_scan = bool(scan)
        if self.use_scan:
            params = dict(params)
            params["layers"] = jax.tree.map(
                lambda *xs: jnp.stack(xs), *params["layers"])
            self.kv = StackedKVCache(cfg, n_slots, max_seq, kv_dtype)
        else:
            self.kv = KVCache(cfg, n_slots, max_seq, kv_dtype)
        self.params = params
        self.slots = [Slot(i) for i in range(n_slots)]
        self.eog_ids = eog_ids or set()
        self.n_decode_calls = 0  # /metrics counter parity (server.cpp:2928)
        # context-shift on full context (main.cpp:584-617) vs hard stop
        self.ctx_shift = ctx_shift
        self.n_keep = n_keep
        # Self-Extend grouped attention (--grp-attn-n/--grp-attn-w)
        assert grp_attn_n >= 1
        assert grp_attn_n == 1 or grp_attn_w % grp_attn_n == 0, \
            "grp_attn_w must be a multiple of grp_attn_n (main.cpp:221)"
        assert not (ctx_shift and grp_attn_n > 1), \
            "context shift and Self-Extend are mutually exclusive (main.cpp " \
            "performs the shift only in the ga_n == 1 branch)"
        self.grp_attn_n = grp_attn_n
        self.grp_attn_w = grp_attn_w
        # perf counters (llama_perf_context analogue)
        self.perf = {"n_prompt": 0, "n_decode": 0, "t_prompt_s": 0.0, "t_decode_s": 0.0}

        cfg_ = cfg
        opts_ = self.opts
        use_scan_ = self.use_scan

        def _fwd(params, caches, tokens, positions, cache_pos,
                 mask_positions=None):
            if use_scan_:
                from ..models.llama import forward_scan

                return forward_scan(params, cfg_, tokens, positions, caches,
                                    cache_pos, opts_,
                                    mask_positions=mask_positions)
            return forward(params, cfg_, tokens, positions, caches,
                           cache_pos, opts_, mask_positions=mask_positions)

        self._fwd_raw = _fwd  # (params, caches, tokens, positions,
        #                        cache_pos, mask_positions) — the unjitted
        #                        slot-sliceable forward (FusedSpeculative)

        slot_axis = 1 if self.use_scan else 0

        @functools.partial(jax.jit, static_argnames=("s_len",))
        def _prefill(params, caches, tokens, pos0, rope0, slot, s_len):
            # tokens: (s_len,) — single-slot chunked prefill on a kv row slice
            # pos0 = physical write index; rope0 = logical (RoPE) position
            # (they differ only under Self-Extend grouped attention)
            take = (lambda a: a[:, slot][:, None]) if use_scan_ else (lambda a: a[slot][None])
            row = jax.tree.map(take, caches)
            positions = rope0 + jnp.arange(s_len, dtype=jnp.int32)[None]
            phys = pos0 + jnp.arange(s_len, dtype=jnp.int32)[None]
            _logits, row = _fwd(params, row, tokens[None], positions,
                                pos0[None], mask_positions=phys)
            if use_scan_:
                caches = jax.tree.map(
                    lambda c, r: c.at[:, slot].set(r[:, 0]), caches, row)
            else:
                caches = jax.tree.map(lambda c, r: c.at[slot].set(r[0]), caches, row)
            return caches

        def _decode_raw(params, caches, tokens, cache_pos, rope_pos):
            # tokens: (B, 1); cache_pos: (B,) — batched one-token step.
            # RoPE uses the (possibly Self-Extend-compressed) logical
            # positions; causal visibility follows the physical write index.
            positions = rope_pos[:, None]
            logits, caches = _fwd(params, caches, tokens, positions, cache_pos,
                                  mask_positions=cache_pos[:, None])
            return logits[:, -1], caches

        _decode = jax.jit(_decode_raw)
        self._decode_raw = _decode_raw

        @jax.jit
        def _decode_topk(params, caches, tokens, cache_pos, rope_pos):
            """Batched decode returning a per-row top-K shortlist instead of
            the full vocab row: (vals, ids) ~2 KB/slot crosses the tunnel
            instead of 512 KB, plus the row logsumexp (exact logprobs for
            n_probs). The full logits stay ON DEVICE — fetched lazily only
            for rare fallbacks (grammar dead-ends). The TPU answer to the
            reference's zero-transfer local sampling (common/sampling.cpp)
            for chains the fused loop can't take."""
            logits, caches = _decode_raw(params, caches, tokens, cache_pos,
                                         rope_pos)
            lf = logits.astype(jnp.float32)
            k = min(256, lf.shape[-1])
            vals, idx = jax.lax.top_k(lf, k)
            lse = jax.scipy.special.logsumexp(lf, axis=-1)
            return vals, idx, lse, logits, caches

        self._decode_topk = _decode_topk

        @functools.partial(jax.jit, static_argnames=("s_len",))
        def _verify(params, caches, tokens, pos0, slot, s_len):
            """Decode s_len tokens on one slot returning logits at EVERY
            position — the batched verification forward used by the
            speculative and lookup decoders."""
            take = (lambda a: a[:, slot][:, None]) if use_scan_ else (lambda a: a[slot][None])
            row = jax.tree.map(take, caches)
            positions = pos0 + jnp.arange(s_len, dtype=jnp.int32)[None]
            logits, row = _fwd(params, row, tokens[None], positions, pos0[None])
            if use_scan_:
                caches = jax.tree.map(
                    lambda c, r: c.at[:, slot].set(r[:, 0]), caches, row)
            else:
                caches = jax.tree.map(lambda c, r: c.at[slot].set(r[0]), caches, row)
            return logits[0], caches

        self._verify = _verify

        self._prefill = _prefill
        self._decode = _decode

    # -- request management ----------------------------------------------------

    def find_idle_slot(self) -> Slot | None:
        for s in self.slots:
            if s.state == SlotState.IDLE:
                return s
        return None

    def submit(self, prompt_tokens: list[int], sampler: Sampler | None = None,
               n_predict: int = -1, request_id: Any = None,
               reuse_prefix: bool = True, n_probs: int = 0) -> Slot:
        if not prompt_tokens:
            raise ValueError("empty prompt")
        slot = self.find_idle_slot()
        if slot is None:
            raise RuntimeError("no idle slot")
        if len(prompt_tokens) >= self.max_seq:
            raise ValueError(f"prompt ({len(prompt_tokens)}) exceeds max_seq")
        # prompt-prefix reuse against this slot's previous contents
        # (cache_prompt / slot_prompt_similarity, server.cpp update_slots)
        common = 0
        if reuse_prefix and slot.prompt:
            limit = min(len(slot.prompt), len(prompt_tokens) - 1, self.kv.used(slot.id))
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
        slot.ga_i = 0
        slot.pos_delta = 0
        slot.pos_map = None
        slot.shifts = []
        for t in prompt_tokens:
            slot.sampler.accept(t, accept_grammar=False)
        if slot.n_prompt_done >= len(slot.prompt) - 1:
            slot.state = SlotState.DECODE  # everything but last token cached
        return slot

    def fork(self, src: Slot, sampler: Sampler | None = None,
             n_predict: int = -1, request_id: Any = None,
             n_probs: int = 0) -> Slot:
        """Fork src's ingested prompt into a new slot — the
        llama_kv_cache_seq_cp fork (examples/batched/batched.cpp:139-143):
        the new slot shares the already-decoded prefix without
        re-prefilling. src must be fully prefilled."""
        if src.state == SlotState.PREFILL:
            raise ValueError("fork requires a fully prefilled source slot")
        slot = self.find_idle_slot()
        if slot is None:
            raise RuntimeError("no idle slot")
        self.kv.seq_cp(dst=slot.id, src=src.id)
        slot.state = SlotState.DECODE
        slot.prompt = list(src.prompt)
        slot.n_prompt_done = src.n_prompt_done
        slot.generated = list(src.generated)
        slot.sampler = sampler or Sampler(SamplerParams(temp=0.0))
        slot.n_predict = n_predict
        slot.request_id = request_id
        slot.stop_reason = None
        slot.n_probs = n_probs
        slot.ga_i = src.ga_i
        slot.pos_delta = src.pos_delta
        slot.pos_map = None if src.pos_map is None else src.pos_map.copy()
        slot.shifts = list(src.shifts)
        # seed the sampler with the slot's FULL context — prompt AND any
        # already-generated tokens (the penalty window must match the KV)
        for t in slot.prompt + slot.generated:
            slot.sampler.accept(t, accept_grammar=False)
        return slot

    def cancel(self, request_id: Any) -> bool:
        """/v1/cancel analogue (server.cpp:2826)."""
        for s in self.slots:
            if s.request_id == request_id and s.state != SlotState.IDLE:
                s.state = SlotState.IDLE
                s.stop_reason = "cancelled"
                return True
        return False

    # -- the decode loop --------------------------------------------------------

    def _apply_self_extend(self, slot: Slot) -> None:
        apply_self_extend(slot, self.kv.used(slot.id), self.kv.max_seq,
                          self.grp_attn_n, self.grp_attn_w,
                          lambda d: self.kv.rope_shift(slot.id, d))

    def _record_positions(self, slot: Slot, pos0: int, n: int) -> None:
        """Track the logical position of newly written cells (Self-Extend)."""
        if self.grp_attn_n <= 1:
            return
        if slot.pos_map is None:
            slot.pos_map = np.arange(self.kv.max_seq, dtype=np.int64)
        slot.pos_map[pos0:pos0 + n] = (
            pos0 + slot.pos_delta + np.arange(n, dtype=np.int64))

    def _advance_prefill(self, slot: Slot) -> None:
        """Ingest one chunk of prompt[:-1] into the KV cache."""
        if self.grp_attn_n > 1 and slot.pos_map is None:
            slot.pos_map = np.arange(self.kv.max_seq, dtype=np.int64)
        self._apply_self_extend(slot)
        target = len(slot.prompt) - 1
        chunk = slot.prompt[slot.n_prompt_done : min(slot.n_prompt_done + self.n_batch, target)]
        pos0 = np.int32(self.kv.used(slot.id))
        s_len = _bucket(len(chunk), self.n_batch)
        if int(pos0) + s_len > self.kv.max_seq:
            # a padded bucket would make dynamic_update_slice CLAMP the write
            # start, silently corrupting earlier cache cells — shrink to fit
            s_len = self.kv.max_seq - int(pos0)
        padded = np.zeros(s_len, dtype=np.int32)
        padded[: len(chunk)] = chunk
        rope0 = np.int32(int(pos0) + slot.pos_delta)
        self.kv.caches = self._prefill(
            self.params, self.kv.caches, jnp.asarray(padded), pos0, rope0,
            slot.id, s_len
        )
        self._record_positions(slot, int(pos0), len(chunk))
        self.kv.cache_pos[slot.id] += len(chunk)
        slot.n_prompt_done += len(chunk)
        if slot.n_prompt_done >= target:
            slot.state = SlotState.DECODE

    def step(self) -> list[StepEvent]:
        """One scheduler tick: advance prefills, then one batched decode."""
        import time as _time

        events: list[StepEvent] = []
        t0 = _time.perf_counter()
        did_prefill = False
        for slot in self.slots:
            if slot.state == SlotState.PREFILL:
                n_before = slot.n_prompt_done
                self._advance_prefill(slot)
                self.perf["n_prompt"] += slot.n_prompt_done - n_before
                did_prefill = True
        if did_prefill:
            self.perf["t_prompt_s"] += _time.perf_counter() - t0

        active = [s for s in self.slots if s.state == SlotState.DECODE]
        if not active:
            return events

        # context-shift instead of stopping when a slot's cache fills
        if self.ctx_shift:
            for slot in active:
                if self.kv.used(slot.id) >= self.max_seq - 1:
                    used = self.kv.used(slot.id)
                    n_discard = max((used - self.n_keep) // 2, 1)
                    self.kv.context_shift(slot.id, self.n_keep, n_discard)
                    # record for state save: the token history must drop the
                    # same middle span the cache dropped
                    slot.shifts.append((self.n_keep, n_discard))
        if self.grp_attn_n > 1:
            for slot in active:
                if slot.pos_map is None:
                    slot.pos_map = np.arange(self.kv.max_seq, dtype=np.int64)
                self._apply_self_extend(slot)
                self._record_positions(slot, self.kv.used(slot.id), 1)
        t0 = _time.perf_counter()

        B = self.n_slots
        tokens = np.zeros((B, 1), dtype=np.int32)
        rope_delta = np.zeros(B, dtype=np.int32)
        for slot in active:
            tokens[slot.id, 0] = slot.generated[-1] if slot.generated else slot.prompt[-1]
            rope_delta[slot.id] = slot.pos_delta
        cache_pos = self.kv.cache_pos.copy()  # inactive rows park in place

        # ONE decode program regardless of transfer mode: routing through a
        # second compiled graph would produce ulp-different logits and flip
        # near-tie candidate cutoffs between the shortlist and full-row
        # paths (path invariance is a correctness property here)
        use_sl = all(self._slot_shortlist_ok(s) for s in active)
        vals_j, idx_j, lse_j, logits_j, self.kv.caches = self._decode_topk(
            self.params, self.kv.caches, jnp.asarray(tokens),
            jnp.asarray(cache_pos), jnp.asarray(cache_pos + rope_delta))
        if use_sl:
            # ONE transfer of ~2 KB/slot; full rows stay in HBM
            sl_vals, sl_idx, sl_lse = jax.device_get((vals_j, idx_j, lse_j))
            sl_vals = np.asarray(sl_vals, np.float32)
            sl_lse = np.asarray(sl_lse, np.float32)
            logits_all = None
        else:
            logits_all = np.asarray(logits_j, dtype=np.float32)  # sync point
        self.n_decode_calls += 1
        self.perf["t_decode_s"] += _time.perf_counter() - t0
        self.perf["n_decode"] += len(active)
        for slot in active:
            self.kv.cache_pos[slot.id] += 1

        from .generate import fused_eligible, sample_one

        V = self.cfg.n_vocab

        for slot in active:
            sl = None
            row = None
            if logits_all is not None:
                row = logits_all[slot.id]
            else:
                sl = (sl_vals[slot.id], sl_idx[slot.id])
            # fused-eligible dist slots ALWAYS draw with the device key
            # schedule (seed, token index) — even on this host path — so a
            # request's sampled stream never depends on whether the engine
            # routed a given step through step() or step_fused()
            # (same-seed reproducibility, results.feature analogue)
            if slot.sampler.p.temp > 0 and fused_eligible(slot.sampler):
                from .generate import SlotSampleParams

                tok = sample_one(
                    row, SlotSampleParams.from_sampler(slot.sampler),
                    list(slot.sampler.prev), len(slot.generated),
                    logit_bias=slot.sampler.p.logit_bias, shortlist=(
                        None if sl is None else (sl[0], sl[1], V)))
                slot.sampler.accept(tok)
            else:
                if row is None:
                    # virtual full row: host chain runs UNCHANGED on it;
                    # eligibility guarantees the true candidate set lives
                    # inside the shortlist
                    row = np.full(V, -1e30, np.float32)
                    row[sl[1]] = sl[0]
                # grammar slots never reach the virtual-row path
                # (_slot_shortlist_ok excludes them), so the chain runs on
                # real logits here in every case
                tok = slot.sampler.sample(row)
                slot.sampler.accept(tok)
            slot.generated.append(tok)
            lp = None
            if slot.n_probs > 0:
                if sl is not None:
                    # exact logprobs: shortlist logits minus the full-row
                    # logsumexp shipped from device
                    lpv = sl[0] - sl_lse[slot.id]
                    ids = [int(t) for t in sl[1][: slot.n_probs]]
                    where = np.nonzero(sl[1] == tok)[0]
                    pairs = {t: float(lpv[i]) for i, t in enumerate(
                        int(x) for x in sl[1])}
                    ids = list(dict.fromkeys(ids + ([tok] if len(where) else [])))
                    lp = [(t, pairs[t]) for t in ids]
                else:
                    from ..sampling import softmax as _softmax

                    probs = np.log(np.maximum(_softmax(row), 1e-30))
                    top = np.argsort(-row)[: slot.n_probs]
                    ids = list(dict.fromkeys([int(t) for t in top] + [tok]))
                    lp = [(int(t), float(probs[t])) for t in ids]
            done, reason = self._check_stop(slot, tok)
            if done:
                slot.state = SlotState.IDLE
                slot.stop_reason = reason
            events.append(StepEvent(slot.id, slot.request_id, tok, done, reason,
                                    logprobs=lp))
        return events

    def _slot_shortlist_ok(self, s: Slot) -> bool:
        """True iff this slot's chain is EXACT on a device top-256 shortlist:
        every candidate the true chain could keep is guaranteed inside the
        pre-penalty top-256 (penalties only ever lower W window tokens, so
        post-penalty top-k is within pre-penalty top-(k+W))."""
        p = s.sampler.p
        if s.sampler.grammar is not None:
            # a grammar can force tokens from anywhere in the vocab; on the
            # virtual row those hold -1e30, so a constrained re-sample would
            # draw from a truncated distribution (and a host-side redo would
            # advance the RNG, breaking same-seed parity with the full-row
            # route). Grammar slots always take the full-row path.
            return False
        if p.mirostat != 0:
            return False  # mu-threshold can keep an unbounded candidate set
        if any(b > 0 for b in p.logit_bias.values()):
            return False  # positive bias can promote any token into range
        K = min(256, self.cfg.n_vocab)
        W = 0
        pen = p.penalty_last_n != 0 and (
            p.penalty_repeat != 1.0 or p.penalty_freq != 0.0
            or p.penalty_present != 0.0)
        if pen:
            if (p.penalty_repeat < 1.0 or p.penalty_freq < 0.0
                    or p.penalty_present < 0.0):
                return False  # anti-penalties RAISE logits out of range
            n_prev = len(s.sampler.prev)
            W = n_prev if p.penalty_last_n < 0 else min(p.penalty_last_n,
                                                        n_prev)
        if p.temp <= 0:
            return W + 1 <= K
        return 0 < p.top_k and p.top_k + W <= K

    # -- fused on-device decode+sample (runtime/generate.py) --------------------

    def _fused_ready(self) -> list | None:
        """Return the active-decode slots when every condition for the
        chunked on-device path holds, else None (-> host step())."""
        from .generate import fused_eligible

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
        if any(self.kv.used(s.id) >= self.max_seq - 1 for s in active):
            return None
        return active

    def step_fused(self, max_chunk: int | None = None) -> list[StepEvent]:
        """Chunked decode: up to `chunk` tokens per host round-trip, sampled
        ON DEVICE (runtime/generate.py) — the TPU analogue of the
        reference's zero-transfer-cost local sampling (common/sampling.cpp).
        Falls back to step() whenever any slot needs the host chain."""
        import time as _time

        active = self._fused_ready()
        if active is None:
            return self.step()
        if not active:
            return []
        from .generate import FusedGenerator, SlotSampleParams

        if getattr(self, "_fused_gen", None) is None:
            self._fused_gen = FusedGenerator(self._decode_raw,
                                             self.cfg.n_vocab)

        B = self.n_slots
        chunk = max_chunk or self._fused_gen.chunk
        # Self-Extend (grouped attention): apply any pending compression on
        # the host, then cap the chunk so no slot CROSSES a ga boundary
        # mid-chunk — between chunks the compression re-applies, so the
        # fused path now covers --grp-attn-n (VERDICT r3 task 9)
        if self.grp_attn_n > 1:
            for s in active:
                if s.pos_map is None:
                    s.pos_map = np.arange(self.kv.max_seq, dtype=np.int64)
                self._apply_self_extend(s)
                n_past = self.kv.used(s.id) + s.pos_delta
                to_boundary = (s.ga_i + self.grp_attn_w) - n_past
                chunk = max(1, min(chunk, int(to_boundary)))
        probs_k = max((s.n_probs for s in active), default=0)
        token = np.zeros((B, 1), np.int32)
        rope_delta = np.zeros(B, np.int32)
        n_left = np.zeros(B, np.int32)
        gen_count = np.zeros(B, np.int32)
        slot_params: list = [None] * B
        recent: list = [[] for _ in range(B)]
        for s in active:
            token[s.id, 0] = (s.generated[-1] if s.generated
                              else s.prompt[-1])
            rope_delta[s.id] = s.pos_delta
            room = self.max_seq - self.kv.used(s.id)
            want = (s.n_predict - len(s.generated)
                    if s.n_predict >= 0 else chunk)
            n_left[s.id] = max(min(want, room, chunk), 1)
            gen_count[s.id] = len(s.generated)
            slot_params[s.id] = SlotSampleParams.from_sampler(s.sampler)
            recent[s.id] = list(s.sampler.prev)
        # parked rows write one scratch KV cell per step: a FULL idle
        # slot would clamp onto its last valid cell — drop its reusable
        # prefix instead (it re-prefills on reuse)
        cache_pos = self.kv.cache_pos.copy()
        for s in self.slots:
            if slot_params[s.id] is None and cache_pos[s.id] >= self.max_seq:
                cache_pos[s.id] = 0
                s.prompt = []

        t0 = _time.perf_counter()
        caches, toks, new_pos, lp = self._fused_gen.generate(
            self.params, self.kv.caches, token, cache_pos, rope_delta,
            slot_params, recent, n_left, gen_count,
            logit_bias=active[0].sampler.p.logit_bias, chunk=chunk,
            eog_ids=sorted(self.eog_ids), probs_k=probs_k)
        self.kv.caches = caches
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
                # the device loop stops rows exactly at eog/length/room, so
                # stop conditions are only meaningful on the last token
                done, reason = (self._check_stop(s, tok_)
                                if j == len(kept) - 1 else (False, None))
                if done:
                    s.state = SlotState.IDLE
                    s.stop_reason = reason
                events.append(StepEvent(s.id, s.request_id, tok_, done,
                                        reason, logprobs=lprobs))
        return events

    def _check_stop(self, slot: Slot, tok: int) -> tuple[bool, str | None]:
        if tok in self.eog_ids:
            return True, "eog"
        if slot.n_predict >= 0 and len(slot.generated) >= slot.n_predict:
            return True, "length"
        if not self.ctx_shift and self.kv.used(slot.id) >= self.max_seq:
            return True, "context_full"
        return False, None

    # -- speculative-decoding protocol (engine-agnostic surface) ---------------

    def prefill_only(self, slot: "Slot") -> None:
        """Ingest the slot's remaining prompt chunks WITHOUT decoding (the
        speculative path's prefill: no sampler state is disturbed)."""
        while slot.state == SlotState.PREFILL:
            self._advance_prefill(slot)

    def verify_chain(self, slot_id: int, chain: list[int]) -> np.ndarray:
        """Decode `chain` on one slot returning logits at EVERY position
        (s_len, vocab) — the batched verification forward. Advances the
        slot's cache_pos by len(chain); the caller rolls back the
        unaccepted tail via kv.cache_pos."""
        s_len = len(chain)
        pos0 = np.int32(self.kv.used(slot_id))
        logits, self.kv.caches = self._verify(
            self.params, self.kv.caches,
            jnp.asarray(np.asarray(chain, np.int32)), pos0, slot_id, s_len)
        self.kv.cache_pos[slot_id] = int(pos0) + s_len
        self.n_decode_calls += 1
        return np.asarray(logits, dtype=np.float32)

    def perf_summary(self) -> str:
        """llama_perf_context_print analogue."""
        p = self.perf
        pp = p["n_prompt"] / p["t_prompt_s"] if p["t_prompt_s"] > 0 else 0.0
        tg = p["n_decode"] / p["t_decode_s"] if p["t_decode_s"] > 0 else 0.0
        return (f"prompt eval: {p['n_prompt']} tokens in {p['t_prompt_s']:.2f}s "
                f"({pp:.1f} tok/s) | decode: {p['n_decode']} tokens in "
                f"{p['t_decode_s']:.2f}s ({tg:.1f} tok/s) | "
                f"{self.n_decode_calls} decode calls")

    def embed(self, prompt_tokens: list[int], pooling: str = "mean") -> np.ndarray:
        """Sequence embedding (the /v1/embeddings path, pooling per
        llama_pooling_type: mean | last | cls)."""
        s_len = _bucket(len(prompt_tokens), max(self.n_batch, len(prompt_tokens)))
        padded = np.zeros((1, s_len), dtype=np.int32)
        padded[0, : len(prompt_tokens)] = prompt_tokens
        positions = np.arange(s_len, dtype=np.int32)[None]
        if self.use_scan:
            from ..models.llama import forward_scan

            kv = jax.tree.map(lambda a: jnp.zeros_like(a[:, 0:1]), self.kv.caches)
            hidden, _ = forward_scan(
                self.params, self.cfg, jnp.asarray(padded), jnp.asarray(positions),
                kv, jnp.zeros(1, jnp.int32), self.opts, return_hidden=True,
            )
        else:
            kv = jax.tree.map(lambda a: jnp.zeros_like(a[0:1]), self.kv.caches)
            hidden, _ = forward(
                self.params, self.cfg, jnp.asarray(padded), jnp.asarray(positions),
                kv, jnp.zeros(1, jnp.int32), self.opts, return_hidden=True,
            )
        from ..models.llama import model_norm

        hidden = model_norm(hidden, self.params.get("output_norm"),
                            self.params.get("output_norm_b"), self.cfg)
        h = np.asarray(hidden[0, : len(prompt_tokens)], dtype=np.float32)
        if pooling == "last":
            return h[-1]
        if pooling == "cls":
            return h[0]
        return h.mean(axis=0)

    def run_to_completion(self, prompt_tokens: list[int], **kw) -> list[int]:
        """Synchronous single-request helper (the llama-cli one-shot path)."""
        slot = self.submit(prompt_tokens, **kw)
        while slot.state != SlotState.IDLE:
            self.step()
        return list(slot.generated)


def _bucket(n: int, cap: int) -> int:
    b = 8
    while b < n:
        b *= 2
    return min(b, cap)
