"""Fused on-device speculative decoding: draft + verify + accept in ONE
dispatch per R rounds.

The host-driven SpeculativeDecoder (runtime/speculative.py) pays a full
tunnel round-trip (~28-42 ms) and a 512 KB logits transfer for EVERY draft
token and every verify — on a tunneled TPU that makes `-md` a slowdown
versus the 76+ tok/s fused plain-decode path, where the reference gains up
to +80% (/root/reference/README.md:117-118, draft-on-rank-0
examples/speculative/speculative.cpp:73-76). This module runs the WHOLE
speculative pipeline on-device, chunked like runtime/generate.py: one jit
call executes up to R draft+verify rounds (lax.while_loop) and ships back
one small token array.

Sampling uses the SAME device key schedule as the fused plain path —
key = fold_in(PRNGKey(seed), absolute token index) — so speculative output
is token-identical to plain fused decoding for every supported chain
(greedy and bounded top-k dist chains without penalties/bias/grammar):
losslessness is an invariant, not a hope. Unsupported chains fall back to
the host SpeculativeDecoder.

Cache semantics (mirrors speculative.py's host bookkeeping):
  * target verifies the chain [cur, d0..d_{k-1}] at cells T..T+k; only the
    accepted prefix advances cache_pos — stale cells beyond it are
    invisible (causal mask keys off physical position).
  * the draft's cells hold exactly the verified history; a full-acceptance
    round leaves it one token short, repaired by a catch-up feed at the
    start of the next round (speculative.py:156-167).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..sampling import Sampler
from .engine import Engine, SlotState
from .generate import MAX_TOPK, SlotSampleParams, device_sample
from .speculative import SpecStats


def fused_spec_eligible(sampler: Sampler) -> bool:
    """Chains the on-device accept step supports with draw-for-draw parity
    to the fused plain path: greedy, or bounded top-k dist WITHOUT
    penalties / logit bias / grammar / mirostat (those keep host state or
    full-vocab passes — they take the host SpeculativeDecoder)."""
    p = sampler.p
    if sampler.grammar is not None or p.mirostat != 0 or p.logit_bias:
        return False
    if p.temp <= 0:
        return True
    if p.dynatemp_range > 0 or p.tfs_z < 1.0 or p.typ_p < 1.0:
        return False
    if p.penalty_last_n != 0 and (p.penalty_repeat != 1.0
                                  or p.penalty_freq != 0.0
                                  or p.penalty_present != 0.0):
        return False
    return 0 < p.top_k <= MAX_TOPK


class FusedSpeculative:
    """Single-request on-device speculative rounds over two Engines.

    target/draft must be plain Engines (same process, indexable KV rows);
    the driver uses one slot of each.
    """

    def __init__(self, target: Engine, draft: Engine, n_draft: int = 8,
                 p_min: float = 0.75, rounds: int = 8,
                 force_accept: int = -1):
        self.t = target
        self.d = draft
        self.n_draft = int(n_draft)
        self.p_min = float(p_min)
        self.rounds = int(rounds)
        # force_accept >= 0: MEASUREMENT-ONLY mode — pretend exactly
        # min(force_accept, n_valid) drafts matched, so the hardware cost
        # of an acceptance level can be measured with synthetic weights
        # (where real draft/target agreement is meaningless). Every forward
        # and sample still runs; only the match comparison is overridden.
        # Output tokens are NOT meaningful in this mode.
        self.force_accept = int(force_accept)
        self._loops: dict = {}

    # -- the compiled chunk (R rounds per dispatch) -------------------------

    def _loop(self, sid_t: int, sid_d: int, top_k: int, has_dist: bool):
        key_ = (sid_t, sid_d, top_k, has_dist, self.force_accept)
        if key_ in self._loops:
            return self._loops[key_]
        k, R, p_min = self.n_draft, self.rounds, self.p_min
        t_fwd, d_fwd = self.t._fwd_raw, self.d._fwd_raw
        out_cap = R * (k + 1)

        def mk_take_put(eng, sid):
            # scan engines stack KV as (layers, slots, ...); unrolled as
            # (slots, ...) — slice/scatter the slot row either way
            if eng.use_scan:
                return (lambda a: a[:, sid][:, None],
                        lambda full, row: full.at[:, sid].set(row[:, 0]))
            return (lambda a: a[sid][None],
                    lambda full, row: full.at[sid].set(row[0]))

        take_t, put_t = mk_take_put(self.t, sid_t)
        take_d, put_d = mk_take_put(self.d, sid_d)

        @jax.jit
        def run(t_params, d_params, t_caches, d_caches, cur, t_pos, d_pos,
                catch_tok, need_catch, n_left, n_out0, seed, sp, eog):
            # params are jit ARGUMENTS, never closure constants: closed-over
            # device arrays get baked into the serialized program, and the
            # tunneled remote-compile endpoint drops multi-GB payloads with
            # a broken pipe
            # slot-row views: everything below is B=1
            tc = jax.tree.map(take_t, t_caches)
            dc = jax.tree.map(take_d, d_caches)
            base_key = jax.random.PRNGKey(seed)
            out0 = jnp.full((out_cap,), -1, jnp.int32)
            jpos = jnp.arange(k + 1)

            def draft_step(c, j):
                # ctok_r/ncatch_r are the PER-ROUND catch-up values threaded
                # through the carry — closing over run()'s catch_tok/
                # need_catch here would freeze round 0's values for all R
                # rounds, starving the draft KV of the missing token after
                # every full-acceptance round (acceptance-rate decay)
                dc, feed_tok, dpos, live, ctok_r, ncatch_r = c
                is_catch = j == 0
                feed = jnp.where(is_catch, ctok_r, feed_tok)
                step_live = jnp.where(is_catch, ncatch_r, live)
                logits, dc_new = d_fwd(
                    d_params, dc, feed[None, None],
                    dpos[None, None], dpos[None])
                # non-live steps must not write: keep the old cache row
                dc = jax.tree.map(
                    lambda a, b: jnp.where(step_live, b, a), dc, dc_new)
                row = logits[0, -1].astype(jnp.float32)
                nxt = jnp.argmax(row).astype(jnp.int32)
                maxp = jnp.max(jax.nn.softmax(row))
                # reference p_min rule (speculative.py:78): the first draft
                # is always kept; later ones only at confidence >= p_min
                append = jnp.where(is_catch, jnp.array(False),
                                   live & ((j == 1) | (maxp >= p_min)))
                advance = jnp.where(is_catch, ncatch_r, append)
                dpos = dpos + advance.astype(jnp.int32)
                live_next = jnp.where(is_catch, live, append)
                feed_next = jnp.where(is_catch, feed_tok,
                                      jnp.where(append, nxt, feed_tok))
                d_tok = jnp.where(append, nxt, -1)
                return (dc, feed_next, dpos, live_next, ctok_r,
                        ncatch_r), d_tok

            def round_body(c):
                (r, tc, dc, cur_, tpos, dpos, ctok, ncatch, out, out_n,
                 nleft, done, n_drafted, n_accepted) = c
                # -- draft phase: catch-up + k draft steps ------------------
                (dc, _f, dpos, _l, _ct, _nc), dtoks = jax.lax.scan(
                    draft_step,
                    (dc, cur_, dpos, jnp.array(True), ctok,
                     jnp.asarray(ncatch)),
                    jnp.arange(k + 1))
                dtoks = dtoks[1:]  # drop the catch-up step's slot
                n_valid = jnp.sum((dtoks >= 0).astype(jnp.int32))

                # -- verify phase: one target forward over the chain --------
                chain = jnp.concatenate([cur_[None],
                                         jnp.maximum(dtoks, 0)])
                positions = tpos + jpos
                logits, tc = t_fwd(t_params, tc, chain[None],
                                   positions[None], tpos[None],
                                   positions[None])
                lf = logits[0].astype(jnp.float32)  # (k+1, V)

                # -- accept phase: sample every position with the SAME key
                # schedule as plain fused decode ---------------------------
                keys = jax.vmap(jax.random.fold_in)(
                    jnp.broadcast_to(base_key, (k + 1, *base_key.shape)),
                    (n_out0 + out_n + jpos).astype(jnp.uint32))
                tok = device_sample(
                    lf, jnp.full((k + 1, 1), -1, jnp.int32), keys, sp,
                    top_k=top_k, has_pen=False, has_dist=has_dist,
                    has_free=False)
                match = (tok[:k] == dtoks) & (dtoks >= 0)
                if self.force_accept >= 0:  # measurement-only (see __init__)
                    match = (jpos[:k] < self.force_accept) & (dtoks >= 0)
                matched = jnp.cumprod(match.astype(jnp.int32))
                # position j is accepted iff every draft before it matched
                can = jnp.concatenate([jnp.ones((1,), jnp.int32), matched])
                a = jnp.sum(can)
                a = jnp.minimum(a, nleft)
                # stop INSIDE the accepted prefix at the first EOG
                is_eog = (tok[:, None] == eog[None, :]).any(axis=-1)
                eog_in = (can.astype(bool) & is_eog
                          & (jpos < a))
                any_eog = eog_in.any()
                first_eog = jnp.argmax(eog_in)
                a = jnp.where(any_eog, first_eog + 1, a)

                out = jnp.where(
                    (jnp.arange(out_cap) >= out_n)
                    & (jnp.arange(out_cap) < out_n + a),
                    tok[jnp.clip(jnp.arange(out_cap) - out_n, 0, k)],
                    out)
                cur_next = tok[a - 1]
                tpos = tpos + a
                # draft bookkeeping: cells T..T+n_valid-1 exist; the next
                # round needs T..T+a-1 = min(dpos, new tpos) — one short on
                # full acceptance (catch-up feed repairs it next round)
                full_acc = a == n_valid + 1
                dpos_next = jnp.where(full_acc, dpos,
                                      jnp.minimum(dpos, tpos))
                ctok_next = jnp.where(full_acc & (n_valid > 0),
                                      dtoks[jnp.maximum(n_valid - 1, 0)],
                                      0)
                ncatch_next = full_acc & (n_valid > 0)
                out_n = out_n + a
                nleft = nleft - a
                done = any_eog | (nleft <= 0)
                return (r + 1, tc, dc, cur_next, tpos, dpos_next, ctok_next,
                        ncatch_next, out, out_n, nleft, done,
                        n_drafted + n_valid, n_accepted + a - 1)

            init = (jnp.int32(0), tc, dc, cur, t_pos, d_pos, catch_tok,
                    need_catch, out0, jnp.int32(0), n_left,
                    jnp.array(False), jnp.int32(0), jnp.int32(0))
            c = jax.lax.while_loop(lambda c: (c[0] < R) & ~c[11], round_body,
                                   init)
            (_r, tc, dc, cur_, tpos, dpos, ctok, ncatch, out, out_n, _nl,
             _dn, n_drafted, n_accepted) = c
            t_caches = jax.tree.map(put_t, t_caches, tc)
            d_caches = jax.tree.map(put_d, d_caches, dc)
            return (t_caches, d_caches, out, out_n, tpos, dpos, cur_, ctok,
                    ncatch, _r, n_drafted, n_accepted)

        self._loops[key_] = run
        return run

    # -- host driver ---------------------------------------------------------

    def generate_stream(self, prompt_tokens: list[int],
                        sampler: Sampler | None = None, n_predict: int = 64,
                        stats: SpecStats | None = None):
        """Yield lists of accepted tokens, one per DISPATCH (R rounds)."""
        from ..sampling import SamplerParams

        sampler = sampler or Sampler(SamplerParams(temp=0.0))
        assert fused_spec_eligible(sampler)
        stats = stats if stats is not None else SpecStats()
        t, d = self.t, self.d
        t_slot = t.submit(prompt_tokens, sampler=sampler, n_predict=-1)
        d_slot = d.submit(prompt_tokens, n_predict=-1)
        sid_t, sid_d = t_slot.id, d_slot.id
        try:
            t.prefill_only(t_slot)
            d.prefill_only(d_slot)

            p = SlotSampleParams.from_sampler(sampler)
            has_dist = p.temp > 0
            top_k = MAX_TOPK if has_dist else 0
            kk = self.n_draft + 1
            sp = {f: np.full((kk,), getattr(p, f), np.float32)
                  for f in ("temp", "top_p", "min_p", "penalty_repeat",
                            "penalty_freq", "penalty_present")}
            sp["top_k"] = np.full((kk,), p.top_k if has_dist else 0,
                                  np.int32)
            sp["min_keep"] = np.full((kk,), max(p.min_keep, 1), np.int32)
            sp["eff_last_n"] = np.ones((kk,), np.int32)
            eog = (np.asarray(sorted(t.eog_ids), np.int32) if t.eog_ids
                   else np.asarray([-2], np.int32))
            run = self._loop(sid_t, sid_d, top_k, has_dist)

            cur = np.int32(prompt_tokens[-1])
            catch_tok, need_catch = np.int32(0), False
            n_out = 0
            while n_out < n_predict:
                room = t.max_seq - t.kv.used(sid_t) - self.n_draft - 2
                if room <= 0:
                    break
                n_left = min(n_predict - n_out, room)
                (t.kv.caches, d.kv.caches, out, out_n, tpos, dpos, cur,
                 catch_tok, need_catch, n_rounds, n_drafted,
                 n_accepted) = run(
                    t.params, d.params, t.kv.caches, d.kv.caches, cur,
                    np.int32(t.kv.used(sid_t)), np.int32(d.kv.used(sid_d)),
                    catch_tok, need_catch, np.int32(n_left),
                    np.uint32(n_out), np.uint32(p.seed & 0xFFFFFFFF), sp,
                    eog)
                out, out_n, tpos, dpos, n_rounds, n_drafted, n_accepted = \
                    jax.device_get((out, out_n, tpos, dpos, n_rounds,
                                    n_drafted, n_accepted))
                toks = [int(x) for x in out[: int(out_n)]]
                t.kv.cache_pos[sid_t] = int(tpos)
                d.kv.cache_pos[sid_d] = int(dpos)
                stats.n_target_calls += int(n_rounds)
                stats.n_draft_calls += int(n_rounds) * self.n_draft
                stats.n_drafted += int(n_drafted)
                stats.n_accepted += int(n_accepted)
                for tk in toks:
                    sampler.accept(tk)
                    t_slot.generated.append(tk)
                n_out += len(toks)
                yield toks
                if toks and t.eog_ids and toks[-1] in t.eog_ids:
                    break
                if not toks:
                    break
        finally:
            t_slot.state = SlotState.IDLE
            d_slot.state = SlotState.IDLE

    def generate(self, prompt_tokens, sampler=None, n_predict=64):
        stats = SpecStats()
        out = []
        for chunk in self.generate_stream(prompt_tokens, sampler, n_predict,
                                          stats=stats):
            out.extend(chunk)
        return out[:n_predict], stats
