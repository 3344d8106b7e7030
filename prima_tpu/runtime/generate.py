"""Fused on-device generation: sampling inside the jitted decode loop.

The reference samples on the local CPU at zero transfer cost
(common/sampling.cpp gpt_sampler_sample — the logits never leave the
process). On a TPU — especially a tunneled one — the host round-trip per
token costs ~25-30 ms and ships a full f32 vocab row (512 KB for 8B), which
caps Engine-path decode near ~30 tok/s regardless of kernel speed. This
module runs the WHOLE sample step on-device and generates a CHUNK of tokens
per host round-trip: one (B, chunk) int32 array crosses the wire instead of
chunk × 512 KB logit rows.

On-device sampler coverage (see `fused_eligible`): logit bias, the
repeat/frequency/presence penalties over the last-n window
(llama_sampler_penalties, src/llama-sampling.cpp), top-k, top-p, min-p,
temperature, greedy, and the final dist sampler — the chain subset that
covers the common server configs. Grammar, mirostat v1/v2, dynatemp,
tail-free and typical-p keep the host `Sampler` path (they need either
mutable host state or a full-vocab sort that isn't worth doing per token).

Semantics match `sampling.Sampler._sample_chain` exactly up to the final
draw: the kept-candidate SET is identical (tests/test_generate_fused.py);
the draw uses the jax PRNG instead of numpy's Generator, so sampled streams
differ between host and device at the same seed (both are faithful dist
samplers; the reference makes no cross-RNG guarantee either).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..sampling import Sampler

MAX_TOPK = 256  # device top-k bound: past this a full sort beats lax.top_k
NEG_INF = np.float32(-1e30)


def fused_eligible(sampler: Sampler) -> bool:
    """True iff this slot's chain can run on-device with identical
    candidate-set semantics (the host keeps grammar/mirostat/dynatemp/
    tfs/typical and unbounded-top-k-with-filters configs)."""
    p = sampler.p
    if sampler.grammar is not None or p.mirostat != 0:
        return False
    if p.temp <= 0:
        return True  # greedy: nothing else in the chain matters
    if p.dynatemp_range > 0 or p.tfs_z < 1.0 or p.typ_p < 1.0:
        return False
    if 0 < p.top_k <= MAX_TOPK:
        return True
    # no usable top-k bound: only the bare categorical is exact on-device
    return p.top_p >= 1.0 and p.min_p <= 0.0


@dataclass
class SlotSampleParams:
    """Per-slot dynamic sampler parameters, batched into device arrays."""

    temp: float = 0.8
    top_k: int = 40
    top_p: float = 0.95
    min_p: float = 0.05
    min_keep: int = 1
    penalty_last_n: int = 64
    penalty_repeat: float = 1.0
    penalty_freq: float = 0.0
    penalty_present: float = 0.0
    seed: int = 0

    @classmethod
    def from_sampler(cls, s: Sampler) -> "SlotSampleParams":
        p = s.p
        return cls(temp=p.temp, top_k=p.top_k, top_p=p.top_p, min_p=p.min_p,
                   min_keep=max(p.min_keep, 1),
                   penalty_last_n=p.penalty_last_n,
                   penalty_repeat=p.penalty_repeat, penalty_freq=p.penalty_freq,
                   penalty_present=p.penalty_present, seed=s.seed)

    def penalties_active(self) -> bool:
        return self.penalty_last_n != 0 and (
            self.penalty_repeat != 1.0 or self.penalty_freq != 0.0
            or self.penalty_present != 0.0)


def device_sample(logits: jax.Array, recent: jax.Array, key: jax.Array,
                  sp: dict, *, top_k: int, has_pen: bool, has_dist: bool,
                  has_free: bool, bias_idx: jax.Array | None = None,
                  bias_val: jax.Array | None = None) -> jax.Array:
    """One batched sample step. logits (B, V) f32; recent (B, P) int32 — the
    prior-token penalty window, -1 marking empty cells; sp holds (B,)
    per-slot parameter arrays. top_k is the STATIC max over top-k slots;
    each row's own k masks inside. has_free: some dist row samples the bare
    categorical (no top-k bound). Returns (B,) int32 tokens."""
    b, v = logits.shape
    logits = logits.astype(jnp.float32)
    if bias_idx is not None:
        logits = logits.at[:, bias_idx].add(bias_val)

    if has_pen:
        # llama_sampler_penalties: every token in the last-n window gets its
        # positive logit divided by `repeat` (negative multiplied), minus
        # freq*count + present
        valid = recent >= 0
        ids = jnp.where(valid, recent, 0)
        ones = valid.astype(jnp.float32)
        counts = jax.vmap(
            lambda i, o: jnp.zeros((v,), jnp.float32).at[i].add(o))(ids, ones)
        rep = sp["penalty_repeat"][:, None]
        hit = counts > 0
        scaled = jnp.where(logits > 0, logits / rep, logits * rep)
        logits = jnp.where(hit, scaled, logits)
        logits = logits - counts * sp["penalty_freq"][:, None]
        logits = (logits
                  - hit.astype(jnp.float32) * sp["penalty_present"][:, None])

    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if not has_dist:
        return greedy_tok

    temp = jnp.maximum(sp["temp"], 1e-6)[:, None]
    dist_tok = None
    if top_k > 0:
        vals, idx = jax.lax.top_k(logits, min(top_k, v))  # sorted desc
        rank = jnp.arange(vals.shape[-1])[None, :]
        in_k = rank < sp["top_k"][:, None]
        vals = jnp.where(in_k, vals, NEG_INF)
        # top-p (apply_top_p): keep until the cumulative prob crosses p,
        # inclusive — position i stays iff cum[i-1] < p (softmax over the
        # kept top-k values)
        probs = jax.nn.softmax(vals, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep_tp = ((cum - probs) < sp["top_p"][:, None]) & in_k
        keep_tp |= (rank < sp["min_keep"][:, None]) & in_k
        # min-p (apply_min_p): the prob ratio to the max is renormalization-
        # invariant, so the original top-k softmax works directly
        keep_mp = probs >= sp["min_p"][:, None] * probs[:, :1]
        keep = keep_tp & keep_mp
        # host fallback: fewer than min_keep survivors -> the first
        # min_keep of the candidates that entered min_p (top-p survivors)
        tp_rank = jnp.cumsum(keep_tp.astype(jnp.int32), axis=-1)
        fallback = keep_tp & (tp_rank <= sp["min_keep"][:, None])
        enough = keep.sum(axis=-1, keepdims=True) >= sp["min_keep"][:, None]
        keep = jnp.where(enough, keep, fallback)
        masked = jnp.where(keep, vals / temp, NEG_INF)
        j = jax.vmap(jax.random.categorical)(key, masked)
        dist_tok = jnp.take_along_axis(idx, j[:, None], axis=1)[:, 0]
    if has_free or top_k == 0:
        free_tok = jax.vmap(jax.random.categorical)(key, logits / temp)
        free_row = sp["top_k"] > MAX_TOPK
        dist_tok = free_tok if dist_tok is None else jnp.where(
            free_row, free_tok, dist_tok)

    return jnp.where(sp["temp"] <= 0, greedy_tok,
                     dist_tok.astype(jnp.int32))


def fill_recent_ring(row: np.ndarray, toks, ln: int) -> None:
    """Write the last-`ln` history into the ring layout the device loop
    uses: token a lives at a % ln, so the next device write (at
    recent_n % ln) evicts the OLDEST window entry."""
    n = len(toks)
    for a in range(max(0, n - ln), n):
        row[a % ln] = toks[a]


_single_sample_cache: dict = {}


def sample_one(row: np.ndarray | None, p: SlotSampleParams, recent_tokens,
               gen_count: int, logit_bias: dict | None = None,
               recent_cap: int = 256, shortlist=None) -> int:
    """Draw ONE token for one slot with exactly the chunked device loop's
    semantics AND key schedule, given a host logits row OR a device top-k
    shortlist (vals, ids, n_vocab).

    Why this exists: a request's sampled stream must be a function of
    (seed, token index) ONLY — never of which path the engine happened to
    route the step through. Whenever the batched host path (Engine.step)
    decodes a fused-eligible dist slot (first token after prefill, or a
    batch that contains a grammar/mirostat slot), it draws through here so
    the stream matches what step_fused would have produced (reference
    guarantee: same seed -> same text, results.feature).

    The shortlist form reconstructs a virtual full row ON DEVICE (scatter
    of MAX_TOPK values into a NEG_INF base), so only ~2 KB crosses the
    wire instead of the 512 KB f32 vocab row: draws are identical to the
    full-row form whenever the candidate set is inside the shortlist
    (guaranteed by Engine's shortlist-eligibility rule)."""
    import jax
    import jax.numpy as jnp

    v = int(row.shape[-1]) if shortlist is None else int(shortlist[2])
    has_dist = p.temp > 0
    bounded = has_dist and 0 < p.top_k <= MAX_TOPK
    has_free = has_dist and not bounded
    top_k = MAX_TOPK if bounded else 0
    has_pen = p.penalties_active()
    has_bias = bool(logit_bias)
    sl_mode = shortlist is not None

    key_ = (top_k, has_pen, has_dist, has_free, has_bias, v, sl_mode)
    fn = _single_sample_cache.get(key_)
    if fn is None:
        if sl_mode:
            @jax.jit
            def fn(vals, ids, recent, seeds, count, sp, bias_idx, bias_val):
                logits = jnp.full((1, v), NEG_INF, jnp.float32
                                  ).at[0, ids[0]].set(vals[0])
                keys = jax.vmap(jax.random.PRNGKey)(seeds)
                step_key = jax.vmap(jax.random.fold_in)(keys, count)
                return device_sample(
                    logits, recent, step_key, sp, top_k=top_k,
                    has_pen=has_pen, has_dist=has_dist, has_free=has_free,
                    bias_idx=bias_idx if has_bias else None,
                    bias_val=bias_val if has_bias else None)
        else:
            @jax.jit
            def fn(logits, recent, seeds, count, sp, bias_idx, bias_val):
                keys = jax.vmap(jax.random.PRNGKey)(seeds)
                step_key = jax.vmap(jax.random.fold_in)(keys, count)
                return device_sample(
                    logits, recent, step_key, sp, top_k=top_k,
                    has_pen=has_pen, has_dist=has_dist, has_free=has_free,
                    bias_idx=bias_idx if has_bias else None,
                    bias_val=bias_val if has_bias else None)

        _single_sample_cache[key_] = fn

    sp = {f: np.asarray([x], np.float32) for f, x in [
        ("temp", p.temp), ("top_p", p.top_p), ("min_p", p.min_p),
        ("penalty_repeat", p.penalty_repeat),
        ("penalty_freq", p.penalty_freq),
        ("penalty_present", p.penalty_present)]}
    sp["top_k"] = np.asarray(
        [p.top_k if bounded else MAX_TOPK + 1], np.int32)
    sp["min_keep"] = np.asarray([max(p.min_keep, 1)], np.int32)
    ln = recent_cap if p.penalty_last_n < 0 \
        else min(p.penalty_last_n, recent_cap)
    sp["eff_last_n"] = np.asarray([max(ln, 1)], np.int32)
    recent = np.full((1, recent_cap), -1, np.int32)
    if has_pen and recent_tokens:
        fill_recent_ring(recent[0], list(recent_tokens), int(ln))
    bias_idx = bias_val = np.zeros((1,), np.int32)
    if has_bias:
        bias_idx = np.fromiter(logit_bias.keys(), np.int32)
        bias_val = np.fromiter((float(x) for x in logit_bias.values()),
                               np.float32)
    if sl_mode:
        vals, ids = shortlist[0], shortlist[1]
        tok = fn(np.asarray(vals, np.float32)[None],
                 np.asarray(ids, np.int32)[None], recent,
                 np.asarray([p.seed & 0xFFFFFFFF], np.uint32),
                 np.asarray([gen_count], np.uint32), sp, bias_idx, bias_val)
    else:
        tok = fn(np.asarray(row, np.float32)[None], recent,
                 np.asarray([p.seed & 0xFFFFFFFF], np.uint32),
                 np.asarray([gen_count], np.uint32), sp, bias_idx, bias_val)
    return int(np.asarray(tok)[0])


class FusedGenerator:
    """Chunked on-device generation bound to a batched decode step.

    fwd(params, caches, token(B,1), cache_pos(B,), rope_pos(B,)) ->
    (logits(B, V), new_caches) — the Engine's `_decode` body (unjitted).

    eog/stop-string checks happen on the HOST between chunks (only
    grammar-free configs reach this path); the caller truncates tokens a
    row generated past its stop using the returned (B, chunk) array.

    CALLER CONTRACT: parked rows (slot_params[b] is None) must come in with
    cache_pos[b] < max_seq - they keep overwriting one not-yet-used KV cell;
    Engine.step_fused resets full idle slots before calling.
    """

    def __init__(self, fwd, n_vocab: int, chunk: int = 16,
                 recent_cap: int = 256):
        self.fwd = fwd
        self.n_vocab = n_vocab
        self.chunk = chunk
        self.recent_cap = recent_cap
        self._loops: dict[tuple, object] = {}

    # -- compiled chunk loop (one per static sampler-config signature) -----

    def _loop(self, chunk: int, top_k: int, has_pen: bool, has_dist: bool,
              has_free: bool, has_bias: bool, probs_k: int = 0):
        key_ = (chunk, top_k, has_pen, has_dist, has_free, has_bias,
                probs_k)
        if key_ in self._loops:
            return self._loops[key_]
        fwd = self.fwd

        @jax.jit
        def loop(params, caches, token, cache_pos, rope_delta, recent,
                 recent_n, seeds, gen_count, done0, sp, n_left, bias_idx,
                 bias_val, eog):
            b = token.shape[0]
            # per-row keys built ON DEVICE: the tunneled runtime charges a
            # full round-trip for every eager host-side op. Keys derive from
            # (seed, absolute token index in THIS sequence) only — never from
            # engine-global state — so two identical seeded requests draw
            # identical streams no matter how the engine chunked other work
            # (reference guarantee: same seed -> same text).
            keys = jax.vmap(jax.random.PRNGKey)(seeds)
            out0 = jnp.full((b, chunk), -1, jnp.int32)
            # per-step top-N logprob capture (n_probs > 0 slots): values,
            # ids, the row logsumexp and the SAMPLED token's logit ride the
            # one chunk transfer — exact OpenAI logprobs at ~probs_k*8
            # bytes/step instead of a 512 KB row fetch
            lp0 = (jnp.zeros((b, chunk, probs_k), jnp.float32),
                   jnp.zeros((b, chunk, probs_k), jnp.int32),
                   jnp.zeros((b, chunk), jnp.float32),
                   jnp.zeros((b, chunk), jnp.float32)) if probs_k else None

            def cond(c):
                i = c[0]
                done = c[7]
                return (i < chunk) & ~jnp.all(done)

            def body(c):
                (i, caches, token, cache_pos, recent, recent_n, out, done,
                 n_left, lp) = c
                rope_pos = cache_pos + rope_delta
                logits, caches = fwd(params, caches, token, cache_pos,
                                     rope_pos)
                # each live row generates exactly one token per iteration,
                # so gen_count + i IS that row's absolute draw index
                step_key = jax.vmap(jax.random.fold_in)(
                    keys, (gen_count + i).astype(jnp.uint32))
                tok = device_sample(
                    logits, recent, step_key, sp, top_k=top_k,
                    has_pen=has_pen, has_dist=has_dist, has_free=has_free,
                    bias_idx=bias_idx if has_bias else None,
                    bias_val=bias_val if has_bias else None)
                if probs_k:
                    lf = logits.astype(jnp.float32)
                    pv, pi = jax.lax.top_k(lf, probs_k)
                    lse = jax.scipy.special.logsumexp(lf, axis=-1)
                    tl = jnp.take_along_axis(lf, tok[:, None], axis=1)[:, 0]
                    lp = (lp[0].at[:, i].set(pv), lp[1].at[:, i].set(pi),
                          lp[2].at[:, i].set(lse), lp[3].at[:, i].set(tl))
                live = ~done
                # parked rows keep their previous token and cache_pos: their
                # KV write lands in one never-yet-used cell every step, which
                # the caller guarantees is safe
                token = jnp.where(live[:, None], tok[:, None], token)
                out = out.at[:, i].set(jnp.where(live, tok, -1))
                if has_pen:
                    ln = jnp.maximum(sp["eff_last_n"], 1)
                    wix = recent_n % ln
                    new_rec = jax.vmap(
                        lambda r, j, t: r.at[j].set(t))(recent, wix, tok)
                    recent = jnp.where(live[:, None], new_rec, recent)
                    recent_n = recent_n + live.astype(jnp.int32)
                cache_pos = cache_pos + live.astype(cache_pos.dtype)
                n_left = n_left - live.astype(jnp.int32)
                # end-of-generation tokens stop the row ON DEVICE: no
                # wasted decode steps past eog within the chunk
                is_eog = (tok[:, None] == eog[None, :]).any(axis=-1)
                done = done | (n_left <= 0) | (live & is_eog)
                return (i + 1, caches, token, cache_pos, recent, recent_n,
                        out, done, n_left, lp)

            init = (jnp.int32(0), caches, token, cache_pos, recent,
                    recent_n, out0, done0, n_left, lp0)
            c = jax.lax.while_loop(cond, body, init)
            return c[1], c[6], c[3], c[9]  # caches, tokens, cache_pos, lp

        self._loops[key_] = loop
        return loop

    # -- host-side driver ---------------------------------------------------

    def generate(self, params, caches, token: np.ndarray,
                 cache_pos: np.ndarray, rope_delta: np.ndarray,
                 slot_params: list, recent_tokens: list,
                 n_left: np.ndarray, gen_count: np.ndarray,
                 logit_bias: dict | None = None, chunk: int | None = None,
                 eog_ids=(), probs_k: int = 0):
        """Run up to `chunk` decode+sample steps on-device.

        slot_params[b]: SlotSampleParams or None (parked row).
        recent_tokens[b]: that slot's prior-token history (host keeps the
        authoritative list); only the penalty window is shipped.
        n_left[b]: tokens row b may still generate.
        gen_count[b]: tokens row b has ALREADY generated in its sequence —
        the per-slot draw counter that keeps seeded sampling reproducible
        across chunk boundaries and engine state.
        probs_k > 0 additionally captures per-step top-probs_k logprob data
        (vals, ids, logsumexp, sampled-token logit) for OpenAI logprobs.
        Returns (new_caches, tokens (B, chunk) int32 with -1 on parked
        steps, new_cache_pos (B,), lp) where lp is None or that 4-tuple of
        numpy arrays.
        """
        b = token.shape[0]
        chunk = chunk or self.chunk
        fields = ("temp", "top_p", "min_p", "penalty_repeat", "penalty_freq",
                  "penalty_present")
        sp = {f: np.zeros((b,), np.float32) for f in fields}
        sp["top_k"] = np.zeros((b,), np.int32)
        sp["min_keep"] = np.ones((b,), np.int32)
        sp["eff_last_n"] = np.ones((b,), np.int32)
        seeds = np.zeros((b,), np.uint64)
        done0 = np.ones((b,), bool)
        has_pen = has_dist = has_free = False
        max_k = 0
        for i, p in enumerate(slot_params):
            if p is None:
                continue
            done0[i] = False
            sp["temp"][i] = p.temp
            sp["top_p"][i] = p.top_p
            sp["min_p"][i] = p.min_p
            sp["min_keep"][i] = p.min_keep
            sp["penalty_repeat"][i] = p.penalty_repeat
            sp["penalty_freq"][i] = p.penalty_freq
            sp["penalty_present"][i] = p.penalty_present
            ln = p.penalty_last_n
            sp["eff_last_n"][i] = self.recent_cap if ln < 0 \
                else min(ln, self.recent_cap)
            seeds[i] = p.seed & 0xFFFFFFFF
            if p.temp > 0:
                has_dist = True
                if 0 < p.top_k <= MAX_TOPK:
                    # static draw width is ALWAYS MAX_TOPK (not the batch
                    # max): the categorical's gumbel vector shape must not
                    # depend on which other slots happen to be co-scheduled,
                    # or same-seed requests would draw differently under
                    # different concurrent load
                    max_k = MAX_TOPK
                    sp["top_k"][i] = p.top_k
                else:  # bare categorical row
                    has_free = True
                    sp["top_k"][i] = MAX_TOPK + 1
            if p.penalties_active():
                has_pen = True

        recent = np.full((b, self.recent_cap), -1, np.int32)
        recent_n = np.zeros((b,), np.int32)
        if has_pen:
            for i, toks in enumerate(recent_tokens):
                p = slot_params[i]
                if p is None or not toks or not p.penalties_active():
                    continue
                ln = int(sp["eff_last_n"][i])
                fill_recent_ring(recent[i], toks, ln)
                recent_n[i] = len(toks)

        bias_idx = bias_val = np.zeros((1,), np.int32)
        has_bias = bool(logit_bias)
        if has_bias:
            bias_idx = np.fromiter(logit_bias.keys(), np.int32)
            bias_val = np.fromiter((float(x) for x in logit_bias.values()),
                                   np.float32)

        loop = self._loop(chunk, max_k, has_pen, has_dist, has_free,
                          has_bias, probs_k)
        eog = (np.fromiter(eog_ids, np.int32) if eog_ids
               else np.asarray([-2], np.int32))
        # ONE dispatch: numpy operands ride the jit call; outputs come back
        # in ONE device_get (per-array np.asarray would each pay the ~28 ms
        # tunnel round-trip, dominating the chunk)
        caches, toks, new_pos, lp = loop(
            params, caches, token.astype(np.int32), cache_pos,
            rope_delta.astype(np.int32), recent, recent_n,
            seeds.astype(np.uint32), gen_count.astype(np.int32),
            done0, sp, n_left.astype(np.int32), bias_idx, bias_val, eog)
        if probs_k:
            toks, new_pos, lp = jax.device_get((toks, new_pos, lp))
        else:
            toks, new_pos = jax.device_get((toks, new_pos))
            lp = None
        return caches, toks, new_pos, lp
