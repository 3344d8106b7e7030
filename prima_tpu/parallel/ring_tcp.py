"""TCP ring data plane: multi-process distributed inference.

The faithful analogue of the reference's decode-loop wire protocol
(llama_send_meta/llama_recv_meta src/llama.cpp:17870/17920,
llama_send_tensors/llama_recv_tensors @18031/18054, worker service loop
main.cpp:664-681): per ubatch the master broadcasts metadata, the
activation hops rank to rank around the ring k times (piped-ring), and the
last window's output returns straight to rank 0 (the master-socket
shortcut) for the output head.

Beyond the reference's plane, this one is a *runtime*, not a demo:

  * batched ubatches — server slots ride the ring in GROUPS (the piped
    microbatches): group g's activation train overlaps the master's compute
    for group g+1, so the master never sits idle while workers run (the
    reference's prefetch-overlap, src/llama.cpp:18503-18575, realized as
    ubatch pipelining).
  * full sampler chain + continuous batching on rank 0 (TcpRingEngine is
    Engine-compatible: the server's EngineWorker drives it unchanged).
  * KV mutations replicate ring-wide as tagged messages (the
    llama_send_kv_cache_* protocol, src/llama.cpp:22610-22745): truncation
    is master-metadata-only (workers get cache_pos per meta); remap ops
    (context-shift/self-extend) and seq_cp broadcast src/delta vectors that
    every rank applies to its own windows' cache.
  * bf16 activations on the wire (half the reference's f32 traffic); f32
    remains for the final logits-bearing hop.

On a real TPU pod the SPMD pipeline (parallel/pipeline.py) replaces this
with ICI/DCN collectives; this plane exists for heterogeneous hosts that
only share a network — exactly prima.cpp's home-cluster regime — and for
multi-process testing (the Docker-sim analogue).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Any

import numpy as np

from ..models.config import ModelConfig
from ..models.llama import ForwardOptions
from .bootstrap import RingConfig, RingNode, _recv_exact, _recv_msg, _send_msg
from .ring_host import RingPlan

_THDR = struct.Struct("<III")  # ndim, dtype code, nbytes
_DTYPES = {0: np.float32, 1: np.int32, 2: np.uint8, 3: np.uint16}
_DTYPE_CODES = {np.dtype(np.float32): 0, np.dtype(np.int32): 1,
                np.dtype(np.uint8): 2, np.dtype(np.uint16): 3}


def send_tensor(sock, a: np.ndarray) -> None:
    a = np.ascontiguousarray(a)
    code = _DTYPE_CODES[a.dtype]
    hdr = _THDR.pack(a.ndim, code, a.nbytes)
    dims = struct.pack(f"<{a.ndim}q", *a.shape)
    sock.sendall(hdr + dims + a.tobytes())


def recv_tensor(sock) -> np.ndarray:
    ndim, code, nbytes = _THDR.unpack(_recv_exact(sock, _THDR.size))
    shape = struct.unpack(f"<{ndim}q", _recv_exact(sock, 8 * ndim))
    data = _recv_exact(sock, nbytes)
    return np.frombuffer(data, dtype=_DTYPES[code]).reshape(shape).copy()


def send_act(sock, a: np.ndarray, wire_bf16: bool = True) -> None:
    """Activation hop: bf16 on the wire (the reference sends f32 —
    ring_tcp halves that; bf16 matches the compute dtype anyway)."""
    if wire_bf16 and a.dtype == np.float32:
        send_tensor(sock, (a.view(np.uint32) >> 16).astype(np.uint16))
    else:
        send_tensor(sock, a)


def recv_act(sock) -> np.ndarray:
    a = recv_tensor(sock)
    if a.dtype == np.uint16:  # bf16 wire format
        return (a.astype(np.uint32) << 16).view(np.float32)
    return a


@dataclass
class RingContext:
    node: RingNode
    plan: RingPlan
    rank: int
    world: int

    @property
    def is_master(self) -> bool:
        return self.rank == 0


def _group_rows(n_slots: int, n_groups: int) -> int:
    assert n_slots % n_groups == 0, (n_slots, n_groups)
    return n_slots // n_groups


class _WindowStreamer:
    """Executes the scheduler's resident/streamed split (n[m]) on one ring
    rank: streamed layers live host-packed (the mmap analogue), and before
    a window computes its streamed layers are committed to HBM while the
    NEXT window's host->HBM copy is enqueued asynchronously — the piped-ring
    prefetch overlap of manage_graph_tensors (reference
    src/llama.cpp:18152-18218, invoked per subgraph @18567-18575). HBM holds
    at most two windows' streamed layers at any moment, so a rank whose
    windows exceed device memory still serves (k·n_resident +
    2·(w−n_resident) layers instead of k·w)."""

    def __init__(self, params: dict, ranges, streamed_host: dict[int, dict]):
        from ..runtime.streaming import _to_device

        self.params = params
        self.host = streamed_host
        self._put = _to_device
        self._bufs: dict[int, dict] = {}
        self.win_ids = [[i for i in range(lo, hi) if i in streamed_host]
                        for lo, hi in ranges]
        self._cur: int | None = None
        self._prefetch(0)

    def _prefetch(self, c: int) -> None:
        for i in self.win_ids[c]:
            if i not in self._bufs:
                self._bufs[i] = self._put(self.host[i])  # async enqueue

    def ensure(self, c: int) -> None:
        """Commit window c's streamed layers; release the previous window's
        and enqueue the next window's upload (cycle-major ring order)."""
        if self._cur == c:
            return
        if self._cur is not None and self._cur != c:
            for i in self.win_ids[self._cur]:
                self.params["layers"][i] = None
                self._bufs.pop(i, None)  # JAX frees once compute consumed it
        self._prefetch(c)
        for i in self.win_ids[c]:
            self.params["layers"][i] = self._bufs[i]
        nxt = (c + 1) % len(self.win_ids)
        if nxt != c:
            self._prefetch(nxt)
        self._cur = c


class TcpRingWorker:
    """Worker ranks: the llama_decode(empty batch) service loop, batched
    and grouped. Protocol tags: meta / act / kv / stop."""

    def __init__(self, ctx: RingContext, cfg: ModelConfig, params: dict,
                 max_seq: int = 2048, opts: ForwardOptions | None = None,
                 kv_dtype=None, n_slots: int = 1, n_groups: int = 1,
                 streamed_host: dict[int, dict] | None = None):
        import functools

        import jax
        import jax.numpy as jnp

        from ..models.llama import forward, init_kv_caches
        from ..runtime.kv import KVCache

        self.ctx = ctx
        self.cfg = cfg
        self.params = params
        self.streamer = (_WindowStreamer(params,
                                         ctx.plan.layer_ranges()[ctx.rank],
                                         streamed_host)
                         if streamed_host else None)
        self.opts = opts or ForwardOptions()
        kv_dtype = kv_dtype if kv_dtype is not None else jnp.bfloat16
        ranges = ctx.plan.layer_ranges()[ctx.rank]
        self.ranges = ranges
        owned = set()
        for lo, hi in ranges:
            owned.update(range(lo, hi))
        bg = _group_rows(n_slots, n_groups)
        self.n_groups = n_groups
        # per-group KVCache wrappers: remap/seq_cp ops run on every rank
        self.kvc = [
            KVCache(cfg, bg, max_seq, kv_dtype,
                    caches=init_kv_caches(cfg, bg, max_seq, kv_dtype,
                                          layer_filter=lambda i: i in owned))
            for _ in range(n_groups)
        ]
        cfg_, opts_ = cfg, self.opts

        @functools.partial(jax.jit, static_argnames=("lo", "hi"))
        def window_fn(params, kv, x, positions, rope_delta, cache_pos, lo, hi):
            # rope positions may carry the Self-Extend compression offset;
            # the causal mask keys off the physical cell positions
            rpos = positions + rope_delta[:, None]
            return forward(params, cfg_, None, rpos, kv, cache_pos, opts_,
                           layer_range=(lo, hi), hidden_in=x,
                           return_hidden=True, mask_positions=positions)

        self._window_fn = window_fn

    def _compute_window(self, g: int, c: int, x: np.ndarray,
                        positions: np.ndarray, cache_pos: np.ndarray,
                        rope_delta: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        lo, hi = self.ranges[c]
        if self.streamer is not None:
            self.streamer.ensure(c)
        xj = jnp.asarray(x, dtype=self.opts.dtype)
        out, self.kvc[g].caches = self._window_fn(
            self.params, self.kvc[g].caches, xj, jnp.asarray(positions),
            jnp.asarray(rope_delta), jnp.asarray(cache_pos), lo=lo, hi=hi)
        return np.asarray(out, dtype=np.float32)

    def _apply_kv_op(self, msg: dict) -> None:
        """llama_send_kv_cache_* analogue: apply a replicated mutation."""
        g = int(msg.get("group", 0))
        kvc = self.kvc[g]
        op = msg["op"]
        if op == "remap":
            kvc.remap(int(msg["slot"]),
                      np.asarray(msg["src"], np.int32),
                      np.asarray(msg["delta"], np.int32),
                      int(msg["new_used"]))
        elif op == "seq_cp":
            kvc.seq_cp(int(msg["dst"]), int(msg["src"]))
        elif op == "rope_shift":
            kvc.rope_shift(int(msg["slot"]),
                           np.asarray(msg["delta"], np.int32))
        elif op == "clear":
            kvc.clear()
        else:
            raise ValueError(f"unknown kv op {op}")

    def serve(self) -> None:
        """Blocks until STOP (the reference's infinite llama_decode loop)."""
        node = self.ctx.node
        metas: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        while True:
            msg = node.recv_prev(timeout=None)
            tag = msg.get("tag")
            if tag == "stop":
                if (node.rank + 1) % node.world != msg.get("from", 0):
                    node.send_next(msg)
                return
            if tag == "kv":
                self._apply_kv_op(msg)
                if (node.rank + 1) % node.world != 0:
                    node.send_next(msg)  # relay until the last worker
                continue
            if tag == "meta":
                g = int(msg.get("group", 0))
                pos = np.asarray(msg["positions"], np.int32)
                if pos.ndim == 1:
                    pos = pos[None]
                rd = np.asarray(msg.get("rope_delta",
                                        [0] * pos.shape[0]), np.int32)
                metas[g] = (pos, np.asarray(msg["cache_pos"], np.int32), rd)
                if (node.rank + 1) % node.world != 0:
                    node.send_next(msg)
                continue
            assert tag == "act", tag
            g = int(msg.get("group", 0))
            c = int(msg["cycle"])
            x = recv_act(node.recv_sock)
            positions, cache_pos, rope_delta = metas[g]
            x = self._compute_window(g, c, x, positions, cache_pos,
                                     rope_delta)
            last = (self.ctx.rank == self.ctx.world - 1
                    and c == self.ctx.plan.k - 1)
            # ring hop — the master shortcut IS the ring hop for the
            # final window (next of rank n-1 is rank 0)
            node.send_next({"tag": "act", "cycle": c, "group": g,
                            "final": last})
            send_act(node.send_sock, x)


def relay_loop(node: RingNode) -> None:
    """Forwarder role (common/common.cpp:1832-1873): a device the scheduler
    removed keeps relaying ring traffic so the ring is never re-wired."""
    next_is_master = (node.rank + 1) % node.world == 0
    while True:
        msg = node.recv_prev(timeout=None)
        if msg.get("tag") in ("meta", "kv") and next_is_master:
            # the master never consumes meta/kv (it originated them);
            # forwarding would desync the master's recv stream
            continue
        node.send_next(msg)
        if msg.get("tag") == "act":
            send_tensor(node.send_sock, recv_tensor(node.recv_sock))
        elif msg.get("tag") == "stop":
            return


class _MasterCore:
    """Rank 0 compute: embedding + master windows + output head, grouped."""

    def __init__(self, ctx: RingContext, cfg: ModelConfig, params: dict,
                 max_seq: int, opts: ForwardOptions, kv_dtype,
                 n_slots: int, n_groups: int,
                 streamed_host: dict[int, dict] | None = None):
        import functools

        import jax
        import jax.numpy as jnp

        from ..models.llama import forward, linear, init_kv_caches, model_norm
        from ..runtime.kv import KVCache

        self.ctx = ctx
        self.cfg = cfg
        self.params = params
        self.opts = opts
        self.max_seq = max_seq
        kv_dtype = kv_dtype if kv_dtype is not None else jnp.bfloat16
        self.ranges = ctx.plan.layer_ranges()[0]
        self.streamer = (_WindowStreamer(params, self.ranges, streamed_host)
                         if streamed_host else None)
        owned = set()
        for lo, hi in self.ranges:
            owned.update(range(lo, hi))
        bg = _group_rows(n_slots, n_groups)
        self.n_groups, self.bg = n_groups, bg
        self.kvc = [
            KVCache(cfg, bg, max_seq, kv_dtype,
                    caches=init_kv_caches(cfg, bg, max_seq, kv_dtype,
                                          layer_filter=lambda i: i in owned))
            for _ in range(n_groups)
        ]
        cfg_, opts_ = cfg, opts

        @functools.partial(jax.jit, static_argnames=("lo", "hi"))
        def first_window(params, kv, tokens, positions, rope_delta, cache_pos,
                         lo, hi):
            rpos = positions + rope_delta[:, None]
            return forward(params, cfg_, tokens, rpos, kv, cache_pos, opts_,
                           layer_range=(lo, hi), return_hidden=True,
                           mask_positions=positions)

        @functools.partial(jax.jit, static_argnames=("lo", "hi"))
        def mid_window(params, kv, x, positions, rope_delta, cache_pos,
                       lo, hi):
            rpos = positions + rope_delta[:, None]
            return forward(params, cfg_, None, rpos, kv, cache_pos, opts_,
                           layer_range=(lo, hi), hidden_in=x,
                           return_hidden=True, mask_positions=positions)

        @jax.jit
        def head_fn(params, x):
            x = model_norm(x, params.get("output_norm"),
                           params.get("output_norm_b"), cfg_)
            w = params["output"] if params.get("output") is not None else params["tok_embd"]
            return linear(x, w, opts_.matmul_impl).astype(opts_.logits_dtype)

        self._first = first_window
        self._mid = mid_window
        self._head = head_fn

    def _send_meta(self, g: int, positions: np.ndarray,
                   cache_pos: np.ndarray, rope_delta: np.ndarray) -> None:
        self.ctx.node.send_next({
            "tag": "meta", "group": g,
            "positions": positions.tolist(),
            "cache_pos": cache_pos.tolist(),
            "rope_delta": rope_delta.tolist(),
        })

    def ring_pass(self, groups: list[tuple[int, np.ndarray, np.ndarray, np.ndarray]],
                  ) -> dict[int, np.ndarray]:
        """Pipelined ubatch train: [(g, tokens(B,S), positions(B,S),
        cache_pos(B))] -> {g: hidden (B,S,E)}.

        The master's window for group g+1's cycle overlaps the workers'
        compute for group g (the piped-ring schedule over TCP: one ubatch
        per stage in flight, FIFO order preserved by the ring links)."""
        import collections

        import jax.numpy as jnp

        node = self.ctx.node
        k = self.ctx.plan.k
        hidden: dict[int, np.ndarray] = {}
        # accept 4-tuples (no Self-Extend: zero rope offsets) or 5-tuples
        groups = [gr if len(gr) == 5
                  else gr + (np.zeros(gr[1].shape[0], np.int32),)
                  for gr in groups]
        if self.ctx.world == 1:
            # degenerate single-process ring: master owns every window
            for g, tokens, positions, cache_pos, rope_delta in groups:
                x = None
                for c in range(k):
                    lo, hi = self.ranges[c]
                    if self.streamer is not None:
                        self.streamer.ensure(c)
                    if c == 0:
                        x, self.kvc[g].caches = self._first(
                            self.params, self.kvc[g].caches,
                            jnp.asarray(tokens), jnp.asarray(positions),
                            jnp.asarray(rope_delta),
                            jnp.asarray(cache_pos), lo=lo, hi=hi)
                    else:
                        x, self.kvc[g].caches = self._mid(
                            self.params, self.kvc[g].caches,
                            jnp.asarray(x, self.opts.dtype),
                            jnp.asarray(positions), jnp.asarray(rope_delta),
                            jnp.asarray(cache_pos), lo=lo, hi=hi)
                hidden[g] = np.asarray(x, np.float32)
            return hidden

        meta = {g: (positions, cache_pos, rope_delta)
                for g, _, positions, cache_pos, rope_delta in groups}
        pending: collections.deque = collections.deque()
        for g, tokens, positions, cache_pos, rope_delta in groups:
            self._send_meta(g, positions, cache_pos, rope_delta)
            lo, hi = self.ranges[0]
            if self.streamer is not None:
                self.streamer.ensure(0)
            x, self.kvc[g].caches = self._first(
                self.params, self.kvc[g].caches, jnp.asarray(tokens),
                jnp.asarray(positions), jnp.asarray(rope_delta),
                jnp.asarray(cache_pos), lo=lo, hi=hi)
            node.send_next({"tag": "act", "cycle": 0, "group": g})
            send_act(node.send_sock, np.asarray(x, np.float32))
            pending.append((g, 0))

        while pending:
            g, c = pending.popleft()
            hdr = node.recv_prev(timeout=None)
            assert hdr["tag"] == "act", hdr
            assert int(hdr.get("group", 0)) == g and int(hdr["cycle"]) == c, \
                (hdr, g, c)
            x = recv_act(node.recv_sock)
            if c + 1 < k:
                positions, cache_pos, rope_delta = meta[g]
                lo, hi = self.ranges[c + 1]
                if self.streamer is not None:
                    self.streamer.ensure(c + 1)
                xj, self.kvc[g].caches = self._mid(
                    self.params, self.kvc[g].caches,
                    jnp.asarray(x, self.opts.dtype), jnp.asarray(positions),
                    jnp.asarray(rope_delta), jnp.asarray(cache_pos),
                    lo=lo, hi=hi)
                node.send_next({"tag": "act", "cycle": c + 1, "group": g})
                send_act(node.send_sock, np.asarray(xj, np.float32))
                pending.append((g, c + 1))
            else:
                hidden[g] = x
        return hidden

    def head(self, hidden: np.ndarray):
        import jax.numpy as jnp

        return self._head(self.params, jnp.asarray(hidden, self.opts.dtype))

    # -- ring-replicated KV mutations -----------------------------------------

    def _bcast_kv(self, msg: dict) -> None:
        if self.ctx.world > 1:
            self.ctx.node.send_next({"tag": "kv", **msg})

    def kv_remap(self, g: int, slot: int, src: np.ndarray, delta: np.ndarray,
                 new_used: int) -> None:
        self._bcast_kv({"op": "remap", "group": g, "slot": slot,
                        "src": src.tolist(), "delta": delta.tolist(),
                        "new_used": new_used})
        self.kvc[g].remap(slot, src, delta, new_used)

    def kv_seq_cp(self, g: int, dst: int, src: int) -> None:
        self._bcast_kv({"op": "seq_cp", "group": g, "dst": dst, "src": src})
        self.kvc[g].seq_cp(dst, src)

    def kv_rope_shift(self, g: int, slot: int, delta: np.ndarray) -> None:
        """Self-Extend compression: re-rotate the slot's cached K by the
        per-cell delta on every rank (the reference broadcasts the
        seq_add/seq_div ops ring-wide, main.cpp:603-606)."""
        self._bcast_kv({"op": "rope_shift", "group": g, "slot": slot,
                        "delta": delta.tolist()})
        self.kvc[g].rope_shift(slot, delta)

    def kv_context_shift(self, g: int, slot: int, n_keep: int,
                         n_discard: int, used: int) -> None:
        move = used - n_keep - n_discard
        idx = np.arange(self.max_seq, dtype=np.int32)
        src = np.where(idx < n_keep, idx, idx + n_discard)
        delta = np.where((idx >= n_keep) & (idx < n_keep + move),
                         -n_discard, 0).astype(np.int32)
        self.kv_remap(g, slot, src, delta, n_keep + move)


class TcpRingEngine:
    """Engine-compatible continuous batching over the TCP ring (rank 0).

    Slots live on the (group, row) grid; every step() drives one pipelined
    ubatch train through the ring for all active slots and runs the full
    sampler chain per slot — the reference server's update_slots +
    llama_decode(ctx, batch_view, true) flow (server.cpp:1996-2451) over
    the wire protocol."""

    use_scan = False

    def __init__(self, ctx: RingContext, cfg: ModelConfig, params: dict,
                 n_slots: int = 4, n_groups: int | None = None,
                 max_seq: int = 2048, n_batch: int = 64,
                 opts: ForwardOptions | None = None, kv_dtype=None,
                 eog_ids: set[int] | None = None, ctx_shift: bool = False,
                 n_keep: int = 0, grp_attn_n: int = 1, grp_attn_w: int = 512,
                 streamed_host: dict[int, dict] | None = None):
        from ..runtime.engine import SlotState

        if n_groups is None:
            # one in-flight ubatch per ring hop keeps every stage busy
            n_groups = max(1, min(ctx.world, n_slots))
            while n_slots % n_groups:
                n_groups -= 1
        self.core = _MasterCore(ctx, cfg, params, max_seq,
                                opts or ForwardOptions(), kv_dtype,
                                n_slots, n_groups,
                                streamed_host=streamed_host)
        self.ctx = ctx
        self.cfg = cfg
        self.max_seq = max_seq
        self.n_batch = n_batch
        self.G, self.Bg = n_groups, n_slots // n_groups
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
        # KV writes are dynamic_update_slice (clamped starts): in a shared
        # bucket, a PARKED row whose cache_pos is within s_len of the end
        # would have its garbage write shifted onto real cells. With one
        # row per group there are no parked rows beside active ones, so the
        # full cache is usable (single-chip semantics); wider groups
        # reserve n_batch cells so parked rows never sit inside a bucket's
        # clamp range (parallel/engine.py keeps the same reservation).
        self._row_limit = (max_seq if n_slots // n_groups == 1
                           else max_seq - n_batch)
        assert self._row_limit > 0, "n_batch must be < max_seq"
        from ..parallel.engine import DSlot

        self.slots = [DSlot(g, b, self.Bg)
                      for g in range(self.G) for b in range(self.Bg)]
        self._SlotState = SlotState
        self.n_decode_calls = 0
        self.perf = {"n_prompt": 0, "n_decode": 0, "t_prompt_s": 0.0,
                     "t_decode_s": 0.0}

    # cache_pos convenience: (G, Bg) from the per-group KVCaches
    def _cache_pos(self) -> np.ndarray:
        return np.stack([kvc.cache_pos for kvc in self.core.kvc])

    @property
    def n_slots(self) -> int:
        return self.G * self.Bg

    class _CachePosView:
        """cache_pos facade indexed by GLOBAL slot id — the rollback
        handle the SpeculativeDecoder uses after partial acceptance
        (truncation is metadata-only on the ring: workers read cache_pos
        per meta, so lowering it here rolls every rank back)."""

        def __init__(self, eng: "TcpRingEngine"):
            self._e = eng

        def __getitem__(self, slot) -> int:
            g, b = divmod(int(slot), self._e.Bg)
            return int(self._e.core.kvc[g].cache_pos[b])

        def __setitem__(self, slot, value) -> None:
            g, b = divmod(int(slot), self._e.Bg)
            self._e.core.kvc[g].cache_pos[b] = int(value)

    class _KVView:
        """kv facade for the server's /slots endpoints + state save."""

        def __init__(self, eng: "TcpRingEngine"):
            self._e = eng

        def used(self, slot) -> int:
            g, b = divmod(int(slot), self._e.Bg)
            return int(self._e.core.kvc[g].cache_pos[b])

        def seq_rm(self, slot, p0: int = 0, p1: int = -1) -> None:
            # truncation is metadata-only: workers read cache_pos per meta
            g, b = divmod(int(slot), self._e.Bg)
            self._e.core.kvc[g].seq_rm(b, p0, p1)

        @property
        def cache_pos(self) -> "TcpRingEngine._CachePosView":
            return TcpRingEngine._CachePosView(self._e)

        @property
        def max_seq(self) -> int:
            return self._e.max_seq

    @property
    def kv(self):
        return TcpRingEngine._KVView(self)

    def find_idle_slot(self):
        for s in self.slots:
            if s.state == self._SlotState.IDLE:
                return s
        return None

    def submit(self, prompt_tokens: list[int], sampler=None, n_predict: int = -1,
               request_id: Any = None, reuse_prefix: bool = True,
               n_probs: int = 0):
        from ..sampling import Sampler, SamplerParams

        if not prompt_tokens:
            raise ValueError("empty prompt")
        if len(prompt_tokens) >= self._row_limit:
            raise ValueError(
                f"prompt ({len(prompt_tokens)}) exceeds the per-slot "
                f"context limit ({self._row_limit})")
        slot = self.find_idle_slot()
        if slot is None:
            raise RuntimeError("no idle slot")
        kvc = self.core.kvc[slot.m]
        common = 0
        if reuse_prefix and slot.prompt:
            limit = min(len(slot.prompt), len(prompt_tokens) - 1,
                        int(kvc.cache_pos[slot.b]))
            while common < limit and slot.prompt[common] == prompt_tokens[common]:
                common += 1
        kvc.seq_rm(slot.b, p0=common)
        slot.state = self._SlotState.PREFILL
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
            slot.state = self._SlotState.DECODE
        return slot

    # -- Self-Extend grouped attention (main.cpp:618-640, ring-replicated) ----

    def _apply_self_extend(self, slot) -> None:
        from ..runtime.engine import apply_self_extend

        kvc = self.core.kvc[slot.m]
        apply_self_extend(slot, int(kvc.cache_pos[slot.b]), self.max_seq,
                          self.grp_attn_n, self.grp_attn_w,
                          lambda d: self.core.kv_rope_shift(slot.m, slot.b, d))

    def _record_positions(self, slot, pos0: int, n: int) -> None:
        if self.grp_attn_n > 1:
            from ..runtime.engine import record_positions

            record_positions(slot, pos0, n, self.max_seq)

    def _rope_delta_row(self, g: int, pool) -> np.ndarray:
        d = np.zeros(self.Bg, np.int32)
        for s in pool:
            if s.m == g:
                d[s.b] = s.pos_delta
        return d

    def cancel(self, request_id: Any) -> bool:
        for s in self.slots:
            if s.request_id == request_id and s.state != self._SlotState.IDLE:
                s.state = self._SlotState.IDLE
                s.stop_reason = "cancelled"
                return True
        return False

    def _prefill_tick(self, only: list | None = None) -> bool:
        import time as _time

        from ..runtime.engine import _bucket

        SlotState = self._SlotState
        t0 = _time.perf_counter()
        pool = only if only is not None else self.slots
        prefill = [s for s in pool if s.state == SlotState.PREFILL]
        if not prefill:
            return False
        if self.grp_attn_n > 1:
            for s in prefill:
                self._apply_self_extend(s)
        chunk_len = min(self.n_batch,
                        max(len(s.prompt) - 1 - s.n_prompt_done
                            for s in prefill))
        s_len = _bucket(max(chunk_len, 1), self.n_batch)
        # padded bucket rows write K/V at positions past the real chunk —
        # cap the bucket at the cache tail over EVERY row of each active
        # group (parked rows included: their clamped dynamic_update_slice
        # write must not shift onto real cells)
        cap = self.max_seq - max(
            int(self.core.kvc[g].cache_pos.max())
            for g in sorted({s.m for s in prefill}))
        s_len = min(s_len, max(cap, 1))
        took = {}
        groups = []
        active_g = sorted({s.m for s in prefill})
        for g in active_g:
            kvc = self.core.kvc[g]
            tokens = np.zeros((self.Bg, s_len), np.int32)
            positions = (np.broadcast_to(
                np.arange(s_len, dtype=np.int32), (self.Bg, s_len))
                + kvc.cache_pos[:, None]).astype(np.int32)
            for s in prefill:
                if s.m != g:
                    continue
                chunk = s.prompt[s.n_prompt_done:
                                 min(s.n_prompt_done + s_len,
                                     len(s.prompt) - 1)]
                tokens[s.b, : len(chunk)] = chunk
                took[(s.m, s.b)] = len(chunk)
            groups.append((g, tokens, positions, kvc.cache_pos.copy(),
                           self._rope_delta_row(g, prefill)))
        self.core.ring_pass(groups)
        self.n_decode_calls += 1
        for s in prefill:
            n = took[(s.m, s.b)]
            self._record_positions(s, int(self.core.kvc[s.m].cache_pos[s.b]),
                                   n)
            self.core.kvc[s.m].cache_pos[s.b] += n
            s.n_prompt_done += n
            self.perf["n_prompt"] += n
            if s.n_prompt_done >= len(s.prompt) - 1:
                s.state = SlotState.DECODE
        self.perf["t_prompt_s"] += _time.perf_counter() - t0
        return True

    def step(self):
        import time as _time

        from ..runtime.engine import StepEvent

        SlotState = self._SlotState
        events = []
        self._prefill_tick()

        active = [s for s in self.slots if s.state == SlotState.DECODE]
        if not active:
            return events

        if self.ctx_shift:
            for s in active:
                kvc = self.core.kvc[s.m]
                used = int(kvc.cache_pos[s.b])
                if used >= self._row_limit - 1:
                    n_discard = max((used - self.n_keep) // 2, 1)
                    self.core.kv_context_shift(s.m, s.b, self.n_keep,
                                               n_discard, used)
                    s.shifts.append((self.n_keep, n_discard))

        if self.grp_attn_n > 1:
            for s in active:
                self._apply_self_extend(s)
                self._record_positions(
                    s, int(self.core.kvc[s.m].cache_pos[s.b]), 1)

        t0 = _time.perf_counter()
        groups = []
        active_g = sorted({s.m for s in active})
        for g in active_g:
            kvc = self.core.kvc[g]
            tokens = np.zeros((self.Bg, 1), np.int32)
            for s in active:
                if s.m == g:
                    tokens[s.b, 0] = (s.generated[-1] if s.generated
                                      else s.prompt[-1])
            positions = kvc.cache_pos[:, None].copy()
            groups.append((g, tokens, positions, kvc.cache_pos.copy(),
                           self._rope_delta_row(g, active)))
        hidden = self.core.ring_pass(groups)
        self.n_decode_calls += 1
        logits = {g: np.asarray(self.core.head(h), np.float32)
                  for g, h in hidden.items()}
        for s in active:
            self.core.kvc[s.m].cache_pos[s.b] += 1
        self.perf["t_decode_s"] += _time.perf_counter() - t0
        self.perf["n_decode"] += len(active)

        for s in active:
            row = logits[s.m][s.b, -1]
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

    def _check_stop(self, slot, tok: int):
        if tok in self.eog_ids:
            return True, "eog"
        if slot.n_predict >= 0 and len(slot.generated) >= slot.n_predict:
            return True, "length"
        if not self.ctx_shift and \
                int(self.core.kvc[slot.m].cache_pos[slot.b]) >= \
                self._row_limit:
            return True, "context_full"
        return False, None

    # -- speculative-decoding protocol ----------------------------------------

    def prefill_only(self, slot) -> None:
        while slot.state == self._SlotState.PREFILL:
            self._prefill_tick(only=[slot])

    def verify_chain(self, slot_id: int, chain: list[int]) -> np.ndarray:
        s_len = len(chain)
        g, b = divmod(int(slot_id), self.Bg)
        kvc = self.core.kvc[g]
        pos0 = int(kvc.cache_pos[b])
        # parked rows in the shared ubatch write padding at their own
        # cache_pos: every row's [pos, pos+s_len) must stay inside the
        # cache or the clamped write corrupts real cells
        assert pos0 + s_len <= self.max_seq and (
            self.Bg == 1 or s_len <= self.n_batch), \
            f"verify chain of {s_len} does not fit at {pos0}"
        tokens = np.zeros((self.Bg, s_len), np.int32)
        tokens[b] = chain
        positions = (np.broadcast_to(np.arange(s_len, dtype=np.int32),
                                     (self.Bg, s_len))
                     + kvc.cache_pos[:, None]).astype(np.int32)
        hidden = self.core.ring_pass(
            [(g, tokens, positions, kvc.cache_pos.copy())])[g]
        self.n_decode_calls += 1
        logits = np.asarray(self.core.head(hidden), np.float32)
        kvc.cache_pos[b] = pos0 + s_len
        return logits[b]

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
        while slot.state != self._SlotState.IDLE:
            self.step()
        return list(slot.generated)

    def stop(self) -> None:
        self.ctx.node.send_stop()
