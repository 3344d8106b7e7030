"""TCP ring data plane: multi-process distributed inference.

The faithful analogue of the reference's decode-loop wire protocol
(llama_send_meta/llama_recv_meta src/llama.cpp:17870/17920,
llama_send_tensors/llama_recv_tensors @18031/18054, worker service loop
main.cpp:664-681): per ubatch the master broadcasts metadata, the
activation hops rank to rank around the ring k times (piped-ring), and the
last window's output returns straight to rank 0 (the master-socket
shortcut) for the output head.

On a real TPU pod the SPMD pipeline (parallel/pipeline.py) replaces this
with ICI/DCN collectives; this plane exists for heterogeneous hosts that
only share a network — exactly prima.cpp's home-cluster regime — and for
multi-process testing (the Docker-sim analogue).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from ..models.config import ModelConfig
from ..models.llama import ForwardOptions
from .bootstrap import RingConfig, RingNode, _recv_exact, _recv_msg, _send_msg
from .ring_host import RingPlan

_THDR = struct.Struct("<III")  # ndim, dtype code, nbytes
_DTYPES = {0: np.float32, 1: np.int32, 2: np.uint8}
_DTYPE_CODES = {np.dtype(np.float32): 0, np.dtype(np.int32): 1, np.dtype(np.uint8): 2}


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


@dataclass
class RingContext:
    node: RingNode
    plan: RingPlan
    rank: int
    world: int

    @property
    def is_master(self) -> bool:
        return self.rank == 0


class TcpRingWorker:
    """Worker ranks: the llama_decode(empty batch) service loop."""

    def __init__(self, ctx: RingContext, cfg: ModelConfig, params: dict,
                 max_seq: int = 2048, opts: ForwardOptions | None = None,
                 kv_dtype=None):
        import functools

        import jax
        import jax.numpy as jnp

        from ..models.llama import forward, init_kv_caches

        self.ctx = ctx
        self.cfg = cfg
        self.params = params
        self.opts = opts or ForwardOptions()
        kv_dtype = kv_dtype if kv_dtype is not None else jnp.bfloat16
        ranges = ctx.plan.layer_ranges()[ctx.rank]
        self.ranges = ranges
        owned = set()
        for lo, hi in ranges:
            owned.update(range(lo, hi))
        self.kv = init_kv_caches(cfg, 1, max_seq, kv_dtype,
                                 layer_filter=lambda i: i in owned)
        cfg_, opts_ = cfg, self.opts

        @functools.partial(jax.jit, static_argnames=("lo", "hi"))
        def window_fn(params, kv, x, positions, cache_pos, lo, hi):
            return forward(params, cfg_, None, positions, kv, cache_pos, opts_,
                           layer_range=(lo, hi), hidden_in=x, return_hidden=True)

        self._window_fn = window_fn

    def _compute_window(self, c: int, x: np.ndarray, positions: np.ndarray,
                        cache_pos: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        lo, hi = self.ranges[c]
        xj = jnp.asarray(x, dtype=self.opts.dtype)
        out, self.kv = self._window_fn(self.params, self.kv, xj,
                                       jnp.asarray(positions), jnp.asarray(cache_pos),
                                       lo=lo, hi=hi)
        return np.asarray(out, dtype=np.float32)

    def serve(self) -> None:
        """Blocks until STOP (the reference's infinite llama_decode loop)."""
        node = self.ctx.node
        while True:
            msg = node.recv_prev(timeout=None)
            tag = msg.get("tag")
            if tag == "stop":
                if (node.rank + 1) % node.world != msg.get("from", 0):
                    node.send_next(msg)
                return
            assert tag == "meta", tag
            if (node.rank + 1) % node.world != 0:
                node.send_next(msg)  # forward metadata around the ring
            positions = np.asarray(msg["positions"], np.int32)
            cache_pos = np.asarray(msg["cache_pos"], np.int32)
            for c in range(self.ctx.plan.k):
                hdr = node.recv_prev(timeout=None)
                assert hdr["tag"] == "act" and hdr["cycle"] == c
                x = recv_tensor(node.recv_sock)
                x = self._compute_window(c, x, positions, cache_pos)
                last = (self.ctx.rank == self.ctx.world - 1
                        and c == self.ctx.plan.k - 1)
                # ring hop — the master shortcut IS the ring hop for the
                # final window (next of rank n-1 is rank 0)
                node.send_next({"tag": "act", "cycle": c, "final": last})
                send_tensor(node.send_sock, x)


def relay_loop(node: RingNode) -> None:
    """Forwarder role (common/common.cpp:1832-1873): a device the scheduler
    removed keeps relaying ring traffic so the ring is never re-wired."""
    next_is_master = (node.rank + 1) % node.world == 0
    while True:
        msg = node.recv_prev(timeout=None)
        if msg.get("tag") == "meta" and next_is_master:
            # the master never consumes meta (it originated it); forwarding
            # it would desync TcpRingMaster's recv_prev stream
            continue
        node.send_next(msg)
        if msg.get("tag") == "act":
            send_tensor(node.send_sock, recv_tensor(node.recv_sock))
        elif msg.get("tag") == "stop":
            return


class TcpRingMaster:
    """Rank 0: embedding + first windows + output head + sampling."""

    def __init__(self, ctx: RingContext, cfg: ModelConfig, params: dict,
                 max_seq: int = 2048, opts: ForwardOptions | None = None,
                 kv_dtype=None):
        import functools

        import jax
        import jax.numpy as jnp

        from ..models.llama import embed, forward, init_kv_caches, linear
        from ..ops.layers import rms_norm

        self.ctx = ctx
        self.cfg = cfg
        self.params = params
        self.opts = opts or ForwardOptions()
        kv_dtype = kv_dtype if kv_dtype is not None else jnp.bfloat16
        self.max_seq = max_seq
        ranges = ctx.plan.layer_ranges()[0]
        self.ranges = ranges
        owned = set()
        for lo, hi in ranges:
            owned.update(range(lo, hi))
        self.kv = init_kv_caches(cfg, 1, max_seq, kv_dtype,
                                 layer_filter=lambda i: i in owned)
        self.cache_pos = np.zeros(1, np.int32)
        cfg_, opts_ = cfg, self.opts

        @functools.partial(jax.jit, static_argnames=("lo", "hi"))
        def first_window(params, kv, tokens, positions, cache_pos, lo, hi):
            return forward(params, cfg_, tokens, positions, kv, cache_pos, opts_,
                           layer_range=(lo, hi), return_hidden=True)

        @functools.partial(jax.jit, static_argnames=("lo", "hi"))
        def mid_window(params, kv, x, positions, cache_pos, lo, hi):
            return forward(params, cfg_, None, positions, kv, cache_pos, opts_,
                           layer_range=(lo, hi), hidden_in=x, return_hidden=True)

        @jax.jit
        def head_fn(params, x):
            x = rms_norm(x, params["output_norm"], cfg_.rms_eps)
            w = params["output"] if params.get("output") is not None else params["tok_embd"]
            return linear(x, w, opts_.matmul_impl).astype(opts_.logits_dtype)

        self._first = first_window
        self._mid = mid_window
        self._head = head_fn

    def decode(self, tokens: np.ndarray, positions: np.ndarray) -> np.ndarray:
        """One distributed ubatch; returns last-position logits (1, vocab)."""
        import jax.numpy as jnp

        node = self.ctx.node
        k = self.ctx.plan.k
        node.send_next({
            "tag": "meta",
            "positions": positions.tolist(),
            "cache_pos": self.cache_pos.tolist(),
        })
        x = None
        for c in range(k):
            lo, hi = self.ranges[c]
            if c == 0:
                x, self.kv = self._first(self.params, self.kv, jnp.asarray(tokens),
                                         jnp.asarray(positions),
                                         jnp.asarray(self.cache_pos), lo=lo, hi=hi)
            else:
                x, self.kv = self._mid(self.params, self.kv, jnp.asarray(x, self.opts.dtype),
                                       jnp.asarray(positions),
                                       jnp.asarray(self.cache_pos), lo=lo, hi=hi)
            node.send_next({"tag": "act", "cycle": c})
            send_tensor(node.send_sock, np.asarray(x, dtype=np.float32))
            hdr = node.recv_prev(timeout=None)
            assert hdr["tag"] == "act"
            x = recv_tensor(node.recv_sock)
        logits = self._head(self.params, jnp.asarray(x, self.opts.dtype))
        self.cache_pos = self.cache_pos + tokens.shape[1]
        return np.asarray(logits[:, -1], dtype=np.float32)

    def stop(self) -> None:
        self.ctx.node.send_stop()
