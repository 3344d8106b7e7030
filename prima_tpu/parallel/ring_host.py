"""Host-orchestrated ring executor: HETEROGENEOUS layer windows.

The SPMD pipeline (parallel/pipeline.py) is the fast path for homogeneous
meshes, but it runs in lockstep — every stage costs max(w) layers. The
reference's ring is asynchronous: each device computes ITS window size and
hands off (llama_decode_internal's recv->compute->send loop). This executor
reproduces that model on a multi-device host: per-device jitted window
programs with per-device parameter/KV placement, activations handed device
to device with device_put, and the whole k-cycle ring ENQUEUED eagerly —
JAX's async dispatch turns the data-dependency chain into exactly the
reference's pipelining (device d computes microbatch m while device d+1
computes m-1), with no host barrier until the logits are read.

This is the executor the MILP scheduler's heterogeneous w[m] feeds
(sched/milp.py -> RingPlan); windows may differ per device and k > 1 cycles
interleave exactly like piped-ring parallelism.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.llama import ForwardOptions, decode_layer, embed, linear
from ..ops.layers import causal_mask, rms_norm, rope_freqs
from ..quant.device_format import UQTensor
from ..quant.dequant_jax import QTensor


@dataclass
class RingPlan:
    """Per-device layer windows (the scheduler's w[m] with k cycles)."""

    windows: list[int]  # w[m] per device
    k: int

    @property
    def n_devices(self) -> int:
        return len(self.windows)

    @property
    def W(self) -> int:
        return sum(self.windows)

    @property
    def n_layers(self) -> int:
        return self.W * self.k

    def layer_ranges(self) -> list[list[tuple[int, int]]]:
        """[device][cycle] -> (lo, hi) — ring-cyclic ownership, matching
        this_layer_is_mine (src/llama.cpp:3838)."""
        out = [[None] * self.k for _ in range(self.n_devices)]
        lo = 0
        for c in range(self.k):
            for d in range(self.n_devices):
                out[d][c] = (lo, lo + self.windows[d])
                lo += self.windows[d]
        return out


def _put_layer(layer_host: dict, device) -> dict:
    out = {}
    for name, t in layer_host.items():
        if t is None:  # tied-embedding heads pass output=None
            out[name] = None
        elif isinstance(t, UQTensor):
            out[name] = QTensor.from_host(t, device=device)
        else:
            out[name] = jax.device_put(np.asarray(t, dtype=np.float32), device)
    return out


class HostRingExecutor:
    def __init__(self, cfg: ModelConfig, plan: RingPlan, get_layer, head_host: dict,
                 devices=None, batch: int = 1, max_seq: int = 256,
                 opts: ForwardOptions | None = None, kv_dtype=jnp.bfloat16):
        assert plan.n_layers == cfg.n_layers, (plan.n_layers, cfg.n_layers)
        self.cfg = cfg
        self.plan = plan
        self.opts = opts or ForwardOptions()
        devices = devices if devices is not None else jax.devices()
        assert len(devices) >= plan.n_devices
        self.devices = devices[: plan.n_devices]
        self.max_seq = max_seq

        # rank-filtered loading: device d holds only its own windows
        ranges = plan.layer_ranges()
        self.layers: list[list[list[dict]]] = []  # [d][c][w] device layer dicts
        self.kv: list[list[list[tuple]]] = []  # matching KV per layer
        for d, dev in enumerate(self.devices):
            per_cycle = []
            kv_cycle = []
            for c in range(plan.k):
                lo, hi = ranges[d][c]
                per_cycle.append([_put_layer(get_layer(i), dev) for i in range(lo, hi)])
                shape = (batch, max_seq, cfg.n_kv_heads, cfg.head_dim)
                kv_cycle.append([
                    (jnp.zeros(shape, kv_dtype, device=dev),
                     jnp.zeros(shape, kv_dtype, device=dev))
                    for _ in range(lo, hi)
                ])
            self.layers.append(per_cycle)
            self.kv.append(kv_cycle)

        # head tensors on the master (reference keeps them on rank 0)
        self.head = _put_layer(head_host, self.devices[0])
        self.cache_pos = np.zeros(batch, np.int32)

        cfg_, opts_ = cfg, self.opts

        @functools.partial(jax.jit, static_argnames=("n_layers", "t"))
        def window_fn(layers, kv, x, positions, cache_pos, n_layers, t):
            inv_freq, mscale = rope_freqs(cfg_)
            mask = causal_mask(positions, t)
            new_kv = list(kv)
            for w in range(n_layers):
                x, new_kv[w] = decode_layer(layers[w], cfg_, x, positions, kv[w],
                                            cache_pos, mask, inv_freq, mscale, opts_)
            return x, new_kv

        @jax.jit
        def embed_fn(head, tokens):
            return embed(head["tok_embd"], tokens, opts_.dtype)

        @jax.jit
        def head_fn(head, x):
            x = rms_norm(x, head["output_norm"], cfg_.rms_eps)
            w = head["output"] if head.get("output") is not None else head["tok_embd"]
            return linear(x, w, opts_.matmul_impl).astype(opts_.logits_dtype)

        self._window_fn = window_fn
        self._embed_fn = embed_fn
        self._head_fn = head_fn

    def forward(self, tokens: np.ndarray, positions: np.ndarray) -> jax.Array:
        """One ring traversal (k cycles); returns logits, updates KV.
        Everything is enqueued asynchronously — reading the result drains
        the ring."""
        x = self._embed_fn(self.head, jax.device_put(np.asarray(tokens), self.devices[0]))
        pos_j = positions
        cp = self.cache_pos
        for c in range(self.plan.k):
            for d, dev in enumerate(self.devices):
                if not self.layers[d][c]:
                    continue
                x = jax.device_put(x, dev)  # the ring hop (ICI/DCN transfer)
                x, self.kv[d][c] = self._window_fn(
                    self.layers[d][c], self.kv[d][c], x,
                    jax.device_put(np.asarray(pos_j), dev),
                    jax.device_put(np.asarray(cp), dev),
                    n_layers=len(self.layers[d][c]), t=self.max_seq,
                )
        # master shortcut: final activation returns to rank 0 for the head
        x = jax.device_put(x, self.devices[0])
        logits = self._head_fn(self.head, x)
        self.cache_pos = self.cache_pos + tokens.shape[1]
        return logits

    def greedy_generate(self, prompt: list[int], n_new: int) -> list[int]:
        assert self.cache_pos.shape[0] == 1
        if len(prompt) > 1:
            pos = np.arange(len(prompt) - 1, dtype=np.int32)[None]
            self.forward(np.asarray([prompt[:-1]], np.int32), pos)
        cur = prompt[-1]
        out = []
        for _ in range(n_new):
            p = int(self.cache_pos[0])
            logits = self.forward(np.asarray([[cur]], np.int32),
                                  np.asarray([[p]], np.int32))
            cur = int(np.argmax(np.asarray(logits[0, -1])))
            out.append(cur)
        return out
