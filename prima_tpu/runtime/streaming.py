"""Weight streaming: run models LARGER than device memory.

prima.cpp's signature capability (mmap + posix_madvise prefetch/release,
manage_graph_tensors src/llama.cpp:18152, "memory pressure <10%") translated
to TPU terms: layer weights live in host RAM as kernel-packed numpy arrays;
per decode step, layer windows are transferred host->HBM into two ping-pong
device buffers — the NEXT window's transfer is enqueued before the CURRENT
window's compute, so the copy overlaps compute exactly like the reference's
prefetch thread overlaps the other devices' work.

The scheduler decides how many layers stay HBM-resident (n[m]) vs streamed
(w[m] - n[m]) — see sched/milp.py; this module executes that decision on
one chip.
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
from ..quant.dequant_jax import QTensor, host_pack
from ..quant.device_format import UQTensor


def pack_host_layer(layer: dict, pallas: bool = True) -> dict:
    """UQTensor/np layer dict -> host numpy arrays + meta, kernel-packed and
    ready for zero-reformat device_put (the 'mmap'd weights')."""
    out = {}
    for name, t in layer.items():
        if isinstance(t, UQTensor):
            qs, scales, mins, d, dmin, kperm, packed = host_pack(t, pallas)
            out[name] = {
                "qs": qs, "scales": scales, "mins": mins,
                "d": d, "dmin": dmin,
                "meta": (t.sub, t.layout, t.q_offset, t.shape, kperm, t.gsub,
                         packed),
            }
        else:
            out[name] = {"dense": np.asarray(t, dtype=np.float32)}
    return out


def _to_device(packed: dict, device=None) -> dict:
    layer = {}
    for name, rec in packed.items():
        if "dense" in rec:
            layer[name] = jax.device_put(rec["dense"], device)
        else:
            sub, layout, q_offset, shape, kperm, gsub, packed = rec["meta"]
            put = lambda a: jax.device_put(a, device) if a is not None else None
            layer[name] = QTensor(
                qs=put(rec["qs"]),
                scales=put(rec["scales"]),
                mins=put(rec["mins"]),
                sub=sub, layout=layout, q_offset=q_offset, shape=shape,
                kperm=kperm, d=put(rec["d"]), dmin=put(rec["dmin"]), gsub=gsub,
                packed=packed,
            )
    return layer


@dataclass
class StreamedModel:
    cfg: ModelConfig
    head: dict  # tok_embd / output_norm / output — always resident
    resident: list  # first n layers, device QTensors (index = layer id)
    streamed_host: list  # packed host layers for ids >= n_resident
    n_resident: int


def build_streamed_model(get_layer, head_host: dict, cfg: ModelConfig,
                         n_resident: int, pallas: bool = True) -> StreamedModel:
    """get_layer(i) -> host layer dict (UQTensor/np). The first n_resident
    layers are uploaded now; the rest stay in host RAM."""
    from ..parallel.pipeline import build_pipe_model  # noqa: F401 (doc link)

    resident = []
    streamed = []
    for i in range(cfg.n_layers):
        host = get_layer(i)
        packed = pack_host_layer(host, pallas)
        if i < n_resident:
            resident.append(_to_device(packed))
        else:
            streamed.append(packed)

    def put_head(t):
        if t is None:
            return None
        if isinstance(t, UQTensor):
            return QTensor.from_host(t, pallas=pallas)
        return jax.device_put(np.asarray(t, dtype=np.float32))

    head = {k: put_head(v) for k, v in head_host.items()}
    return StreamedModel(cfg, head, resident, streamed, n_resident)


class StreamedRunner:
    """Single-chip decode with double-buffered window streaming."""

    def __init__(self, model: StreamedModel, batch: int, max_seq: int,
                 opts: ForwardOptions | None = None, kv_dtype=jnp.bfloat16):
        from ..models.llama import init_kv_caches

        self.m = model
        self.opts = opts or ForwardOptions()
        self.kv = init_kv_caches(model.cfg, batch, max_seq, kv_dtype)
        self.cache_pos = np.zeros(batch, np.int32)
        cfg, opts_ = model.cfg, self.opts

        @jax.jit
        def _embed_fn(head, tokens):
            return embed(head["tok_embd"], tokens, opts_.dtype)

        @jax.jit
        def _layer_fn(layer, x, positions, kv, cache_pos, mask, inv_freq_mscale):
            inv_freq, mscale = inv_freq_mscale
            return decode_layer(layer, cfg, x, positions, kv, cache_pos, mask,
                                inv_freq, mscale, opts_)

        @jax.jit
        def _head_fn(head, x):
            x = rms_norm(x, head["output_norm"], cfg.rms_eps)
            w = head["output"] if head.get("output") is not None else head["tok_embd"]
            return linear(x, w, opts_.matmul_impl).astype(opts_.logits_dtype)

        self._embed_fn = _embed_fn
        self._layer_fn = _layer_fn
        self._head_fn = _head_fn
        self._rope = rope_freqs(cfg)

    def forward(self, tokens: np.ndarray, positions: np.ndarray) -> np.ndarray:
        """tokens/positions: (B, S). Returns logits (B, S, vocab); updates KV."""
        m = self.m
        x = self._embed_fn(m.head, jnp.asarray(tokens))
        T = self.kv[0][0].shape[1] if not hasattr(self.kv[0][0], "qs") else self.kv[0][0].qs.shape[1]
        mask = causal_mask(jnp.asarray(positions), T)
        cache_pos = jnp.asarray(self.cache_pos)
        pos_j = jnp.asarray(positions)

        # resident prefix
        for i in range(m.n_resident):
            x, self.kv[i] = self._layer_fn(m.resident[i], x, pos_j, self.kv[i],
                                           cache_pos, mask, self._rope)

        # streamed tail: double-buffered host->HBM prefetch
        n_stream = len(m.streamed_host)
        if n_stream:
            bufs = [None, None]
            bufs[0] = _to_device(m.streamed_host[0])  # async enqueue
            for j in range(n_stream):
                if j + 1 < n_stream:  # prefetch next while computing current
                    bufs[(j + 1) % 2] = _to_device(m.streamed_host[j + 1])
                li = m.n_resident + j
                x, self.kv[li] = self._layer_fn(bufs[j % 2], x, pos_j, self.kv[li],
                                                cache_pos, mask, self._rope)
        logits = self._head_fn(m.head, x)
        self.cache_pos += tokens.shape[1]
        return np.asarray(logits, dtype=np.float32)

    def greedy_generate(self, prompt: list[int], n_new: int) -> list[int]:
        B = self.cache_pos.shape[0]
        assert B == 1
        out = []
        if len(prompt) > 1:
            pos = np.arange(len(prompt) - 1, dtype=np.int32)[None]
            self.forward(np.asarray([prompt[:-1]], np.int32), pos)
        cur = prompt[-1]
        for _ in range(n_new):
            p = self.cache_pos[0]
            logits = self.forward(np.asarray([[cur]], np.int32),
                                  np.asarray([[p]], np.int32))
            cur = int(np.argmax(logits[0, -1]))
            out.append(cur)
        return out
