"""Piped-ring pipeline executor over a TPU mesh.

The TPU-native replacement for the reference's ZMQ-ring distributed decode
loop (llama_decode_internal src/llama.cpp:18229-18704). The mapping:

  reference                         this module
  ---------                         -----------
  ring of devices over TCP          `pp` mesh axis, hops via lax.ppermute (ICI)
  per-window subgraphs              per-window layer stacks, scanned in SPMD
  k ring cycles per token           k cycles: device d owns windows c*n+d
  (this_layer_is_mine @3838)        for c in [0,k) — same ring-cyclic order
  intra-device CPU/GPU split        Megatron tensor parallelism over `tp`
  server-slot batching              `dp` mesh axis + microbatches M ≤ n_pp
  master shortcut to rank 0         final psum gather of the last window
  rank-filtered KV cache init       KV lives per (window, layer) shard, heads
  (@3920-3975)                      sharded over `tp`, batch over `dp`

Schedule: microbatch m enters stage 0 at step m; one window + one ring hop
per step; window (c*n + d) runs on device d at step m + c*n + d. Total steps
V + M - 1 with V = n*k windows — every stage is busy in steady state when
M = n_pp. Everything is a single lax.scan inside one shard_map: XLA overlaps
the ppermute with the next window's compute (the analogue of the reference's
prefetch-overlap, manage_graph_tensors @18152).
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelConfig
from ..models.llama import ForwardOptions, decode_layer, embed, linear
from ..ops.layers import causal_mask, rms_norm, rope_freqs
from .sharding import put_stacked_dense, put_stacked_qtensor, put_replicated
from .tp import REPLICATED_DENSE, shard_layer_uq, tp_local_config


@dataclass(frozen=True)
class PipeSpec:
    """Static layout of the piped-ring pipeline."""

    n_pp: int  # pipeline stages (ring length)
    n_tp: int  # tensor-parallel ranks per stage
    n_dp: int  # data-parallel replicas
    k_cycles: int  # ring cycles per token (the reference's k, common.cpp:1133)
    window: int  # layers per window (w)
    microbatches: int  # in-flight microbatches M (≤ n_pp)
    n_sp: int = 1  # sequence-parallel shards of the KV context axis

    @property
    def n_layers(self) -> int:
        return self.n_pp * self.k_cycles * self.window

    @property
    def n_steps(self) -> int:
        return self.n_pp * self.k_cycles + self.microbatches - 1

    def window_layers(self, stage: int, cycle: int) -> range:
        v = cycle * self.n_pp + stage
        return range(v * self.window, (v + 1) * self.window)

    @staticmethod
    def for_model(cfg: ModelConfig, n_pp: int, n_tp: int = 1, n_dp: int = 1,
                  k_cycles: int | None = None,
                  microbatches: int | None = None,
                  n_sp: int = 1) -> "PipeSpec":
        L = cfg.n_layers
        if k_cycles is None:
            k_cycles = 1
        if L % (n_pp * k_cycles):
            raise ValueError(f"L={L} not divisible by n_pp*k={n_pp * k_cycles}")
        m = microbatches if microbatches is not None else n_pp
        if m > n_pp:
            raise ValueError(f"microbatches {m} > n_pp {n_pp}")
        return PipeSpec(n_pp, n_tp, n_dp, k_cycles, L // (n_pp * k_cycles),
                        m, n_sp)


# ---------------------------------------------------------------------------
# Parameter layout: leaves stacked (PP, TP, K, W, *dims), sharded P(pp, tp)
# ---------------------------------------------------------------------------


def build_pipeline_params(
    get_layer: Callable[[int], dict],
    cfg: ModelConfig,
    spec: PipeSpec,
    mesh: Mesh,
    pallas: bool = True,
) -> dict:
    """Stack per-layer host tensors into the pipeline layout.

    get_layer(i) returns the host dict for layer i (UQTensor / np arrays),
    the analogue of per-rank tensor loading: each (pp, tp) shard only ever
    materializes on its own device.
    """
    # nested[pp][tp][cycle][w] = shard dict
    nested: list[list[list[list[dict]]]] = [
        [[[None for _ in range(spec.window)] for _ in range(spec.k_cycles)]
         for _ in range(spec.n_tp)]
        for _ in range(spec.n_pp)
    ]
    names: set[str] = set()
    for d in range(spec.n_pp):
        for c in range(spec.k_cycles):
            for wi, li in enumerate(spec.window_layers(d, c)):
                shards = shard_layer_uq(get_layer(li), spec.n_tp)
                names.update(shards[0].keys())
                for t in range(spec.n_tp):
                    nested[d][t][c][wi] = shards[t]

    out: dict[str, Any] = {}
    for name in sorted(names):
        tree = [
            [[[nested[d][t][c][w][name] for w in range(spec.window)]
              for c in range(spec.k_cycles)]
             for t in range(spec.n_tp)]
            for d in range(spec.n_pp)
        ]
        first = tree[0][0][0][0]
        axes = ("pp", "tp", None, None)
        if hasattr(first, "ggml_type"):  # UQTensor
            out[name] = put_stacked_qtensor(tree, mesh, axes, pallas=pallas)
        else:
            dtype = np.float32
            out[name] = put_stacked_dense(tree, mesh, axes, dtype=dtype)
    return out


def _head_axes(mesh: Mesh) -> tuple[str, ...]:
    """Mesh axes the vocab-row-sharded output head spans — every standard
    axis THIS mesh actually has. Meshes built without an `sp` (or `dp`)
    axis — e.g. the raw two-process multihost mesh — must not see that
    name in a PartitionSpec (jax raises 'Resource axis not found')."""
    return tuple(a for a in ("dp", "pp", "sp", "tp") if a in mesh.axis_names)


def build_pipe_model(
    get_layer: Callable[[int], dict],
    head_host: dict,
    cfg: ModelConfig,
    spec: PipeSpec,
    mesh: Mesh,
    pallas: bool = True,
    shard_head: bool = True,
) -> dict:
    """Full distributed params: stacked layers + head tensors.

    head_host: {'tok_embd': UQTensor|np, 'output_norm': np, 'output':
    UQTensor|np|None}. The embedding stays replicated (token gather is
    cheap); the OUTPUT head is vocab-row-sharded across the whole mesh when
    divisible (the reference keeps the head on rank 0 — here every device
    computes its vocab slice and the logits gather at the jit boundary,
    splitting the ~n_vocab*n_embd head read n_devices ways)."""
    from ..quant.dequant_jax import QTensor
    from .sharding import shard_uq_rows

    def put_head(t):
        if t is None:
            return None
        if hasattr(t, "ggml_type"):
            return QTensor.from_host(t, sharding=NamedSharding(mesh, P()), pallas=pallas)
        return put_replicated(np.asarray(t), mesh)

    out = head_host.get("output")
    output_sharded = None
    n_dev = mesh.devices.size
    if (shard_head and out is not None and hasattr(out, "ggml_type")
            and n_dev > 1 and out.shape[0] % (n_dev * 8) == 0):
        shards = shard_uq_rows(out, n_dev)
        output_sharded = put_stacked_qtensor(
            [shards], mesh, (None, _head_axes(mesh)), pallas=pallas)
        out = None

    return {
        "pipe": build_pipeline_params(get_layer, cfg, spec, mesh, pallas=pallas),
        "tok_embd": put_head(head_host["tok_embd"]),
        "output_norm": put_head(head_host["output_norm"]),
        "output": put_head(out),
        "output_sharded": output_sharded,
    }


def init_pipe_kv(cfg: ModelConfig, spec: PipeSpec, mesh: Mesh, batch_per_micro: int,
                 max_seq: int, dtype=jnp.bfloat16,
                 seq_shards: int | None = None) -> tuple:
    """KV caches (PP, K, W, M*B, T, KVH, HD): layer dims sharded over pp,
    batch over dp, heads over tp — rank-filtered KV init, the TPU way.
    dtype "q8_0"/"q4_0" stores quantized KVQ8/KVQ4 pytrees (int8 / packed
    int4 quants + f32 per-(cell, head) scales, ops/kvquant.py) — the
    distributed analogue of the reference's -ctk/-ctv cache types."""
    n_sp = spec.n_sp if seq_shards is None else seq_shards
    if n_sp != spec.n_sp:
        raise ValueError(f"seq_shards={n_sp} != spec.n_sp={spec.n_sp}")
    if max_seq % n_sp:
        raise ValueError(f"max_seq={max_seq} not divisible by "
                         f"seq shards n_sp={n_sp}")
    shape = (
        spec.n_pp, spec.k_cycles, spec.window,
        spec.microbatches * batch_per_micro, max_seq, cfg.n_kv_heads, cfg.head_dim,
    )
    # T sharded over "sp": each device holds max_seq/n_sp cells — the
    # per-device KV memory shrinks linearly with seq shards
    sh = NamedSharding(mesh, P("pp", None, None, "dp",
                               "sp" if spec.n_sp > 1 else None, "tp", None))
    if isinstance(dtype, str) and dtype in ("q8_0", "q4_0"):
        from ..ops.kvquant import KVQ4, KVQ8

        cls = KVQ8 if dtype == "q8_0" else KVQ4
        z = jax.tree.map(lambda a: jax.device_put(a, sh), cls.zeros(shape))
        return z, jax.tree.map(lambda a: jax.device_put(a, sh), cls.zeros(shape))
    z = jnp.zeros(shape, dtype, device=sh)
    return z, jnp.zeros(shape, dtype, device=sh)


# ---------------------------------------------------------------------------
# The SPMD schedule
# ---------------------------------------------------------------------------


def _pipe_body(
    layers: dict,  # local view: leaves (1, 1, K, W, ...)
    x_all: jax.Array,  # (M, B_loc, S, E) embedded inputs
    positions: jax.Array,  # (M, B_loc, S) rope positions (Self-Extend:
    #                        compressed logical positions)
    mask_positions: jax.Array,  # (M, B_loc, S) physical cell positions the
    #                             causal mask keys off (== positions unless
    #                             Self-Extend compressed the rope space)
    cache_pos: jax.Array,  # (M, B_loc)
    k_cache: jax.Array,  # (1, K, W, M*B_loc, T, kvh_loc, hd)
    v_cache: jax.Array,
    *,
    cfg_local: ModelConfig,
    spec: PipeSpec,
    opts: ForwardOptions,
):
    n, kc, W, M = spec.n_pp, spec.k_cycles, spec.window, spec.microbatches
    d = jax.lax.axis_index("pp")
    local = jax.tree.map(lambda a: a[0, 0], layers)  # (K, W, ...)
    # caches may be dense arrays OR KVQ8/KVQ4 pytrees (quants + scales);
    # every cache op below is tree-mapped so both layouts ride the ring
    k_cache = jax.tree.map(lambda a: a[0], k_cache)  # (K, W, MB, T, kvh, hd)
    v_cache = jax.tree.map(lambda a: a[0], v_cache)
    B = x_all.shape[1]
    T = k_cache.shape[3]
    inv_freq, mscale = rope_freqs(cfg_local)
    perm = [(i, (i + 1) % n) for i in range(n)]

    out_shape = x_all.shape  # (M, B, S, E)

    def step(carry, t):
        x_cur, kcache, vcache, out_buf = carry
        # schedule: which (microbatch, cycle) is on this device at step t
        j = t - d
        m = jnp.mod(j, n)
        c = (j - m) // n
        valid = (c >= 0) & (c < kc) & (m < M)
        m_idx = jnp.clip(m, 0, M - 1)
        c_idx = jnp.clip(c, 0, kc - 1)

        # stage 0 injects microbatch t while t < M (rank-0 embedding role)
        inject = (d == 0) & (t < M)
        x_inj = jax.lax.dynamic_index_in_dim(x_all, jnp.minimum(t, M - 1), 0, keepdims=False)
        x = jnp.where(inject, x_inj, x_cur)

        pos_m = jax.lax.dynamic_index_in_dim(positions, m_idx, 0, keepdims=False)
        mpos_m = jax.lax.dynamic_index_in_dim(mask_positions, m_idx, 0,
                                              keepdims=False)
        cp_m = jax.lax.dynamic_index_in_dim(cache_pos, m_idx, 0, keepdims=False)
        mask = causal_mask(mpos_m, T)

        # select this cycle's window params: (K, W, ...) -> (W, ...)
        win = jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, c_idx, 0, keepdims=False), local
        )
        row0 = m_idx * B

        def kv_slice(cache):
            return jax.tree.map(
                lambda a: jax.lax.dynamic_slice(
                    a, (c_idx, w, row0) + (0,) * (a.ndim - 3),
                    (1, 1, B) + a.shape[3:])[0, 0], cache)

        for w in range(W):
            layer = jax.tree.map(lambda a: a[w], win)
            kv_k = kv_slice(kcache)
            kv_v = kv_slice(vcache)
            x, (kv_k, kv_v) = decode_layer(
                layer, cfg_local, x, pos_m, (kv_k, kv_v), cp_m, mask, inv_freq, mscale, opts
            )
            vf = valid
            kcache = _masked_update(kcache, kv_k, (c_idx, w, row0), vf)
            vcache = _masked_update(vcache, kv_v, (c_idx, w, row0), vf)

        # last window of the ring: stash the finished microbatch (the
        # analogue of the master-socket shortcut, src/llama.cpp:18559)
        done = valid & (d == n - 1) & (c == kc - 1)
        upd = jax.lax.dynamic_update_slice(
            out_buf, x[None].astype(out_buf.dtype), (m_idx, 0, 0, 0)
        )
        out_buf = jnp.where(done, upd, out_buf)

        x_next = jax.lax.ppermute(x, "pp", perm)
        return (x_next, kcache, vcache, out_buf), None

    init = (
        jnp.zeros(x_all.shape[1:], x_all.dtype),
        k_cache,
        v_cache,
        jnp.zeros(out_shape, x_all.dtype),
    )
    (x_last, k_cache, v_cache, out_buf), _ = jax.lax.scan(
        step, init, jnp.arange(spec.n_steps)
    )
    out = jax.lax.psum(out_buf, "pp")  # only the last stage wrote; gather
    expand = lambda c: jax.tree.map(lambda a: a[None], c)
    return out, expand(k_cache), expand(v_cache)


def _masked_update(cache, new, idx3, valid):
    c, w, row0 = idx3

    def upd(a, n):
        idx = (c, w, row0) + (0,) * (n.ndim - 1)
        n = jnp.where(valid, n,
                      jax.lax.dynamic_slice(a, idx, (1, 1) + n.shape)[0, 0])
        return jax.lax.dynamic_update_slice(a, n[None, None], idx)

    return jax.tree.map(upd, cache, new)


def make_pipe_forward(
    cfg: ModelConfig,
    spec: PipeSpec,
    mesh: Mesh,
    opts: ForwardOptions | None = None,
    return_hidden: bool = False,
):
    """Build the jitted distributed forward: (params, tokens, positions,
    cache_pos, kv) -> (logits, kv).

    tokens: (M, B, S) int32 — M microbatches of global batch B each.
    Embedding and the output head run replicated outside the ring (the
    reference runs them on rank 0, main.cpp flow; here they are data-parallel
    over dp and cheap relative to the layer stack).
    """
    opts = opts or ForwardOptions()
    cfg_local = tp_local_config(cfg, spec.n_tp)
    # forward ALL option fields (attn_impl etc.), only overriding the
    # in-shard-map parallel axes
    opts_local = dataclasses.replace(
        opts, tp_axis="tp" if spec.n_tp > 1 else None,
        sp_axis="sp" if spec.n_sp > 1 else None)

    body = functools.partial(_pipe_body, cfg_local=cfg_local, spec=spec, opts=opts_local)
    data_spec = P(None, "dp", None, None)
    kv_spec = P("pp", None, None, "dp",
                "sp" if spec.n_sp > 1 else None, "tp", None)

    def fwd(params, tokens, positions, cache_pos, kv, mask_positions=None):
        """params: dict with 'pipe' (stacked layers), 'tok_embd',
        'output_norm', 'output' (replicated). mask_positions defaults to
        positions; Self-Extend passes the physical cell positions here
        while `positions` carries the compressed rope positions."""
        if mask_positions is None:
            mask_positions = positions
        layer_specs = jax.tree.map(lambda _: P("pp", "tp"), params["pipe"])
        # per-leaf kv specs: quantized caches are (qs, scale) pytrees whose
        # leaves share the dense layout's 7-dim rank
        k_specs = jax.tree.map(lambda _: kv_spec, kv[0])
        v_specs = jax.tree.map(lambda _: kv_spec, kv[1])
        pipe = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(layer_specs, data_spec, P(None, "dp", None),
                      P(None, "dp", None), P(None, "dp"),
                      k_specs, v_specs),
            out_specs=(data_spec, k_specs, v_specs),
            check_vma=False,
        )
        x = embed(params["tok_embd"], tokens, opts.dtype)  # (M, B, S, E)
        if cfg.embd_scale != 1.0:  # gemma-family input scaling
            x = x * np.float32(cfg.embd_scale)
        hidden, kc, vc = pipe(params["pipe"], x, positions, mask_positions,
                              cache_pos, kv[0], kv[1])
        if return_hidden:
            return hidden, (kc, vc)
        from ..models.llama import model_norm

        h = model_norm(hidden, params.get("output_norm"),
                       params.get("output_norm_b"), cfg)
        if cfg.logit_scale != 1.0:
            h = h * np.float32(cfg.logit_scale)
        if params.get("output_sharded") is not None:
            # vocab-row-sharded head: every device computes its logits
            # slice; the gather happens at the shard_map boundary
            w_sh = params["output_sharded"]
            head_axes = _head_axes(mesh)
            w_specs = jax.tree.map(lambda _: P(None, head_axes), w_sh)

            def head_body(w, hloc):
                wq = jax.tree.map(lambda a: a[0, 0], w)
                return linear(hloc, wq, opts.matmul_impl)

            logits = jax.shard_map(
                head_body, mesh=mesh,
                in_specs=(w_specs, P()),
                out_specs=P(None, None, None, head_axes),
                check_vma=False,
            )(w_sh, h).astype(opts.logits_dtype)
        else:
            w_out = params["output"] if params.get("output") is not None else params["tok_embd"]
            logits = linear(h, w_out, opts.matmul_impl).astype(opts.logits_dtype)
        if params.get("output_b") is not None:
            logits = logits + params["output_b"].astype(logits.dtype)
        if cfg.final_logit_softcap:  # gemma2
            cap = np.float32(cfg.final_logit_softcap)
            logits = cap * jnp.tanh(logits / cap)
        return logits, (kc, vc)

    return fwd
