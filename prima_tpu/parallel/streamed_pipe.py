"""Weight streaming composed with the piped-ring pipeline.

The reference's load-bearing composition (manage_graph_tensors invoked per
subgraph inside the k-cycle decode loop, src/llama.cpp:18152-18218 +
18567-18575): each device keeps only n[m] layers of every window resident
and prefetches the (w[m]-n[m]) streamed layers of its NEXT window while the
ring computes the current one. This is what makes k>1 cycles *mean*
something: a device revisited k times per token only ever holds
  k*n_resident + 2*(W - n_resident)
layers in HBM instead of k*W.

TPU design (host-driven ring): the per-step ring math is identical to
parallel/pipeline.py's fused lax.scan, but each ring step is its own jitted
shard_map dispatch so the HOST can swap the streamed window rows between
steps. The schedule advances exactly one device's cycle per step, so one
row (the "diagonal" element) uploads host->HBM per step, overlapping the
whole mesh's compute — the analogue of posix_madvise(WILLNEED) prefetch
overlap. Rows are swapped by committing per-device shard buffers with
jax.device_put and reassembling the global array with
jax.make_array_from_single_device_arrays (metadata only, no copy).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelConfig
from ..models.llama import ForwardOptions, decode_layer, embed, linear, model_norm
from ..ops.layers import causal_mask, rope_freqs
from ..quant.dequant_jax import QTensor, host_pack
from ..quant.device_format import UQTensor
from .pipeline import PipeSpec, init_pipe_kv  # noqa: F401 (re-export for callers)
from .sharding import put_replicated, put_stacked_dense, put_stacked_qtensor
from .tp import shard_layer_uq, tp_local_config


def _host_window_tp(layers: list[dict], n_tp: int, pallas: bool) -> list:
    """list of W host layer dicts -> per-tp-rank window pytrees with numpy
    leaves stacked over the window axis: dict name -> QTensor(np) | np."""
    shards = [shard_layer_uq(layer, n_tp) for layer in layers]  # [w][t]
    out = []
    for t in range(n_tp):
        win: dict = {}
        for name in shards[0][t]:
            vals = [shards[w][t][name] for w in range(len(layers))]
            if isinstance(vals[0], UQTensor):
                packs = [host_pack(v, pallas) for v in vals]
                qs, scales, mins, d, dmin, kperm, packed = packs[0]
                stk = lambda i: (np.stack([p[i] for p in packs])
                                 if packs[0][i] is not None else None)
                u0 = vals[0]
                win[name] = QTensor(
                    qs=stk(0), scales=stk(1), mins=stk(2), sub=u0.sub,
                    layout=u0.layout, q_offset=u0.q_offset, shape=u0.shape,
                    kperm=kperm, d=stk(3), dmin=stk(4), gsub=u0.gsub,
                    packed=packed)
            else:
                win[name] = np.stack([np.asarray(v, np.float32) for v in vals])
        out.append(win)
    return out


class _DiagonalStore:
    """The current streamed window of every pipeline stage, as per-device
    committed shard buffers that assemble into one global (PP, TP, Ws, ...)
    pytree without copying."""

    def __init__(self, mesh: Mesh, window_template):
        self.mesh = mesh
        ax = dict(zip(mesh.axis_names, mesh.devices.shape))
        self.n_dp, self.n_pp, self.n_tp = ax["dp"], ax["pp"], ax["tp"]
        self.n_sp = ax.get("sp", 1)  # windows replicate over seq shards
        leaves, self.treedef = jax.tree.flatten(window_template)
        self.leaf_shapes = [l.shape for l in leaves]
        self.leaf_dtypes = [l.dtype for l in leaves]
        # rows[d][t] = list over leaves of list over dp replicas of arrays
        self.rows = [[None] * self.n_tp for _ in range(self.n_pp)]
        self.row_cycle = [None] * self.n_pp

    def _devices(self, d: int, t: int):
        # mesh.devices has shape (dp, pp, sp, tp) — parallel.mesh.AXES order
        return [self.mesh.devices[r, d, s, t]
                for r in range(self.n_dp) for s in range(self.n_sp)]

    def upload_row(self, d: int, host_windows_tp: list) -> list:
        """Async-enqueue host->device transfers of stage d's next window.
        Returns the new row; caller installs it with `install_row` AFTER
        dispatching the step that still uses the old one."""
        row = []
        for t in range(self.n_tp):
            leaves = jax.tree.flatten(host_windows_tp[t])[0]
            devs = self._devices(d, t)
            row.append([
                [jax.device_put(np.asarray(leaf)[None, None], dev)
                 for dev in devs]
                for leaf in leaves
            ])
        return row

    def install_row(self, d: int, row: list, cycle: int) -> None:
        self.rows[d] = row
        self.row_cycle[d] = cycle

    def assemble(self):
        """Global (PP, TP, Ws, ...) pytree from the current rows — metadata
        only (make_array_from_single_device_arrays)."""
        n_leaves = len(self.leaf_shapes)
        globals_ = []
        for li in range(n_leaves):
            shape = (self.n_pp, self.n_tp) + self.leaf_shapes[li]
            spec = P("pp", "tp", *([None] * len(self.leaf_shapes[li])))
            arrays = [
                self.rows[d][t][li][r]
                for d in range(self.n_pp)
                for t in range(self.n_tp)
                for r in range(self.n_dp * self.n_sp)
            ]
            globals_.append(jax.make_array_from_single_device_arrays(
                shape, NamedSharding(self.mesh, spec), arrays))
        return jax.tree.unflatten(self.treedef, globals_)


@dataclasses.dataclass
class StreamedPipeModel:
    cfg: ModelConfig
    spec: PipeSpec
    mesh: Mesh
    n_resident: int  # HBM-resident layers per window (the solver's n[m])
    resident: dict  # stacked (PP, TP, K, Wr, ...) — uploaded once
    head: dict  # replicated embed / norm / output
    streamed_host: list  # [pp][cycle] -> per-tp window pytrees (numpy)
    window_template: object  # per-(pp,tp) shard pytree structure


def build_streamed_pipe_model(
    get_layer: Callable[[int], dict],
    head_host: dict,
    cfg: ModelConfig,
    spec: PipeSpec,
    mesh: Mesh,
    n_resident: int,
    pallas: bool = True,
) -> StreamedPipeModel:
    """Layer placement: within every window of W layers, the LAST n_resident
    stay HBM-resident (mirroring the reference's `local_i % window_size >=
    window_size - n_gpu_layers` GPU split, src/llama.cpp:7597-7605); the
    first (W - n_resident) stream from host RAM per cycle."""
    W = spec.window
    if not 0 <= n_resident <= W:
        raise ValueError(f"n_resident {n_resident} not in [0, {W}]")
    ws = W - n_resident  # streamed layers per window

    # resident stack (PP, TP, K, Wr, ...)
    resident: dict = {}
    if n_resident:
        nested = [
            [[[None] * n_resident for _ in range(spec.k_cycles)]
             for _ in range(spec.n_tp)]
            for _ in range(spec.n_pp)
        ]
        names: set = set()
        for d in range(spec.n_pp):
            for c in range(spec.k_cycles):
                lids = list(spec.window_layers(d, c))[ws:]
                for wi, li in enumerate(lids):
                    shards = shard_layer_uq(get_layer(li), spec.n_tp)
                    names.update(shards[0].keys())
                    for t in range(spec.n_tp):
                        nested[d][t][c][wi] = shards[t]
        for name in sorted(names):
            tree = [
                [[[nested[d][t][c][w][name] for w in range(n_resident)]
                  for c in range(spec.k_cycles)]
                 for t in range(spec.n_tp)]
                for d in range(spec.n_pp)
            ]
            first = tree[0][0][0][0]
            axes = ("pp", "tp", None, None)
            if isinstance(first, UQTensor):
                resident[name] = put_stacked_qtensor(tree, mesh, axes,
                                                     pallas=pallas)
            else:
                resident[name] = put_stacked_dense(tree, mesh, axes,
                                                   dtype=np.float32)

    # streamed host windows
    streamed_host: list = []
    template = None
    for d in range(spec.n_pp):
        per_cycle = []
        for c in range(spec.k_cycles):
            lids = list(spec.window_layers(d, c))[:ws]
            if ws:
                win_tp = _host_window_tp([get_layer(li) for li in lids],
                                         spec.n_tp, pallas)
                if template is None:
                    template = jax.tree.map(
                        lambda a: jax.ShapeDtypeStruct(np.asarray(a).shape,
                                                       np.asarray(a).dtype),
                        win_tp[0])
            else:
                win_tp = [{} for _ in range(spec.n_tp)]
            per_cycle.append(win_tp)
        streamed_host.append(per_cycle)

    def put_head(t):
        if t is None:
            return None
        if isinstance(t, UQTensor):
            return QTensor.from_host(t, sharding=NamedSharding(mesh, P()),
                                     pallas=pallas)
        return put_replicated(np.asarray(t, np.float32), mesh)

    head = {k: put_head(v) for k, v in head_host.items()}
    return StreamedPipeModel(cfg, spec, mesh, n_resident, resident, head,
                             streamed_host, template)


def _streamed_step(
    resident: dict,  # local (1, 1, K, Wr, ...) or {}
    streamed,  # local (1, 1, Ws, ...) pytree or {}
    x_ring: jax.Array,  # local (1, B, S, E)
    out_buf: jax.Array,  # local (1, M, B, S, E)
    k_cache: jax.Array,  # local (1, K, W, MB, T, kvh, hd)
    v_cache: jax.Array,
    x_all: jax.Array,  # (M, B, S, E)
    positions: jax.Array,  # (M, B, S)
    cache_pos: jax.Array,  # (M, B)
    t: jax.Array,  # scalar step index
    *,
    cfg_local: ModelConfig,
    spec: PipeSpec,
    opts: ForwardOptions,
    n_res: int,
):
    n, kc, W, M = spec.n_pp, spec.k_cycles, spec.window, spec.microbatches
    ws = W - n_res
    d = jax.lax.axis_index("pp")
    res_local = jax.tree.map(lambda a: a[0, 0], resident)  # (K, Wr, ...)
    str_local = jax.tree.map(lambda a: a[0, 0], streamed)  # (Ws, ...)
    kcache, vcache = k_cache[0], v_cache[0]
    x_cur = x_ring[0]
    B = x_all.shape[1]
    T = kcache.shape[3]
    inv_freq, mscale = rope_freqs(cfg_local)
    perm = [(i, (i + 1) % n) for i in range(n)]

    j = t - d
    m = jnp.mod(j, n)
    c = (j - m) // n
    valid = (c >= 0) & (c < kc) & (m < M)
    m_idx = jnp.clip(m, 0, M - 1)
    c_idx = jnp.clip(c, 0, kc - 1)

    inject = (d == 0) & (t < M)
    x_inj = jax.lax.dynamic_index_in_dim(x_all, jnp.minimum(t, M - 1), 0,
                                         keepdims=False)
    x = jnp.where(inject, x_inj, x_cur)

    pos_m = jax.lax.dynamic_index_in_dim(positions, m_idx, 0, keepdims=False)
    cp_m = jax.lax.dynamic_index_in_dim(cache_pos, m_idx, 0, keepdims=False)
    mask = causal_mask(pos_m, T)

    win_r = (jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, c_idx, 0, keepdims=False),
        res_local) if n_res else None)
    row0 = m_idx * B
    for w in range(W):
        if w < ws:  # streamed: the host already installed this cycle's row
            layer = jax.tree.map(lambda a: a[w], str_local)
        else:
            layer = jax.tree.map(lambda a: a[w - ws], win_r)
        kv_k = jax.lax.dynamic_slice(
            kcache, (c_idx, w, row0, 0, 0, 0),
            (1, 1, B, T, kcache.shape[4], kcache.shape[5]))[0, 0]
        kv_v = jax.lax.dynamic_slice(
            vcache, (c_idx, w, row0, 0, 0, 0),
            (1, 1, B, T, vcache.shape[4], vcache.shape[5]))[0, 0]
        x, (kv_k, kv_v) = decode_layer(
            layer, cfg_local, x, pos_m, (kv_k, kv_v), cp_m, mask,
            inv_freq, mscale, opts)
        kcache = _masked_update6(kcache, kv_k, (c_idx, w, row0), valid)
        vcache = _masked_update6(vcache, kv_v, (c_idx, w, row0), valid)

    done = valid & (d == n - 1) & (c == kc - 1)
    upd = jax.lax.dynamic_update_slice(
        out_buf[0], x[None].astype(out_buf.dtype), (m_idx, 0, 0, 0))
    out_new = jnp.where(done, upd, out_buf[0])

    x_next = jax.lax.ppermute(x, "pp", perm)
    return x_next[None], out_new[None], kcache[None], vcache[None]


def _masked_update6(cache, new, idx3, valid):
    c, w, row0 = idx3
    new = jnp.where(valid, new, jax.lax.dynamic_slice(
        cache, (c, w, row0, 0, 0, 0), (1, 1) + new.shape)[0, 0])
    return jax.lax.dynamic_update_slice(cache, new[None, None],
                                        (c, w, row0, 0, 0, 0))


class StreamedPipeRunner:
    """Host-driven piped-ring decode with per-stage window streaming."""

    def __init__(self, model: StreamedPipeModel, batch_per_micro: int,
                 max_seq: int, opts: ForwardOptions | None = None,
                 kv_dtype=jnp.float32):
        self.m = model
        spec, mesh, cfg = model.spec, model.mesh, model.cfg
        self.opts = opts or ForwardOptions()
        self.B = batch_per_micro
        self.T = max_seq
        self.kv = init_pipe_kv(cfg, spec, mesh, batch_per_micro, max_seq,
                               kv_dtype)
        cfg_local = tp_local_config(cfg, spec.n_tp)
        opts_local = dataclasses.replace(
            self.opts, tp_axis="tp" if spec.n_tp > 1 else None)

        body = functools.partial(
            _streamed_step, cfg_local=cfg_local, spec=spec, opts=opts_local,
            n_res=model.n_resident)
        res_specs = jax.tree.map(lambda _: P("pp", "tp"), model.resident)
        str_specs = (jax.tree.map(lambda _: P("pp", "tp"),
                                  model.window_template)
                     if model.window_template is not None else {})
        kv_spec = P("pp", None, None, "dp", None, "tp", None)
        ring_spec = P("pp", "dp", None, None)
        out_spec = P("pp", None, "dp", None, None)
        data_spec = P(None, "dp", None, None)

        stepper = jax.shard_map(
            body, mesh=mesh,
            in_specs=(res_specs, str_specs, ring_spec, out_spec, kv_spec,
                      kv_spec, data_spec, P(None, "dp", None), P(None, "dp"),
                      P()),
            out_specs=(ring_spec, out_spec, kv_spec, kv_spec),
            check_vma=False,
        )
        # x_ring/out_buf/kv donated: each step reuses the HBM of the last
        self._step = jax.jit(stepper, donate_argnums=(2, 3, 4, 5))

        e = cfg.n_embd
        self._ring_shape = (spec.n_pp, batch_per_micro, 1, e)

        @jax.jit
        def _embed(head, tokens):
            x = embed(head["tok_embd"], tokens, self.opts.dtype)
            if cfg.embd_scale != 1.0:
                x = x * np.float32(cfg.embd_scale)
            return x

        @jax.jit
        def _head_fn(head, hidden):
            h = model_norm(hidden, head.get("output_norm"),
                           head.get("output_norm_b"), cfg)
            if cfg.logit_scale != 1.0:
                h = h * np.float32(cfg.logit_scale)
            w = head["output"] if head.get("output") is not None else head["tok_embd"]
            logits = linear(h, w, self.opts.matmul_impl).astype(
                self.opts.logits_dtype)
            if cfg.final_logit_softcap:
                cap = np.float32(cfg.final_logit_softcap)
                logits = cap * jnp.tanh(logits / cap)
            return logits

        self._embed = _embed
        self._head_fn = _head_fn

        self._store = (_DiagonalStore(mesh, model.window_template)
                       if model.window_template is not None else None)
        if self._store is not None:
            for d in range(spec.n_pp):
                self._store.install_row(
                    d, self._store.upload_row(d, model.streamed_host[d][0]), 0)

    def forward(self, tokens: np.ndarray, positions: np.ndarray,
                cache_pos: np.ndarray) -> np.ndarray:
        """tokens/positions: (M, B, S); cache_pos: (M, B). Returns logits
        (M, B, S, vocab); KV updated in place (donated)."""
        m, spec = self.m, self.m.spec
        n, kc = spec.n_pp, spec.k_cycles
        M, B, S = tokens.shape
        assert M == spec.microbatches and B == self.B
        x_all = self._embed(m.head, jnp.asarray(tokens))
        e = self.m.cfg.n_embd
        sh_ring = NamedSharding(self.m.mesh, P("pp", "dp", None, None))
        sh_out = NamedSharding(self.m.mesh, P("pp", None, "dp", None, None))
        x_ring = jnp.zeros((n, B, S, e), x_all.dtype, device=sh_ring)
        out_buf = jnp.zeros((n, M, B, S, e), x_all.dtype, device=sh_out)
        kcache, vcache = self.kv
        pos_j = jnp.asarray(positions)
        cp_j = jnp.asarray(cache_pos)

        for t in range(spec.n_steps):
            # prefetch: the one device whose cycle advances at step t+1
            new_row = None
            if self._store is not None and kc > 1:
                d_adv = (t + 1) % n
                c_new = (t + 1 - d_adv) // n
                if 0 <= c_new < kc and self._store.row_cycle[d_adv] != c_new:
                    new_row = (d_adv, c_new, self._store.upload_row(
                        d_adv, m.streamed_host[d_adv][c_new]))
            streamed = (self._store.assemble() if self._store is not None
                        else {})
            x_ring, out_buf, kcache, vcache = self._step(
                m.resident, streamed, x_ring, out_buf, kcache, vcache,
                x_all, pos_j, cp_j, jnp.int32(t))
            if new_row is not None:
                self._store.install_row(new_row[0], new_row[2], new_row[1])

        self.kv = (kcache, vcache)
        # reset the diagonal to cycle 0 for the next token (overlaps with
        # the head matmul below — the reference's "rank 0 re-prefetches
        # window 0 at cycle end", src/llama.cpp:18567-18575)
        if self._store is not None and kc > 1:
            for d in range(n):
                if self._store.row_cycle[d] != 0:
                    self._store.install_row(
                        d, self._store.upload_row(d, m.streamed_host[d][0]), 0)
        hidden = out_buf[n - 1]  # only the last stage wrote (M, B, S, E)
        return self._head_fn(m.head, hidden)
