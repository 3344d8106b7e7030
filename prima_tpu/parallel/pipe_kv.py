"""Sequence ops over the piped-ring pipeline's KV cache.

The reference replicates KV mutations ring-wide with tagged ZMQ signals
(llama_send_kv_cache_* src/llama.cpp:22610-22745, applied per-device in the
decode loop @18329-18376). On a TPU mesh the cache is ONE logical array
sharded over (pp, dp, tp) — a mutation is a single jitted sharded program,
executed once by the host scheduler; the lockstep-replication protocol is
subsumed by SPMD (the "deterministic replay" design of PARITY.md, realized).

Layout reminder (init_pipe_kv): k/v are (PP, K, W, M*B, T, kvh, hd) with
  P("pp", None, None, "dp", None, "tp", None)
and layer li lives at (d, c, w) with v = li // W, c = v // n_pp, d = v %
n_pp, w = li % W (PipeSpec.window_layers). Slot (m, b) is cache row m*B+b.

Mutations mirror runtime/kv.py's KVCache surface (seq_rm / seq_cp /
context_shift / seq_add / seq_div / rope_shift / save-restore
materialization) so the server and engine drive single-chip and distributed
caches identically.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..ops.layers import rope_freqs
from .pipeline import PipeSpec, init_pipe_kv


@functools.partial(jax.jit, static_argnames=("rope_type",))
def _rope_delta_nd(k: jax.Array, delta: jax.Array, inv_freq: jax.Array,
                   rope_type: str) -> jax.Array:
    """Rotate cached K by per-position `delta` (T,). k: (..., T, kvh, hd)."""
    half = inv_freq.shape[0]
    theta = delta[:, None].astype(jnp.float32) * inv_freq  # (T, half)
    cos = jnp.cos(theta)[:, None, :]  # (T, 1, half)
    sin = jnp.sin(theta)[:, None, :]
    kf = k.astype(jnp.float32)
    rot = 2 * half
    x_rot, x_pass = kf[..., :rot], kf[..., rot:]
    if rope_type == "norm":
        xr = x_rot.reshape(x_rot.shape[:-1] + (half, 2))
        x0, x1 = xr[..., 0], xr[..., 1]
        y = jnp.stack([x0 * cos - x1 * sin, x0 * sin + x1 * cos],
                      axis=-1).reshape(x_rot.shape)
    else:
        x0, x1 = x_rot[..., :half], x_rot[..., half:]
        y = jnp.concatenate([x0 * cos - x1 * sin, x0 * sin + x1 * cos],
                            axis=-1)
    out = jnp.concatenate([y, x_pass], axis=-1) if x_pass.shape[-1] else y
    return out.astype(k.dtype)


def _rot_k(k_row, delta, inv_freq, rope_type):
    """Rotate one K row view; quantized rows dequantize -> rotate ->
    requantize (the analogue of the reference's f32-tmp K-shift cpy dance
    for quantized K caches)."""
    from ..ops.kvquant import KVQ4, KVQ8, quantize_kv, quantize_kv4

    if isinstance(k_row, (KVQ8, KVQ4)):
        rot = _rope_delta_nd(k_row.astype(jnp.float32), delta, inv_freq,
                             rope_type)
        qfn = quantize_kv if isinstance(k_row, KVQ8) else quantize_kv4
        return type(k_row)(*qfn(rot))
    return _rope_delta_nd(k_row, delta, inv_freq, rope_type)


def _take_row(cache, row, src):
    return jax.tree.map(lambda a: jnp.take(a[:, :, :, row], src, axis=3),
                        cache)


def _set_row(cache, row, new):
    return jax.tree.map(lambda a, b: a.at[:, :, :, row].set(b), cache, new)


@functools.partial(jax.jit, static_argnames=("rope_type",))
def _remap_row(k, v, row, src, delta, inv_freq, *, rope_type="neox"):
    """Gather-then-rotate one slot row across all (PP, K, W) windows."""
    k_row = _rot_k(_take_row(k, row, src), delta, inv_freq, rope_type)
    v_row = _take_row(v, row, src)
    return (_set_row(k, row, k_row), _set_row(v, row, v_row))


@jax.jit
def _copy_row(k, v, dst, src):
    cp = lambda c: jax.tree.map(
        lambda a: a.at[:, :, :, dst].set(a[:, :, :, src]), c)
    return (cp(k), cp(v))


@functools.partial(jax.jit, static_argnames=("rope_type",))
def _rotate_row(k, row, delta, inv_freq, *, rope_type="neox"):
    k_row = _rot_k(jax.tree.map(lambda a: a[:, :, :, row], k), delta,
                   inv_freq, rope_type)
    return _set_row(k, row, k_row)


@dataclass
class PipeKV:
    """KVCache-compatible wrapper over the pipe cache arrays."""

    cfg: ModelConfig
    spec: PipeSpec
    mesh: object
    batch_per_micro: int
    max_seq: int
    dtype: object = jnp.bfloat16
    arrays: tuple = None  # (k, v) — (PP, K, W, M*B, T, kvh, hd)
    cache_pos: np.ndarray = None  # (n_slots,) flat, row-major (m, b)

    def __post_init__(self):
        if self.arrays is None:
            self.arrays = init_pipe_kv(self.cfg, self.spec, self.mesh,
                                       self.batch_per_micro, self.max_seq,
                                       self.dtype)
        n = self.spec.microbatches * self.batch_per_micro
        if self.cache_pos is None:
            self.cache_pos = np.zeros(n, dtype=np.int32)
        self._inv_freq, _ = rope_freqs(self.cfg)

    # -- identity ------------------------------------------------------------

    @property
    def n_slots(self) -> int:
        return self.spec.microbatches * self.batch_per_micro

    def _row(self, slot) -> int:
        if isinstance(slot, tuple):
            return slot[0] * self.batch_per_micro + slot[1]
        return int(slot)

    def used(self, slot) -> int:
        return int(self.cache_pos[self._row(slot)])

    # -- mutations (llama_send_kv_cache_* analogues) ---------------------------

    def clear(self) -> None:
        self.cache_pos[:] = 0

    def seq_rm(self, slot, p0: int = 0, p1: int = -1) -> None:
        r = self._row(slot)
        if p1 < 0 or p1 >= int(self.cache_pos[r]):
            self.cache_pos[r] = min(int(self.cache_pos[r]), max(p0, 0))
        else:
            self.cache_pos[r] = max(p0, 0)

    def seq_cp(self, dst, src) -> None:
        k, v = self.arrays
        self.arrays = _copy_row(k, v, self._row(dst), self._row(src))
        self.cache_pos[self._row(dst)] = self.cache_pos[self._row(src)]

    def seq_keep(self, slot) -> None:
        r = self._row(slot)
        keep = int(self.cache_pos[r])
        self.cache_pos[:] = 0
        self.cache_pos[r] = keep

    def remap(self, slot, src: np.ndarray, delta: np.ndarray,
              new_used: int) -> None:
        r = self._row(slot)
        k, v = self.arrays
        self.arrays = _remap_row(
            k, v, r, jnp.asarray(np.minimum(src, self.max_seq - 1)),
            jnp.asarray(delta.astype(np.int32)), self._inv_freq,
            rope_type=self.cfg.rope_type)
        self.cache_pos[r] = new_used

    def context_shift(self, slot, n_keep: int, n_discard: int) -> None:
        used = self.used(slot)
        assert n_keep + n_discard <= used
        move = used - n_keep - n_discard
        idx = np.arange(self.max_seq, dtype=np.int32)
        src = np.where(idx < n_keep, idx, idx + n_discard)
        delta = np.where((idx >= n_keep) & (idx < n_keep + move),
                         -n_discard, 0)
        self.remap(slot, src, delta, n_keep + move)

    def seq_add(self, slot, p0: int, p1: int, delta: int,
                move: bool = True) -> None:
        if delta == 0:
            return
        used = self.used(slot)
        p1 = min(p1, used)
        idx = np.arange(self.max_seq, dtype=np.int32)
        if move:
            inrange = (idx >= p0 + delta) & (idx < p1 + delta)
            src = np.where(inrange, idx - delta, idx)
            d = np.where(inrange, delta, 0)
            self.remap(slot, src, d,
                       max(used + (delta if p1 == used else 0), 0))
        else:
            d = np.where((idx >= p0) & (idx < p1), delta, 0)
            self.remap(slot, idx, d, used)

    def rope_shift(self, slot, delta: np.ndarray) -> None:
        if not np.any(delta):
            return
        k, v = self.arrays
        k = _rotate_row(k, self._row(slot),
                        jnp.asarray(delta.astype(np.int32)), self._inv_freq,
                        rope_type=self.cfg.rope_type)
        self.arrays = (k, v)

    def seq_div(self, slot, p0: int, p1: int, divisor: int) -> None:
        if divisor <= 1:
            return
        idx = np.arange(self.max_seq, dtype=np.int32)
        inrange = (idx >= p0) & (idx < p1)
        newpos = np.where(inrange, idx // divisor, idx)
        self.rope_shift(slot, (newpos - idx).astype(np.int32))

    # -- save/restore materialization (runtime/state.py hooks) ----------------

    def _layer_coords(self, li: int) -> tuple[int, int, int]:
        W, n = self.spec.window, self.spec.n_pp
        v = li // W
        return v % n, v // n, li % W  # (d, c, w)

    def materialize_slot(self, slot, used: int) -> tuple[np.ndarray, np.ndarray]:
        """Dense (L, used, kvh, hd) f32 K and V for one slot, in layer order."""
        r = self._row(slot)
        k, v = self.arrays

        def dense_view(c):
            from ..ops.kvquant import KVQ4, KVQ8

            if isinstance(c, (KVQ8, KVQ4)):
                view = type(c)(c.qs[:, :, :, r, :used],
                               c.scale[:, :, :, r, :used])
                return np.asarray(view.astype(jnp.float32))
            return np.asarray(c[:, :, :, r, :used], np.float32)

        ks = dense_view(k)  # (PP,K,W,used,..)
        vs = dense_view(v)
        L = self.cfg.n_layers
        outk = np.empty((L,) + ks.shape[3:], np.float32)
        outv = np.empty_like(outk)
        for li in range(L):
            d, c, w = self._layer_coords(li)
            outk[li] = ks[d, c, w]
            outv[li] = vs[d, c, w]
        return outk, outv

    def restore_slot(self, slot, ks: np.ndarray, vs: np.ndarray,
                     used: int) -> None:
        r = self._row(slot)
        PP, K, W = self.spec.n_pp, self.spec.k_cycles, self.spec.window
        k_pipe = np.zeros((PP, K, W) + ks.shape[1:], np.float32)
        v_pipe = np.zeros_like(k_pipe)
        for li in range(self.cfg.n_layers):
            d, c, w = self._layer_coords(li)
            k_pipe[d, c, w] = ks[li]
            v_pipe[d, c, w] = vs[li]
        k, v = self.arrays

        def set_dense(c, dense):
            from ..ops.kvquant import KVQ4, KVQ8, quantize_kv, quantize_kv4

            if isinstance(c, (KVQ8, KVQ4)):
                qfn = quantize_kv if isinstance(c, KVQ8) else quantize_kv4
                q, s = qfn(jnp.asarray(dense))
                return type(c)(c.qs.at[:, :, :, r, :used].set(q),
                               c.scale.at[:, :, :, r, :used].set(s))
            return c.at[:, :, :, r, :used].set(
                jnp.asarray(dense).astype(c.dtype))

        self.arrays = (set_dense(k, k_pipe), set_dense(v, v_pipe))
        self.cache_pos[r] = used
