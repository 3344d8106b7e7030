"""KV-cache management: sequence ops over dense per-slot cache buffers.

The reference manages a unified cell pool with per-cell seq_id sets
(llama_kv_cache_init src/llama.cpp:3889, find_slot, defrag). On TPU the
cache is a dense (batch, T, kvh, hd) buffer per layer with one sequence per
batch row (the server's slot model) — cell bookkeeping becomes per-row
`cache_pos` integers on the host, and the mutation ops become jitted array
programs:

  seq_rm(tail)      -> truncate: just lower cache_pos (masking hides rest)
  seq_cp            -> copy a row (slot restore / prompt reuse)
  context shift     -> roll [keep, keep+discard) out, re-rotate K by -delta
                       (the analogue of the K-shift graph, llama.cpp:16924)
  seq_div (grp-attn)-> Self-Extend positional division on K

K is cached AFTER RoPE (as in the reference), so position shifts re-rotate
cached K by the delta angle — rope(p) -> rope(p+d) composes additively.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.llama import init_kv_caches
from ..ops.layers import rope_freqs


@functools.partial(jax.jit, static_argnames=("rope_type",))
def _rope_delta(k: jax.Array, delta: jax.Array, inv_freq: jax.Array, rope_type: str) -> jax.Array:
    """Rotate cached K rows by per-position `delta` (T,) extra positions."""
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
        y = jnp.stack([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1).reshape(x_rot.shape)
    else:
        x0, x1 = x_rot[..., :half], x_rot[..., half:]
        y = jnp.concatenate([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)
    out = jnp.concatenate([y, x_pass], axis=-1) if x_pass.shape[-1] else y
    return out.astype(k.dtype)


def _materialize_row(cache, slot: int) -> jax.Array:
    """One slot's dense (T, H, D) values from a dense or quantized cache."""
    from ..ops.kvquant import KVQ4, KVQ8

    if isinstance(cache, (KVQ8, KVQ4)):
        return type(cache)(cache.qs[slot], cache.scale[slot]).astype(jnp.bfloat16)
    return cache[slot]


def _set_row(cache, slot: int, row: jax.Array):
    """Write one slot's dense row back (requantizing quantized caches)."""
    from ..ops.kvquant import KVQ4, KVQ8, quantize_kv, quantize_kv4

    if isinstance(cache, KVQ8):
        q, s = quantize_kv(row)
        return KVQ8(cache.qs.at[slot].set(q), cache.scale.at[slot].set(s))
    if isinstance(cache, KVQ4):
        q, s = quantize_kv4(row)
        return KVQ4(cache.qs.at[slot].set(q), cache.scale.at[slot].set(s))
    return cache.at[slot].set(row.astype(cache.dtype))


@dataclass
class KVCache:
    """Per-slot dense KV cache + host-side cell metadata."""

    cfg: ModelConfig
    n_slots: int
    max_seq: int
    dtype: object = jnp.bfloat16
    caches: list = None  # per layer (k, v): (n_slots, T, kvh, hd)
    cache_pos: np.ndarray = None  # (n_slots,) next write index == seq length

    def __post_init__(self):
        if self.caches is None:
            self.caches = init_kv_caches(self.cfg, self.n_slots, self.max_seq, self.dtype)
        if self.cache_pos is None:
            self.cache_pos = np.zeros(self.n_slots, dtype=np.int32)
        self._inv_freq, _ = rope_freqs(self.cfg)

    # -- mutation ops (the llama_kv_cache_seq_* analogues) --------------------

    def clear(self) -> None:
        self.cache_pos[:] = 0

    def seq_rm(self, slot: int, p0: int = 0, p1: int = -1) -> None:
        """Remove [p0, p1) of a slot. Only tail removal changes device state
        (masking hides everything past cache_pos); interior removal is
        equivalent to truncating to p0 and re-decoding (the reference's
        behavior for cache reuse)."""
        if p1 < 0 or p1 >= int(self.cache_pos[slot]):
            self.cache_pos[slot] = min(int(self.cache_pos[slot]), max(p0, 0))
        else:
            # interior removal: truncate to p0 (caller re-decodes the rest)
            self.cache_pos[slot] = max(p0, 0)

    def seq_cp(self, dst: int, src: int) -> None:
        for i, kv in enumerate(self.caches):
            if kv is None:
                continue
            self.caches[i] = jax.tree.map(lambda a: a.at[dst].set(a[src]), kv)
        self.cache_pos[dst] = self.cache_pos[src]

    def seq_keep(self, slot: int) -> None:
        keep = int(self.cache_pos[slot])
        self.cache_pos[:] = 0
        self.cache_pos[slot] = keep

    def remap(self, slot: int, src: np.ndarray, delta: np.ndarray,
              new_used: int) -> None:
        """General cell remap: dest position i takes the entry from index
        src[i], with K re-rotated by delta[i] extra positions. The primitive
        underlying context-shift, seq_add and Self-Extend."""
        src_j = jnp.asarray(np.minimum(src, self.max_seq - 1))
        delta_j = jnp.asarray(delta.astype(np.int32))
        for i, kvp in enumerate(self.caches):
            if kvp is None:
                continue
            k, v = kvp
            k_row = _materialize_row(k, slot)[src_j]  # (T, kvh, hd)
            k_row = _rope_delta(k_row, delta_j, self._inv_freq, self.cfg.rope_type)
            self.caches[i] = (
                _set_row(k, slot, k_row),
                jax.tree.map(lambda a: a.at[slot].set(a[slot][src_j]), v),
            )
        self.cache_pos[slot] = new_used

    def context_shift(self, slot: int, n_keep: int, n_discard: int) -> None:
        """Drop tokens [n_keep, n_keep + n_discard), shift the rest down and
        re-rotate K by -n_discard (context-shift, main.cpp:584-617)."""
        used = int(self.cache_pos[slot])
        assert n_keep + n_discard <= used
        move = used - n_keep - n_discard
        idx = np.arange(self.max_seq, dtype=np.int32)
        src = np.where(idx < n_keep, idx, idx + n_discard)
        delta = np.where((idx >= n_keep) & (idx < n_keep + move), -n_discard, 0)
        self.remap(slot, src, delta, n_keep + move)

    def seq_add(self, slot: int, p0: int, p1: int, delta: int,
                move: bool = True) -> None:
        """Shift positions of cells in [p0, p1) by delta (llama_kv_cache_
        seq_add). move=True: cells physically move (the dense layout's
        position == index invariant holds — context-shift style). move=False:
        rotation-only — cells stay put but their RoPE phase shifts; used by
        Self-Extend where causality-by-index stays valid and the engine
        tracks the query-position offset."""
        if delta == 0:
            return
        used = int(self.cache_pos[slot])
        p1 = min(p1, used)
        idx = np.arange(self.max_seq, dtype=np.int32)
        if move:
            inrange = (idx >= p0 + delta) & (idx < p1 + delta)
            src = np.where(inrange, idx - delta, idx)
            d = np.where(inrange, delta, 0)
            self.remap(slot, src, d, max(used + (delta if p1 == used else 0), 0))
        else:
            d = np.where((idx >= p0) & (idx < p1), delta, 0)
            self.remap(slot, idx, d, used)

    def rope_shift(self, slot: int, delta: np.ndarray) -> None:
        """Re-rotate cached K of every cell i by per-index position delta[i]
        WITHOUT moving cells — the building block for Self-Extend grouped
        attention, where logical positions compress but storage order (and
        causality-by-index) is unchanged."""
        if not np.any(delta):
            return
        delta_j = jnp.asarray(delta.astype(np.int32))
        for i, kvp in enumerate(self.caches):
            if kvp is None:
                continue
            k, v = kvp
            k_row = _rope_delta(_materialize_row(k, slot), delta_j,
                                self._inv_freq, self.cfg.rope_type)
            self.caches[i] = (_set_row(k, slot, k_row), v)

    def seq_div(self, slot: int, p0: int, p1: int, divisor: int) -> None:
        """Self-Extend grouped attention: divide positions in [p0, p1) by
        `divisor` (main.cpp:618-640). Re-rotates cached K accordingly."""
        if divisor <= 1:
            return
        T = self.max_seq
        idx = np.arange(T, dtype=np.int32)
        inrange = (idx >= p0) & (idx < p1)
        newpos = np.where(inrange, idx // divisor, idx)  # pos /= d, absolute
        delta = (newpos - idx).astype(np.int32)
        delta_j = jnp.asarray(delta)
        for i, kvp in enumerate(self.caches):
            if kvp is None:
                continue
            k, v = kvp
            k_row = _rope_delta(_materialize_row(k, slot), delta_j,
                                self._inv_freq, self.cfg.rope_type)
            self.caches[i] = (_set_row(k, slot, k_row), v)

    def used(self, slot: int) -> int:
        return int(self.cache_pos[slot])


def _materialize_srow(cache, slot: int) -> jax.Array:
    """One slot's dense (L, T, H, D) values from a stacked cache."""
    from ..ops.kvquant import KVQ4, KVQ8

    if isinstance(cache, (KVQ8, KVQ4)):
        return type(cache)(cache.qs[:, slot], cache.scale[:, slot]).astype(jnp.bfloat16)
    return cache[:, slot]


def _set_srow(cache, slot: int, row: jax.Array):
    from ..ops.kvquant import KVQ4, KVQ8, quantize_kv, quantize_kv4

    if isinstance(cache, KVQ8):
        q, s = quantize_kv(row)
        return KVQ8(cache.qs.at[:, slot].set(q), cache.scale.at[:, slot].set(s))
    if isinstance(cache, KVQ4):
        q, s = quantize_kv4(row)
        return KVQ4(cache.qs.at[:, slot].set(q), cache.scale.at[:, slot].set(s))
    return cache.at[:, slot].set(row.astype(cache.dtype))


@dataclass
class StackedKVCache(KVCache):
    """KV cache with a leading LAYER axis — the forward_scan layout: one
    (k, v) pair of (n_layers, n_slots, T, kvh, hd) arrays instead of a
    per-layer list. Every mutation op touches all layers in ONE array
    program (a single gather/rope instead of n_layers of them)."""

    def __post_init__(self):
        if self.caches is None:
            from ..models.llama import init_kv_stacked

            dt = self.dtype
            if isinstance(dt, str):
                from ..ops.kvquant import KVQ4, KVQ8

                L = self.cfg.n_layers
                shape = (L, self.n_slots, self.max_seq,
                         self.cfg.n_kv_heads, self.cfg.head_dim)
                cls_ = KVQ8 if dt == "q8_0" else KVQ4
                self.caches = (cls_.zeros(shape), cls_.zeros(shape))
            else:
                self.caches = init_kv_stacked(self.cfg, self.n_slots,
                                              self.max_seq, dt)
        if self.cache_pos is None:
            self.cache_pos = np.zeros(self.n_slots, dtype=np.int32)
        self._inv_freq, _ = rope_freqs(self.cfg)

    def seq_cp(self, dst: int, src: int) -> None:
        k, v = self.caches
        cp = lambda a: jax.tree.map(lambda x: x.at[:, dst].set(x[:, src]), a)
        self.caches = (cp(k), cp(v))
        self.cache_pos[dst] = self.cache_pos[src]

    def remap(self, slot: int, src: np.ndarray, delta: np.ndarray,
              new_used: int) -> None:
        src_j = jnp.asarray(np.minimum(src, self.max_seq - 1))
        delta_j = jnp.asarray(delta.astype(np.int32))
        k, v = self.caches
        k_row = _materialize_srow(k, slot)[:, src_j]  # (L, T, H, D)
        k_row = _rope_delta(k_row, delta_j, self._inv_freq, self.cfg.rope_type)
        v_row = jax.tree.map(lambda a: a[:, slot][:, src_j], v)
        self.caches = (
            _set_srow(k, slot, k_row),
            jax.tree.map(lambda a, r: a.at[:, slot].set(r), v, v_row),
        )
        self.cache_pos[slot] = new_used

    def rope_shift(self, slot: int, delta: np.ndarray) -> None:
        if not np.any(delta):
            return
        delta_j = jnp.asarray(delta.astype(np.int32))
        k, v = self.caches
        k_row = _rope_delta(_materialize_srow(k, slot), delta_j,
                            self._inv_freq, self.cfg.rope_type)
        self.caches = (_set_srow(k, slot, k_row), v)

    def seq_div(self, slot: int, p0: int, p1: int, divisor: int) -> None:
        if divisor <= 1:
            return
        idx = np.arange(self.max_seq, dtype=np.int32)
        inrange = (idx >= p0) & (idx < p1)
        newpos = np.where(inrange, idx // divisor, idx)
        self.rope_shift(slot, (newpos - idx).astype(np.int32))
