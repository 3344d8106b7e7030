"""Quantized KV cache storage (the -ctk/-ctv q8_0 / q4_0 analogues).

The reference stores K/V in any of f32/f16/q8_0/q4_0/... block formats
(common.cpp:2044-2054). On TPU the idiomatic equivalent is int8 (KVQ8) or
packed int4 (KVQ4) with a per-(position, head) f32 scale over the head_dim
vector: decode attention is KV-bandwidth-bound, so 1 (or 0.5)
byte/element + 4/128 scale overhead halves (quarters) KV traffic vs bf16
while XLA fuses the dequant multiply into the attention matmuls.

KVQ8 / KVQ4 are pytrees, drop-in where a dense (B, T, H, D) cache array
goes; models/llama.attention_block dispatches on the type.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class KVQ8:
    qs: jax.Array  # int8 (B, T, H, D)
    scale: jax.Array  # f32 (B, T, H, 1)

    def tree_flatten(self):
        return (self.qs, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.qs.shape

    @classmethod
    def zeros(cls, shape, dtype=None) -> "KVQ8":
        return cls(jnp.zeros(shape, jnp.int8),
                   jnp.zeros(tuple(shape[:-1]) + (1,), jnp.float32))

    def astype(self, dtype) -> jax.Array:
        """Materialize dense values (XLA fuses this into the consumer)."""
        return (self.qs.astype(jnp.float32) * self.scale).astype(dtype)


@jax.tree_util.register_pytree_node_class
@dataclass
class KVQ4:
    """Packed int4 KV: byte i of the last axis holds elements i (low nibble)
    and i + D/2 (high nibble), values in [-7, 7] offset by 8."""

    qs: jax.Array  # uint8 (B, T, H, D/2)
    scale: jax.Array  # f32 (B, T, H, 1)

    def tree_flatten(self):
        return (self.qs, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return tuple(self.qs.shape[:-1]) + (2 * self.qs.shape[-1],)

    @classmethod
    def zeros(cls, shape, dtype=None) -> "KVQ4":
        # 8 encodes 0 so zero-initialized cells dequantize to 0
        return cls(jnp.full(tuple(shape[:-1]) + (shape[-1] // 2,), 0x88, jnp.uint8),
                   jnp.zeros(tuple(shape[:-1]) + (1,), jnp.float32))

    def astype(self, dtype) -> jax.Array:
        lo = (self.qs & 0x0F).astype(jnp.int32) - 8
        hi = (self.qs >> 4).astype(jnp.int32) - 8
        q = jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)
        return (q * self.scale).astype(dtype)


def quantize_kv4(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., D) -> packed uint4 pairs + f32 scale over the last axis."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = amax / 7.0
    inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-30), 0.0)
    q = jnp.clip(jnp.round(xf * inv), -7, 7).astype(jnp.int32) + 8
    d = x.shape[-1]
    lo = q[..., : d // 2]
    hi = q[..., d // 2 :]
    return (lo | (hi << 4)).astype(jnp.uint8), scale


def quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., D) -> int8 quants + f32 scale over the last axis."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-30), 0.0)
    q = jnp.clip(jnp.round(xf * inv), -127, 127).astype(jnp.int8)
    return q, scale


def _write(cache: jax.Array, new: jax.Array, cache_pos: jax.Array):
    """Per-row dynamic write. On TPU this MUST be the in-place Pallas DMA:
    the XLA route (vmap of dynamic_update_slice) lowers to a select fusion
    that rewrites the whole cache buffer plus carry copies — ~3 full-buffer
    passes per cache per layer per decode token (see ops/kv_pallas.py)."""
    from .kv_pallas import kv_write, kv_write_eligible

    if kv_write_eligible(cache):
        return kv_write(cache, new, cache_pos)
    upd = jax.vmap(
        lambda c, u, p: jax.lax.dynamic_update_slice(
            c, u, (p,) + (0,) * (c.ndim - 1)))
    return upd(cache, new.astype(cache.dtype), cache_pos)


def update_kv(cache, new: jax.Array, cache_pos: jax.Array):
    """Write `new` (B, S, H, D) at per-row positions; dense, KVQ8 or KVQ4."""
    if isinstance(cache, KVQ8):
        q, s = quantize_kv(new)
        return KVQ8(_write(cache.qs, q, cache_pos),
                    _write(cache.scale, s, cache_pos))
    if isinstance(cache, KVQ4):
        q, s = quantize_kv4(new)
        return KVQ4(_write(cache.qs, q, cache_pos),
                    _write(cache.scale, s, cache_pos))
    return _write(cache, new.astype(cache.dtype), cache_pos)


def kv_seq_len(cache) -> int:
    return cache.qs.shape[1] if isinstance(cache, (KVQ8, KVQ4)) else cache.shape[1]


def update_kv_sp(cache, new: jax.Array, cache_pos: jax.Array, offset):
    """Sequence-parallel write: `cache` holds THIS shard's (B, T_loc, H, D)
    slice covering global cells [offset, offset + T_loc); positions outside
    the shard are dropped (scatter mode='drop'), so a prefill chunk that
    straddles two shards writes each part on its owner. cache_pos (B,) is
    the GLOBAL write position."""
    s = new.shape[1]
    idx = (cache_pos[:, None] + jnp.arange(s, dtype=cache_pos.dtype)
           - offset)  # (B, S) shard-local rows, OOB = not ours
    # negative indices would WRAP under jax indexing — push them far out
    # of range so mode='drop' discards them
    idx = jnp.where(idx < 0, jnp.iinfo(jnp.int32).max, idx)

    def upd(c, n):
        return jax.vmap(
            lambda cr, nr, ir: cr.at[ir].set(nr, mode="drop"))(c, n, idx)

    if isinstance(cache, KVQ8):
        q, sc = quantize_kv(new)
        return KVQ8(upd(cache.qs, q), upd(cache.scale, sc))
    if isinstance(cache, KVQ4):
        q, sc = quantize_kv4(new)
        return KVQ4(upd(cache.qs, q), upd(cache.scale, sc))
    return upd(cache, new.astype(cache.dtype))
