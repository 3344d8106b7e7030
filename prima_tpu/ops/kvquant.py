"""Quantized KV cache storage (the -ctk/-ctv q8_0 analogue).

The reference stores K/V in any of f32/f16/q8_0/q4_0/... block formats
(common.cpp:2044-2054). On TPU the idiomatic equivalent is int8 with a
per-(position, head) f32 scale over the head_dim vector: decode attention
is KV-bandwidth-bound, so 1 byte/element + 4/128 scale overhead halves KV
traffic vs bf16 while XLA fuses the dequant multiply into the attention
matmuls.

KVQ8 is a pytree, drop-in where a dense (B, T, H, D) cache array goes;
models/llama.attention_block dispatches on the type.
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
        b, t, h, d = shape
        return cls(jnp.zeros(shape, jnp.int8), jnp.zeros((b, t, h, 1), jnp.float32))

    def astype(self, dtype) -> jax.Array:
        """Materialize dense values (XLA fuses this into the consumer)."""
        return (self.qs.astype(jnp.float32) * self.scale).astype(dtype)


def quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., D) -> int8 quants + f32 scale over the last axis."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-30), 0.0)
    q = jnp.clip(jnp.round(xf * inv), -127, 127).astype(jnp.int8)
    return q, scale


def update_kv(cache, new: jax.Array, cache_pos: jax.Array):
    """Write `new` (B, S, H, D) at per-row positions; dense or KVQ8."""
    if isinstance(cache, KVQ8):
        q, s = quantize_kv(new)
        upd = jax.vmap(lambda c, u, p: jax.lax.dynamic_update_slice(c, u, (p, 0, 0)))
        return KVQ8(upd(cache.qs, q, cache_pos), upd(cache.scale, s, cache_pos))
    upd = jax.vmap(lambda c, u, p: jax.lax.dynamic_update_slice(c, u, (p, 0, 0)))
    return upd(cache, new.astype(cache.dtype), cache_pos)


def kv_seq_len(cache) -> int:
    return cache.qs.shape[1] if isinstance(cache, KVQ8) else cache.shape[1]
