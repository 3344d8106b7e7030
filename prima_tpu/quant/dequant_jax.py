"""XLA-level dequantization of the uniform quant layout.

This is the correctness-reference compute path: dequantize a UQTensor to
f32/bf16 with jnp ops (bit-identical to dequant_np for f32), letting XLA
fuse the dequant into consumers. The performance path (fused dequant-matmul
without materializing the f32 weight) lives in quant/pallas/.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .device_format import UQTensor


@jax.tree_util.register_pytree_node_class
@dataclass
class QTensor:
    """Device-side uniform quantized tensor (pytree of jax arrays)."""

    qs: jax.Array
    scales: jax.Array
    mins: jax.Array | None
    sub: int
    layout: str
    q_offset: int
    shape: tuple[int, int]

    def tree_flatten(self):
        children = (self.qs, self.scales, self.mins)
        aux = (self.sub, self.layout, self.q_offset, self.shape)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        qs, scales, mins = children
        sub, layout, q_offset, shape = aux
        return cls(qs, scales, mins, sub, layout, q_offset, shape)

    @classmethod
    def from_host(cls, uq: UQTensor, device=None, sharding=None) -> "QTensor":
        put = partial(jax.device_put, device=sharding if sharding is not None else device)
        return cls(
            qs=put(uq.qs),
            scales=put(uq.scales),
            mins=put(uq.mins) if uq.mins is not None else None,
            sub=uq.sub,
            layout=uq.layout,
            q_offset=uq.q_offset,
            shape=uq.shape,
        )

    @property
    def nbytes(self) -> int:
        n = self.qs.size * self.qs.dtype.itemsize + self.scales.size * 4
        if self.mins is not None:
            n += self.mins.size * 4
        return n


def dequant(qt: QTensor, dtype=jnp.float32) -> jax.Array:
    """Materialize the full weight matrix (rows, K) in `dtype`."""
    rows, k = qt.shape
    if qt.layout == "nib4":
        lo = (qt.qs & 0x0F).astype(jnp.int8) + qt.q_offset
        hi = (qt.qs >> 4).astype(jnp.int8) + qt.q_offset
        q = jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)
    else:
        q = qt.qs.astype(jnp.float32)
    n_sub = k // qt.sub
    scales = jnp.repeat(qt.scales, qt.sub, axis=1, total_repeat_length=k)
    y = scales * q
    if qt.mins is not None:
        mins = jnp.repeat(qt.mins, qt.sub, axis=1, total_repeat_length=k)
        y = y - mins
    del n_sub
    return y.astype(dtype)


def qmatmul_xla(x: jax.Array, qt: QTensor, out_dtype=None) -> jax.Array:
    """x @ W^T via XLA with on-the-fly dequant. x: (..., K) -> (..., rows).

    Reference semantics: GGUF matmul weights are (rows=n_out, K=n_in) with
    quantization along K (ggml_mul_mat convention, ggml/src/ggml.c).
    """
    w = dequant(qt, dtype=x.dtype)
    out = jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return out.astype(out_dtype or x.dtype)


def dequant_rows_np_check(qt: QTensor) -> np.ndarray:
    """Convenience: pull back to host and dequantize (tests only)."""
    return np.asarray(dequant(qt, jnp.float32))
