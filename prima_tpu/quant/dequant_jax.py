"""XLA-level dequantization of the uniform quant layout.

This is the correctness-reference compute path: dequantize a QTensor to
f32/bf16 with jnp ops (bit-identical to dequant_np for f32), letting XLA
fuse the dequant into consumers. The performance path (fused dequant-matmul
without materializing the f32 weight) lives in quant/pallas/.

QTensors may be kernel-packed (kperm=True): weight columns permuted to
p = t*S + s so the Pallas kernel's scale expansion is a lane-aligned tile
repeat (see quant/pallas/qmatmul.py). All XLA paths here understand both
orders; dequant() always returns natural column order.
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
    """Device-side uniform quantized tensor (pytree of jax arrays).

    Grouped scales (gsub > 1, the K-quant superblock structure): `scales` /
    `mins` hold int8 codes (rows, S) and `d`/`dmin` hold f32 per-group bases
    (rows, S // gsub); the effective sub-block scale d[s // gsub] * code[s]
    is multiplied in f32 on device (bit-identical to the host premultiply,
    ~25% less HBM traffic for Q4_K). gsub == 1 is the flat form: `scales` /
    `mins` are the effective f32 values, `d`/`dmin` are None.
    """

    qs: jax.Array
    scales: jax.Array
    mins: jax.Array | None
    sub: int
    layout: str
    q_offset: int
    shape: tuple[int, int]
    kperm: bool = False
    d: jax.Array | None = None
    dmin: jax.Array | None = None
    gsub: int = 1

    def tree_flatten(self):
        children = (self.qs, self.scales, self.mins, self.d, self.dmin)
        aux = (self.sub, self.layout, self.q_offset, self.shape, self.kperm,
               self.gsub)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        qs, scales, mins, d, dmin = children
        sub, layout, q_offset, shape, kperm, gsub = aux
        return cls(qs, scales, mins, sub, layout, q_offset, shape, kperm,
                   d, dmin, gsub)

    @classmethod
    def from_host(
        cls, uq: UQTensor, device=None, sharding=None, pallas: bool = True
    ) -> "QTensor":
        qs, scales, mins, kperm = host_pack(uq, pallas)
        put = partial(jax.device_put, device=sharding if sharding is not None else device)
        return cls(
            qs=put(qs),
            scales=put(scales),
            mins=put(mins) if mins is not None else None,
            sub=uq.sub,
            layout=uq.layout,
            q_offset=uq.q_offset,
            shape=uq.shape,
            kperm=kperm,
            d=put(uq.d) if uq.d is not None else None,
            dmin=put(uq.dmin) if uq.dmin is not None else None,
            gsub=uq.gsub,
        )

    @property
    def nbytes(self) -> int:
        n = 0
        for a in (self.qs, self.scales, self.mins, self.d, self.dmin):
            if a is not None:
                n += a.size * a.dtype.itemsize
        return n

    # Shapes derived from the arrays, NOT the static aux `shape`: inside
    # shard_map / after slicing, the arrays are the per-shard view while the
    # aux still records the full logical tensor.
    @property
    def n_rows(self) -> int:
        return self.qs.shape[-2]

    @property
    def n_cols(self) -> int:
        return self.sub * self.scales.shape[-1]

    def __getitem__(self, idx) -> "QTensor":
        """Index leading (stacked-shard) axes; quant metadata is preserved."""
        return QTensor(
            qs=self.qs[idx],
            scales=self.scales[idx],
            mins=self.mins[idx] if self.mins is not None else None,
            sub=self.sub,
            layout=self.layout,
            q_offset=self.q_offset,
            shape=self.shape,
            kperm=self.kperm,
            d=self.d[idx] if self.d is not None else None,
            dmin=self.dmin[idx] if self.dmin is not None else None,
            gsub=self.gsub,
        )


_NATIVE_META = {
    # ggml_type -> (sub, layout, q_offset, gsub)
    12: (32, "nib4", 0, 8),    # Q4_K (grouped superblock codes)
    2: (32, "nib4", -8, 1),    # Q4_0
    14: (16, "int8", 0, 16),   # Q6_K (grouped superblock codes)
    8: (32, "int8", 0, 1),     # Q8_0
}


def qtensor_from_raw(raw: np.ndarray, ggml_type, shape: tuple[int, int],
                     device=None, sharding=None, pallas: bool = True) -> "QTensor | None":
    """Fused native (C++) GGUF-block -> kernel-packed QTensor path. Returns
    None when the type has no native converter (caller falls back to the
    numpy UQTensor pipeline). Bit-exact with that pipeline."""
    from functools import partial as _partial

    from ..native import native_convert
    from .pallas.qmatmul import pallas_eligible

    meta = _NATIVE_META.get(int(ggml_type))
    if meta is None:
        return None
    sub, layout, q_offset, gsub = meta
    rows, k = shape
    kperm = pallas and pallas_eligible((rows, k), sub, layout, gsub)
    res = native_convert(raw, ggml_type, k, kperm)
    if res is None:
        return None
    qs, scales, mins, d, dmin = res
    put = _partial(jax.device_put, device=sharding if sharding is not None else device)
    return QTensor(
        qs=put(qs), scales=put(scales),
        mins=put(mins) if mins is not None else None,
        sub=sub, layout=layout, q_offset=q_offset, shape=(rows, k), kperm=kperm,
        d=put(d) if d is not None else None,
        dmin=put(dmin) if dmin is not None else None,
        gsub=gsub,
    )


def host_pack(uq: UQTensor, pallas: bool = True):
    """Host-side kernel packing: returns (qs, scales, mins, kperm).

    When the shape is Pallas-eligible, columns are permuted to
    p = t*S + sigma(s), sigma(s) = (s % gsub)*G + s // gsub (see
    quant/pallas/qmatmul.py), so BOTH the in-kernel code expansion and the
    group-base expansion are lane-aligned tile repeats. Grouped scale/min
    code rows are stored in the same sigma order.
    """
    from .pallas.qmatmul import pallas_eligible, permute_cols_np, permute_subs_np
    from .device_format import unpack_nib4

    if not (pallas and pallas_eligible(uq.shape, uq.sub, uq.layout, uq.gsub)):
        return uq.qs, uq.scales, uq.mins, False
    scales = permute_subs_np(uq.scales, uq.gsub)
    mins = permute_subs_np(uq.mins, uq.gsub) if uq.mins is not None else None
    if uq.layout == "nib4":
        # unpack (raw nibbles), permute columns, repack canonically
        raw = unpack_nib4(uq.qs, 0).astype(np.uint8)
        rawp = permute_cols_np(raw, uq.sub, uq.gsub)
        half = uq.shape[1] // 2
        qs = (rawp[:, :half] | (rawp[:, half:] << 4)).astype(np.uint8)
    else:
        qs = permute_cols_np(uq.qs, uq.sub, uq.gsub)
    return qs, scales, mins, True


def _unpack_q(qt: QTensor, qs: jax.Array) -> jax.Array:
    """Raw storage -> integer quants in storage-column order, as f32."""
    if qt.layout == "nib4":
        lo = (qs & 0x0F).astype(jnp.int8) + qt.q_offset
        hi = (qs >> 4).astype(jnp.int8) + qt.q_offset
        return jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)
    return qs.astype(jnp.float32)


def _eff_scales(qt: QTensor, scales, mins, d, dmin):
    """Grouped codes -> effective f32 per-sub-block (scales, mins).

    The d*code multiply happens here in f32 — the identical rounding the
    reference applies on the host (ggml-quants.c:2555 `d * sc`)."""
    if qt.gsub == 1:
        return scales, mins
    g = qt.gsub
    if qt.kperm:  # sigma order: group index = s' mod G -> lane tile
        exp = lambda b: jnp.tile(b, (1,) * (b.ndim - 1) + (g,))
    else:  # natural order: group index = s // gsub -> elementwise repeat
        s = scales.shape[-1]
        exp = lambda b: jnp.repeat(b, g, axis=-1, total_repeat_length=s)
    sc = exp(d) * scales.astype(jnp.float32)
    mn = exp(dmin) * mins.astype(jnp.float32) if mins is not None else None
    return sc, mn


def _dequant_any(qt: QTensor, qs, scales, mins, d, dmin, dtype) -> jax.Array:
    """Dequant with arbitrary leading dims; returns natural column order."""
    scales, mins = _eff_scales(qt, scales, mins, d, dmin)
    s = scales.shape[-1]
    k = s * qt.sub
    q = _unpack_q(qt, qs)
    if qt.kperm:
        sc = jnp.tile(scales, (1,) * (scales.ndim - 1) + (qt.sub,))
        y = sc * q
        if mins is not None:
            y = y - jnp.tile(mins, (1,) * (mins.ndim - 1) + (qt.sub,))
        # inverse permutation p = t*S + (s%gsub)*G + s//gsub -> c = s*sub + t
        g = qt.gsub
        y = (
            y.reshape(y.shape[:-1] + (qt.sub, g, s // g))
            .swapaxes(-1, -3)
            .reshape(y.shape)
        )
    else:
        sc = jnp.repeat(scales, qt.sub, axis=-1, total_repeat_length=k)
        y = sc * q
        if mins is not None:
            y = y - jnp.repeat(mins, qt.sub, axis=-1, total_repeat_length=k)
    return y.astype(dtype)


def dequant(qt: QTensor, dtype=jnp.float32) -> jax.Array:
    """Materialize the full weight matrix (rows, K) in `dtype`, natural order."""
    return _dequant_any(qt, qt.qs, qt.scales, qt.mins, qt.d, qt.dmin, dtype)


def dequant_rows(qt: QTensor, row_ids: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Gather rows then dequant (embedding lookup): (..., K) in natural order."""
    qs = qt.qs[row_ids]
    scales = qt.scales[row_ids]
    mins = qt.mins[row_ids] if qt.mins is not None else None
    d = qt.d[row_ids] if qt.d is not None else None
    dmin = qt.dmin[row_ids] if qt.dmin is not None else None
    return _dequant_any(qt, qs, scales, mins, d, dmin, dtype)


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
