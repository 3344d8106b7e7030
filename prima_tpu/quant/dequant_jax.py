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
    # packed affine codes (kperm grouped formats with mins, e.g. Q4_K):
    #   scales u8 (rows, S)   = sc_code | (mn_code >> 4) << 6
    #   mins   u8 (rows, S/2) = mn_lo4[s] | mn_lo4[s + S/2] << 4
    #   d      i32 (rows, G)  = f16_bits(dmin) << 16 | f16_bits(d)
    # -> 4.5 bits/weight for Q4_K, the native GGUF footprint
    packed: bool = False

    def tree_flatten(self):
        children = (self.qs, self.scales, self.mins, self.d, self.dmin)
        aux = (self.sub, self.layout, self.q_offset, self.shape, self.kperm,
               self.gsub, self.packed)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        qs, scales, mins, d, dmin = children
        sub, layout, q_offset, shape, kperm, gsub, packed = aux
        return cls(qs, scales, mins, sub, layout, q_offset, shape, kperm,
                   d, dmin, gsub, packed)

    @classmethod
    def from_host(
        cls, uq: UQTensor, device=None, sharding=None, pallas: bool = True
    ) -> "QTensor":
        qs, scales, mins, d, dmin, kperm, packed = host_pack(uq, pallas)
        put = partial(jax.device_put, device=sharding if sharding is not None else device)
        opt = lambda a: put(a) if a is not None else None
        return cls(
            qs=put(qs),
            scales=put(scales),
            mins=opt(mins),
            sub=uq.sub,
            layout=uq.layout,
            q_offset=uq.q_offset,
            shape=uq.shape,
            kperm=kperm,
            d=opt(d),
            dmin=opt(dmin),
            gsub=uq.gsub,
            packed=packed,
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
            packed=self.packed,
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
    packed = (kperm and int(ggml_type) == 12 and (k // sub) % 16 == 0)
    res = native_convert(raw, ggml_type, k, kperm, packed)
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
        packed=packed,
    )


def host_pack(uq: UQTensor, pallas: bool = True):
    """Host-side kernel packing: returns
    (qs, scales, mins, d, dmin, kperm, packed).

    When the shape is Pallas-eligible, columns are permuted to
    p = t*S + sigma(s), sigma(s) = (s % gsub)*G + s // gsub (see
    quant/pallas/qmatmul.py), so BOTH the in-kernel code expansion and the
    group-base expansion are lane-aligned tile repeats. Grouped scale/min
    code rows are stored in the same sigma order.

    Grouped formats WITH mins additionally pack to the native footprint
    (Q4_K: 4.5 bits/weight): 6-bit sc/mn codes in 1.5 bytes per sub-block
    and the f16 d/dmin bit-pair in one i32 per superblock; the kernel
    unpacks with exact integer ops.
    """
    from .pallas.qmatmul import pallas_eligible, permute_cols_np, permute_subs_np
    from .device_format import unpack_nib4

    if not (pallas and pallas_eligible(uq.shape, uq.sub, uq.layout, uq.gsub)):
        return uq.qs, uq.scales, uq.mins, uq.d, uq.dmin, False, False
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

    d, dmin = uq.d, uq.dmin
    packed = (uq.gsub > 1 and mins is not None and dmin is not None
              and scales.dtype == np.int8 and scales.shape[-1] % 16 == 0)
    if packed:
        sc = scales.astype(np.uint8)
        mn = mins.astype(np.uint8)
        s_half = sc.shape[-1] // 2
        scales = (sc | ((mn >> 4) << 6)).astype(np.uint8)
        mins = ((mn[..., :s_half] & 0x0F)
                | ((mn[..., s_half:] & 0x0F) << 4)).astype(np.uint8)
        d16 = d.astype(np.float16).view(np.uint16).astype(np.uint32)
        dm16 = dmin.astype(np.float16).view(np.uint16).astype(np.uint32)
        d = ((dm16 << 16) | d16).view(np.int32)
        dmin = None
    return qs, scales, mins, d, dmin, True, packed


def _unpack_q(qt: QTensor, qs: jax.Array) -> jax.Array:
    """Raw storage -> integer quants in storage-column order, as f32."""
    if qt.layout == "nib4":
        lo = (qs & 0x0F).astype(jnp.int8) + qt.q_offset
        hi = (qs >> 4).astype(jnp.int8) + qt.q_offset
        return jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)
    return qs.astype(jnp.float32)


def _unpack_f16_bits(bits: jax.Array) -> jax.Array:
    """Exact f16-bit-pattern -> f32 (int ops only; subnormals handled)."""
    u16 = bits.astype(jnp.uint16)
    return jax.lax.bitcast_convert_type(u16, jnp.float16).astype(jnp.float32)


def _eff_scales(qt: QTensor, scales, mins, d, dmin):
    """Grouped codes -> effective f32 per-sub-block (scales, mins).

    The d*code multiply happens here in f32 — the identical rounding the
    reference applies on the host (ggml-quants.c:2555 `d * sc`)."""
    if qt.gsub == 1:
        return scales, mins
    g = qt.gsub
    if qt.packed:  # unpack 6-bit codes + f16 base pairs (host_pack docstring)
        a1 = scales.astype(jnp.int32)
        a2 = mins.astype(jnp.int32)
        sc_code = (a1 & 63).astype(jnp.float32)
        mn_code = (((a1 >> 6) << 4)
                   | jnp.concatenate([a2 & 15, a2 >> 4], axis=-1)
                   ).astype(jnp.float32)
        du = jax.lax.bitcast_convert_type(d.astype(jnp.int32), jnp.uint32)
        d_f = _unpack_f16_bits(du & 0xFFFF)
        dm_f = _unpack_f16_bits(du >> 16)
        scales, mins, d, dmin = sc_code, mn_code, d_f, dm_f
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
