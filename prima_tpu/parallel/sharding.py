"""Host-side sharding of quantized tensors.

The TPU replacement for the reference's rank-filtered tensor loading
(llm_load_tensors_impl src/llama.cpp:7554): sharding decisions are made at
load time on the host, where GGUF blocks can be split along rows or columns
in *natural* order and then kernel-packed per shard. Each shard is a complete
standalone UQTensor, so the fused Pallas dequant-matmul runs unmodified on
every device — no in-kernel awareness of the mesh.

Shards are stacked along a leading device axis and placed with a
NamedSharding, so inside shard_map each device sees exactly its own
(1, ...) slice (squeeze with QTensor.__getitem__).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..quant.device_format import UQTensor, unpack_nib4, _pack_nib4
from ..quant.dequant_jax import QTensor, host_pack


# ---------------------------------------------------------------------------
# UQTensor splitting (host, natural column order)
# ---------------------------------------------------------------------------


def shard_uq_rows(uq: UQTensor, n: int) -> list[UQTensor]:
    """Split along output rows (row-parallel linear: y features sharded)."""
    rows, k = uq.shape
    assert rows % n == 0, f"rows {rows} not divisible by {n}"
    r = rows // n
    out = []
    for i in range(n):
        sl = slice(i * r, (i + 1) * r)
        out.append(
            UQTensor(
                qs=uq.qs[sl],
                scales=uq.scales[sl],
                mins=uq.mins[sl] if uq.mins is not None else None,
                sub=uq.sub,
                layout=uq.layout,
                q_offset=uq.q_offset,
                ggml_type=uq.ggml_type,
                shape=(r, k),
                d=uq.d[sl] if uq.d is not None else None,
                dmin=uq.dmin[sl] if uq.dmin is not None else None,
                gsub=uq.gsub,
            )
        )
    return out


def shard_uq_cols(uq: UQTensor, n: int) -> list[UQTensor]:
    """Split along input columns (column-parallel linear: psum after).

    nib4 shards are unpacked to raw nibbles, column-sliced, and re-packed
    canonically per shard, so every shard remains a valid standalone nib4
    UQTensor.
    """
    rows, k = uq.shape
    kc = k // n
    assert k % n == 0 and kc % (uq.sub * uq.gsub) == 0, (
        f"K {k} not shardable by {n} (sub={uq.sub}, gsub={uq.gsub})")
    sc = kc // uq.sub
    gc = sc // uq.gsub
    if uq.layout == "nib4":
        raw = unpack_nib4(uq.qs, 0).astype(np.uint8)  # (rows, k) natural order
    out = []
    for i in range(n):
        cols = slice(i * kc, (i + 1) * kc)
        if uq.layout == "nib4":
            qs = _pack_nib4(np.ascontiguousarray(raw[:, cols]))
        else:
            qs = np.ascontiguousarray(uq.qs[:, cols])

        def _cut(a, w):
            return (np.ascontiguousarray(a[:, i * w : (i + 1) * w])
                    if a is not None else None)

        out.append(
            UQTensor(
                qs=qs,
                scales=_cut(uq.scales, sc),
                mins=_cut(uq.mins, sc),
                sub=uq.sub,
                layout=uq.layout,
                q_offset=uq.q_offset,
                ggml_type=uq.ggml_type,
                shape=(rows, kc),
                d=_cut(uq.d, gc),
                dmin=_cut(uq.dmin, gc),
                gsub=uq.gsub,
            )
        )
    return out


# ---------------------------------------------------------------------------
# Device placement of stacked shards
# ---------------------------------------------------------------------------


def _nested_stack(tree, depth: int, fn):
    """Stack a `depth`-nested list of arrays (after mapping fn over leaves)."""
    if depth == 0:
        return fn(tree)
    return np.stack([_nested_stack(t, depth - 1, fn) for t in tree])


def _nested_first(tree, depth: int):
    return tree if depth == 0 else _nested_first(tree[0], depth - 1)


def put_stacked_qtensor(
    shards, mesh: Mesh, axes: tuple[str | None, ...] | str, pallas: bool = True
) -> QTensor:
    """Stack a nested list of shard UQTensors into leading axes sharded over
    `axes` (e.g. ("pp", "tp", None, None) for per-window, per-tp-rank,
    per-cycle, per-layer stacking; None levels are stacked but unsharded).

    All shards must agree on layout/shape. Inside shard_map each device
    indexes its sharded leading axes with [0].
    """
    if isinstance(axes, str):
        axes = (axes,)
    depth = len(axes)
    u0 = _nested_first(shards, depth)

    def stack(get):
        arr = _nested_stack(shards, depth, get)
        spec = P(*axes, *([None] * (arr.ndim - depth)))
        return jax.device_put(arr, NamedSharding(mesh, spec))

    _pk_cache: dict = {}

    def _pk(s):
        r = _pk_cache.get(id(s))
        if r is None:
            r = _pk_cache[id(s)] = host_pack(s, pallas)
        return r

    _, _, _, _, _, kperm, packed = _pk(u0)
    return QTensor(
        qs=stack(lambda s: _pk(s)[0]),
        scales=stack(lambda s: _pk(s)[1]),
        mins=stack(lambda s: _pk(s)[2]) if _pk(u0)[2] is not None else None,
        sub=u0.sub,
        layout=u0.layout,
        q_offset=u0.q_offset,
        shape=u0.shape,  # per-shard logical shape
        kperm=kperm,
        d=stack(lambda s: _pk(s)[3]) if _pk(u0)[3] is not None else None,
        dmin=stack(lambda s: _pk(s)[4]) if _pk(u0)[4] is not None else None,
        gsub=u0.gsub,
        packed=packed,
    )


def put_stacked_dense(arrs, mesh: Mesh, axes: tuple[str | None, ...] | str, dtype=None):
    if isinstance(axes, str):
        axes = (axes,)
    depth = len(axes)
    stacked = _nested_stack(arrs, depth, lambda a: np.asarray(a))
    if dtype is not None:
        stacked = stacked.astype(dtype)
    spec = P(*axes, *([None] * (stacked.ndim - depth)))
    return jax.device_put(stacked, NamedSharding(mesh, spec))


def put_replicated(arr, mesh: Mesh):
    return jax.device_put(arr, NamedSharding(mesh, P()))
