"""In-place KV-cache writer (Pallas).

The XLA route for a per-row dynamic KV write — vmap(dynamic_update_slice)
— lowers on TPU to a select-over-iota FUSION that rewrites the ENTIRE
cache buffer, which XLA then copies twice more around the while-loop carry
(observed in the compiled HLO: ~3 full (B, T, H, D) buffer rewrites per
cache per layer per token — the dominant decode "glue" cost at ~6 ms/token
for an 8B model at T=1024).

This kernel is the TPU-native equivalent of the reference's KV write
(ggml_cpy of the 1-token k/v rows into the cache view, build_llama
src/llama.cpp:11008+): the cache stays in HBM (`pl.ANY`), the new rows sit
in VMEM, and one DMA per batch row copies S·H·D elements to the dynamic
row offset. `input_output_aliases` makes it truly in-place: zero copies,
zero full-buffer traffic.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return os.environ.get("PRIMA_PALLAS_INTERPRET", "0") == "1"


def _kv_write_kernel(pos_ref, new_ref, _cache_in, out_ref, sems, *, b: int,
                     s: int):
    for i in range(b):  # B is small and static: unrolled DMA fan-out
        dma = pltpu.make_async_copy(
            new_ref.at[i],                       # (S, H, D) VMEM
            out_ref.at[i, pl.ds(pos_ref[i], s)],  # HBM, dynamic row offset
            sems.at[i],
        )
        dma.start()
    for i in range(b):
        pltpu.make_async_copy(
            new_ref.at[i], out_ref.at[i, pl.ds(pos_ref[i], s)], sems.at[i],
        ).wait()


@functools.lru_cache(maxsize=None)
def _build_kv_write(b: int, s: int, t: int, tail: tuple, dtype: str):
    kernel = functools.partial(_kv_write_kernel, b=b, s=s)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # pos (B,)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # new (B, S, ...)
            pl.BlockSpec(memory_space=pl.ANY),       # cache (B, T, ...)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((b, t) + tail, jnp.dtype(dtype)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((b,))],
        input_output_aliases={2: 0},
        interpret=_interpret(),
    )


def kv_write(cache: jax.Array, new: jax.Array, pos: jax.Array) -> jax.Array:
    """cache (B, T, ...tail) <- new (B, S, ...tail) at per-row offsets
    pos (B,), in place (the caller must treat `cache` as consumed).
    Clamps like dynamic_update_slice: writes start at min(pos, T - S).

    Trailing dims are reshaped to (P/128, 128) — a free bitcast in the
    natural layout — so the two TILED memref dims are always exact
    (Mosaic only tiles the last two dims; slicing any leading dim is
    unconstrained, slicing a padded tiled dim is illegal)."""
    b, t = cache.shape[0], cache.shape[1]
    s = new.shape[1]
    p = 1
    for d in cache.shape[2:]:
        p *= d
    pos = jnp.minimum(pos.astype(jnp.int32), t - s)
    fn = _build_kv_write(b, s, t, (p // 128, 128), str(cache.dtype))
    out = fn(pos, new.astype(cache.dtype).reshape(b, s, p // 128, 128),
             cache.reshape(b, t, p // 128, 128))
    return out.reshape(cache.shape)


def kv_write_eligible(cache) -> bool:
    """The Pallas writer needs a TPU backend (or interpret mode) and a
    lane-aligned trailing axis."""
    if jax.default_backend() != "tpu" and not _interpret():
        return False
    # flattened trailing elems per (b, t) row must tile (8, 128) lanes for
    # a clean DMA; all real configs (H*D multiples of 128) qualify.
    # The second-minor reshaped dim (P/128) must also be a multiple of the
    # 8-sublane tile: at P/128=2 (tiny 256-wide models) Mosaic packs the
    # bf16 memref as (2,128)(2,1) and its DMA decomposition emits an
    # illegal 1-slice of the tiled dim ("Slice shape along dimension 2
    # must be aligned to tiling (2)", seen on real hardware in the r5
    # spec capture); P/128=8 (every production shape) is proven on chip.
    import numpy as np

    tail = int(np.prod(cache.shape[2:]))
    return tail % 128 == 0 and (tail // 128) % 8 == 0
