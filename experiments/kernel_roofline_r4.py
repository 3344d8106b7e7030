"""Round-4: what bounds the fused dequant-GEMV — DMA or VPU?

The production kernel streams nib4 bytes and spends VPU ops per byte on
unpack (int32 cast, mask, shift) + scale multiply + bf16 casts. If those
ops, not the HBM stream, set the pace, there is real headroom (move the
scaling into the dot / cheaper unpack). This experiment measures, on one
ffn-shaped weight, in the same throttle window:
  raw      — pure strided read of the same bytes (DMA ceiling)
  nodeq    — dot with raw bytes cast to bf16 (no unpack, no scales)
  unpack   — dot with (b & 0xF) only (unpack, no scales)
  full     — the production qmatmul_pallas

Prints one JSON line with GB/s per variant.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def variant_kernel(x_ref, qs_ref, o_ref, *, mode):
    kt = pl.program_id(1)
    b = qs_ref[:].astype(jnp.int32)
    if mode == "nodeq":
        w = b.astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            x_ref[:].astype(jnp.bfloat16), w,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:  # unpack
        lo = (b & 0x0F).astype(jnp.bfloat16)
        hi = (b >> 4).astype(jnp.bfloat16)
        xx = x_ref[:].astype(jnp.bfloat16)
        acc = jax.lax.dot_general(xx, lo, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(xx, hi, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    @pl.when(kt == 0)
    def _():
        o_ref[:] = acc

    @pl.when(kt != 0)
    def _():
        o_ref[:] = o_ref[:] + acc


def build_variant(n, kb, n_tile, kb_tile, mode):
    # cap the tile byte area like the production kernel (qmatmul._pick_tiles)
    # or Mosaic blows scoped VMEM on the down shapes (512 x 7168 tile + two
    # bf16 nibble intermediates)
    while n_tile > 8 and n_tile * kb_tile > 2 * 1024 * 1024:
        n_tile //= 2
    grid = (n // n_tile, kb // kb_tile)
    return pl.pallas_call(
        functools.partial(variant_kernel, mode=mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, kb_tile), lambda nt, kt: (0, kt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tile, kb_tile), lambda nt, kt: (nt, kt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, n_tile), lambda nt, kt: (0, nt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )


def time_fn(f, *args, iters=3):
    _ = jax.block_until_ready(f(*args))
    v = float(np.asarray(jax.device_get(f(*args))).ravel()[0])  # sync
    best = float("inf")
    for _i in range(iters):
        t0 = time.perf_counter()
        _ = float(np.asarray(jax.device_get(f(*args))).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def run_shape(n, k):
    from prima_tpu.gguf.constants import GGMLType
    from prima_tpu.models.llama import synth_qtensor_device
    from prima_tpu.quant.pallas.qmatmul import qmatmul_pallas

    kb = k // 2
    n_tile = 512 if n % 512 == 0 else 256
    kb_tile = kb  # single k-tile for these ffn shapes
    qt = jax.jit(lambda: synth_qtensor_device(jax.random.PRNGKey(0), n, k,
                                              GGMLType.Q4_K))()
    jax.block_until_ready(qt.qs)
    qs = qt.qs  # (n, kb) u8 kernel-packed
    x8 = jnp.ones((8, kb), jnp.bfloat16)
    xf = jnp.ones((1, k), jnp.float32)
    ITERS = int(os.environ.get("PRIMA_ROOFLINE_ITERS", "64"))

    report = {"shape": [n, k], "iters": ITERS}

    # raw read
    @jax.jit
    def raw(qs):
        def body(i, acc):
            q, acc = jax.lax.optimization_barrier((qs, acc))
            return acc + jnp.sum(q, dtype=jnp.int32).astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))[None]

    dt = time_fn(raw, qs)
    report["raw_gbs"] = round(qs.size * ITERS / dt / 1e9, 1)

    # pallas variants
    for mode in ("nodeq", "unpack"):
        call = build_variant(n, kb, n_tile, kb_tile, mode)

        @jax.jit
        def many(x, qs, call=call):
            def body(i, acc):
                xx, acc = jax.lax.optimization_barrier((x, acc))
                return acc + call(xx, qs)
            return jax.lax.fori_loop(0, ITERS, body,
                                     jnp.zeros((8, n), jnp.float32))

        dt = time_fn(many, x8, qs)
        report[f"{mode}_gbs"] = round(qs.size * ITERS / dt / 1e9, 1)

    # production kernel
    @jax.jit
    def full(x, qs, scales, mins, d, dmin):
        import dataclasses

        q2 = dataclasses.replace(qt, qs=qs, scales=scales, mins=mins, d=d,
                                 dmin=dmin)

        def body(i, acc):
            xx, acc = jax.lax.optimization_barrier((x, acc))
            return acc + qmatmul_pallas(xx, q2).astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body,
                                 jnp.zeros((1, n), jnp.float32))

    qb = sum(a.size * a.dtype.itemsize for a in
             (qt.qs, qt.scales, qt.mins, qt.d, qt.dmin) if a is not None)
    dt = time_fn(full, xf, qt.qs, qt.scales, qt.mins, qt.d, qt.dmin)
    report["full_gbs"] = round(qb * ITERS / dt / 1e9, 1)
    return report


def main():
    out = []
    for n, k in ((28672, 4096), (27648, 5120)):
        out.append(run_shape(n, k))
        print(json.dumps(out[-1]), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
