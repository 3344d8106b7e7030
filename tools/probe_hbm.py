"""Dedicated HBM read-bandwidth probes: what can THIS machine stream right
now? Disambiguates kernel quality from machine throttle (the shared TPU
swings 2-10x): if the pure-streaming Pallas kernel tops out near the
decode path's ~270 GB/s effective, the machine is the ceiling; if it hits
600+ GB/s, the fused dequant-GEMV has headroom.

Probes (all one pallas_call / one jit, value-readback synchronized):
  * pallas u8 stream   — grid over 1MB tiles of a 2 GB uint8 array
  * pallas f32 stream  — same bytes as f32 (no convert cost)
  * xla f32 reduce     — jnp.sum over the same array (XLA's own pipeline)
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stream_kernel(x_ref, o_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    # touch a strided subset so the VPU cost is negligible; the DMA fetches
    # the whole block regardless (BlockSpec-driven pipeline)
    # touch a small contiguous slice (no u8->f32 cast in Mosaic: via int32;
    # strided loads unsupported for i8, so read the leading lanes)
    o_ref[:] += x_ref[:, : o_ref.shape[1]].astype(jnp.int32).astype(jnp.float32)


def pallas_stream_gbs(dtype, total_bytes=2 << 30, tile_bytes=2 << 20):
    itemsize = np.dtype(dtype).itemsize
    cols = 4096 // itemsize * 2  # 8192 u8 / 2048 f32 per row
    rows_per_tile = tile_bytes // (cols * itemsize)
    rows = total_bytes // (cols * itemsize)
    rows = rows // rows_per_tile * rows_per_tile
    x = jnp.ones((rows, cols), dtype)
    grid = (rows // rows_per_tile,)

    out = pl.pallas_call(
        _stream_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((rows_per_tile, cols), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows_per_tile, cols // 512),
                               lambda t: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_per_tile, cols // 512),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )

    f = jax.jit(lambda x: jnp.sum(out(x)))
    _ = float(f(x))  # compile
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(f(x))
        best = min(best, time.perf_counter() - t0)
    return rows * cols * itemsize / best / 1e9


def xla_reduce_gbs(total_bytes=2 << 30):
    n = total_bytes // 4
    x = jnp.ones((n,), jnp.float32)
    f = jax.jit(lambda x: jnp.sum(x))
    _ = float(f(x))
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(f(x))
        best = min(best, time.perf_counter() - t0)
    return n * 4 / best / 1e9


def main():
    report = {}
    for name, fn in [
        ("pallas_u8_gbs", lambda: pallas_stream_gbs(jnp.uint8)),
        ("pallas_f32_gbs", lambda: pallas_stream_gbs(jnp.float32)),
        ("xla_f32_reduce_gbs", lambda: xla_reduce_gbs()),
        ("qmm_indep_gbs", lambda: qmm_stream_gbs(chained=False)),
        ("qmm_chained_gbs", lambda: qmm_stream_gbs(chained=True)),
    ]:
        t0 = time.perf_counter()
        report[name] = round(fn(), 1)
        print(f"[{name}] {report[name]} GB/s "
              f"({time.perf_counter()-t0:.1f}s)", flush=True)
    print(json.dumps(report))


def qmm_stream_gbs(n_tensors=16, chained=False):
    """Aggregate streaming rate of the fused Q4_K GEMV over n_tensors
    DISTINCT ffn-shaped weights in one jit — no carry chain (unless
    chained=True), so kernels pipeline back-to-back like a model layer."""
    from prima_tpu.gguf.constants import GGMLType
    from prima_tpu.models.llama import synth_qtensor_device
    from prima_tpu.quant.pallas.qmatmul import qmatmul_pallas

    n, k = 14336, 4096
    qts = [synth_qtensor_device(jax.random.PRNGKey(i), n, k, GGMLType.Q4_K)
           for i in range(n_tensors)]
    jax.block_until_ready(qts[-1].qs)
    qb = sum(a.size * a.dtype.itemsize for qt in qts
             for a in (qt.qs, qt.scales, qt.mins, qt.d, qt.dmin)
             if a is not None)

    @jax.jit
    def run_indep(x, *qts):
        acc = jnp.float32(0)
        for qt in qts:
            acc += qmatmul_pallas(x, qt, out_dtype=jnp.float32).sum()
        return acc

    @jax.jit
    def run_chain(x, *qts):
        for qt in qts:
            y = qmatmul_pallas(x, qt, out_dtype=jnp.float32)
            x = y[..., :k] * 1e-3
        return x.sum()

    f = run_chain if chained else run_indep
    x = jnp.ones((1, k), jnp.float32)
    _ = float(f(x, *qts))
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(f(x, *qts))
        best = min(best, time.perf_counter() - t0)
    return qb / best / 1e9


if __name__ == "__main__":
    main()
