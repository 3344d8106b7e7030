"""Microbench: qmatmul kernel GB/s vs raw-read GB/s on the same buffers."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.models.llama import synth_qtensor_device
from prima_tpu.quant.pallas.qmatmul import qmatmul_pallas

N, K = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (14336, 4096)
print("device:", jax.devices()[0].device_kind, f" shape ({N}, {K})")

qt = jax.jit(lambda: synth_qtensor_device(jax.random.PRNGKey(0), N, K, GGMLType.Q4_K))()
jax.block_until_ready(qt.qs)
x = jnp.ones((1, K), jnp.float32)

ITERS = 300


@jax.jit
def many_qmm(x, qs, scales, mins, d, dmin):
    import dataclasses
    q2 = dataclasses.replace(qt, qs=qs, scales=scales, mins=mins, d=d, dmin=dmin)
    def body(i, acc):
        return acc + qmatmul_pallas(x * (1.0 + acc[0, :1] * 0), q2).astype(jnp.float32)
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((1, N), jnp.float32))


@jax.jit
def many_read(qs, scales, mins):
    def body(i, acc):
        z = (acc * 0).astype(qs.dtype)
        s = jnp.sum((qs + z[None, None]).astype(jnp.int32)).astype(jnp.float32)
        s += jnp.sum(scales.astype(jnp.float32)) + jnp.sum(mins.astype(jnp.float32))
        return acc + s
    return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))


nbytes = qt.nbytes
print(f"weight bytes: {nbytes/1e6:.1f} MB  ({nbytes*8/(N*K):.2f} bits/w)")

args = (qt.qs, qt.scales, qt.mins, qt.d, qt.dmin)
_ = float(many_qmm(x, *args).sum())
ts = []
for _i in range(5):
    t0 = time.perf_counter()
    _ = float(many_qmm(x, *args).sum())
    ts.append(time.perf_counter() - t0)
dt = sorted(ts)[2]
print(f"qmm: {ITERS*nbytes/dt/1e9:.1f} GB/s  ({dt/ITERS*1e3:.3f} ms/call)")

_ = float(many_read(qt.qs, qt.scales, qt.mins))
ts = []
for _i in range(5):
    t0 = time.perf_counter()
    _ = float(many_read(qt.qs, qt.scales, qt.mins))
    ts.append(time.perf_counter() - t0)
dt = sorted(ts)[2]
rb = qt.qs.nbytes + qt.scales.nbytes + qt.mins.nbytes
print(f"raw read: {ITERS*rb/dt/1e9:.1f} GB/s  ({dt/ITERS*1e3:.3f} ms/call)")
