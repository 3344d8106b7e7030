"""Try to capture a device trace of the full decode step (round 3).

If the tunneled axon runtime supports jax.profiler, the trace names+times
make the glue breakdown obvious. Falls back gracefully.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.models.config import tiny_config
from prima_tpu.models.llama import (ForwardOptions, forward, init_kv_caches,
                                    synth_params_device_stacked)

cfg = tiny_config(n_layers=8, n_embd=4096, n_heads=32, n_kv_heads=8,
                  head_dim=128, n_ff=14336, n_vocab=128256,
                  n_ctx_train=8192, rope_base=500000.0, rope_dim=128)

stacked = jax.jit(functools.partial(
    synth_params_device_stacked, cfg, GGMLType.Q4_K, fused=True))()
jax.block_until_ready(jax.tree.leaves(stacked)[0])

def unstack(st):
    layers = [jax.tree.map(lambda a: a[i], st["layers"])
              for i in range(cfg.n_layers)]
    out = {k: v for k, v in st.items() if k != "layers"}
    out["layers"] = layers
    return out

params = jax.jit(unstack, donate_argnums=0)(stacked)
jax.block_until_ready(jax.tree.leaves(params)[0])

kv = init_kv_caches(cfg, 1, 1024)
token = jnp.ones((1, 1), jnp.int32)
pos0 = jnp.ones((1,), jnp.int32)
o = ForwardOptions(matmul_impl="pallas")
steps = 16

@jax.jit
def fn(prm, kv, token, pos0):
    def body(i, carry):
        kv, tok = carry
        pos = pos0 + i
        logits, kv = forward(prm, cfg, tok, pos[:, None], kv, pos, o)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        return (kv, nxt[:, None])
    return jax.lax.fori_loop(0, steps, body, (kv, token))

out = fn(params, kv, token, pos0)
print("warm:", int(out[1][0, 0]), file=sys.stderr)

os.makedirs("/tmp/jaxtrace", exist_ok=True)
try:
    with jax.profiler.trace("/tmp/jaxtrace"):
        out = fn(params, kv, token, pos0)
        _ = int(out[1][0, 0])
    print("trace ok", file=sys.stderr)
except Exception as e:
    print("trace failed:", e, file=sys.stderr)

t0 = time.perf_counter()
out = fn(params, kv, token, pos0)
_ = int(out[1][0, 0])
print("8-layer full:", (time.perf_counter() - t0) / steps * 1e3, "ms/tok",
      file=sys.stderr)
