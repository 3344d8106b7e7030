"""Dump the optimized HLO of the decode step and count per-iteration
copies/fusions touching KV-cache-shaped buffers (round 3 glue hunt)."""
import functools
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.models.config import tiny_config
from prima_tpu.models.llama import (ForwardOptions, forward, init_kv_caches,
                                    synth_params_device_stacked)

cfg = tiny_config(n_layers=4, n_embd=4096, n_heads=32, n_kv_heads=8,
                  head_dim=128, n_ff=14336, n_vocab=128256,
                  n_ctx_train=8192, rope_base=500000.0, rope_dim=128)

stacked = jax.eval_shape(functools.partial(
    synth_params_device_stacked, cfg, GGMLType.Q4_K, fused=True))

def unstack(st):
    layers = [jax.tree.map(lambda a: a[i], st["layers"])
              for i in range(cfg.n_layers)]
    out = {k: v for k, v in st.items() if k != "layers"}
    out["layers"] = layers
    return out

params_shape = jax.eval_shape(unstack, stacked)
kv = init_kv_caches(cfg, 1, 1024)
kv_shape = jax.eval_shape(lambda: kv)
token = jax.ShapeDtypeStruct((1, 1), jnp.int32)
pos0 = jax.ShapeDtypeStruct((1,), jnp.int32)
o = ForwardOptions(matmul_impl="pallas", attn_impl=os.environ.get("ATTN", "xla"))
steps = 8

def fn(prm, kv, token, pos0):
    def body(i, carry):
        kv, tok = carry
        pos = pos0 + i
        logits, kv = forward(prm, cfg, tok, pos[:, None], kv, pos, o)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        return (kv, nxt[:, None])
    return jax.lax.fori_loop(0, steps, body, (kv, token))

lowered = jax.jit(fn).lower(params_shape, kv_shape, token, pos0)
print("lowered ok", file=sys.stderr)
compiled = lowered.compile()
print("compiled ok", file=sys.stderr)
txt = compiled.as_text()
with open("experiments/hlo_r3.txt", "w") as f:
    f.write(txt)

# count interesting ops inside the while body
cache_shape = "f32[1,1024,8,128]"  # kv dtype bf16 -> bf16[1,1024,8,128]
pat_copy = re.compile(r"^\s*%?\S+ = (\S+)\[?.*copy\(", re.M)
counts = {}
for line in txt.splitlines():
    m = re.match(r"\s*%?\S+\s*=\s*(\S+?)\s+(\w+)\(", line)
    if not m:
        continue
    shape, op = m.groups()
    counts.setdefault(op, 0)
    counts[op] += 1
    if op in ("copy", "dynamic-update-slice", "scatter", "transpose",
              "convert") and ("1024" in shape):
        print("CACHE-TOUCH:", line.strip()[:160])
top = sorted(counts.items(), key=lambda kv: -kv[1])[:25]
print("op histogram:", top)
print("bytes of text:", len(txt))
