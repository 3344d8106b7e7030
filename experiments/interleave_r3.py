"""Round-3: quantify the XLA<->Pallas interleave stall on the weight stream.

Theory: the fused GEMV streams at ~400 GB/s back-to-back, but every XLA
glue kernel BETWEEN pallas calls stalls the weight-stream DMA pipeline
(no cross-kernel prefetch), so the real model pays ~2x the glue's own cost.

Variants (steps x 32 calls of the same big GEMV inside one jit):
  back2back     y = qmm(...) chained directly
  tiny_glue     one non-fusable tiny XLA op between consecutive GEMVs
  norm_glue     an rms_norm-like op between GEMVs
  attn_glue     a full fake attention read (1024x1024 cache dot) between
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--calls", type=int, default=32)
    ap.add_argument("--trials", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from prima_tpu.gguf.constants import GGMLType
    from prima_tpu.models.llama import synth_qtensor_device
    from prima_tpu.quant.pallas.qmatmul import qmatmul_pallas as qmm

    e, nf = 4096, 14336
    steps, calls = args.steps, args.calls

    w = jax.jit(lambda: synth_qtensor_device(
        jax.random.PRNGKey(1), 2 * nf, e, GGMLType.Q4_K))()
    jax.block_until_ready(w.qs)
    wbytes = sum(a.size * a.dtype.itemsize
                 for a in (w.qs, w.scales, w.mins, w.d, w.dmin)
                 if a is not None)

    kcache = jnp.ones((1, 1024, 8, 128), jnp.bfloat16)
    nw = jnp.ones((e,), jnp.float32)

    def make(glue):
        @jax.jit
        def fn(x0):
            def body(i, x):
                for _ in range(calls):
                    y = qmm(x, w)
                    x = x + y[..., :e] * 1e-9
                    if glue == "tiny":
                        # a reduction XLA cannot fuse into the pallas call
                        x = x * (1.0 + jnp.tanh(x.sum()) * 1e-9)
                    elif glue == "norm":
                        from prima_tpu.ops.layers import rms_norm
                        x = rms_norm(x, nw, 1e-5)
                    elif glue == "attn":
                        q = x.reshape(1, 1, 32, 128)[:, :, :8]
                        s = jnp.einsum("bsnh,btnh->bnst", q,
                                       kcache.astype(q.dtype))
                        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
                        o = jnp.einsum("bnst,btnh->bsnh",
                                       p.astype(kcache.dtype), kcache)
                        x = x + jnp.tile(o.reshape(1, 1024), 4)[None][0] * 1e-9
                return x
            return jax.lax.fori_loop(0, steps, body, x0).sum()
        return fn

    x0 = jnp.ones((1, e), jnp.float32)

    _trivial = jax.jit(lambda x: x + 1)
    _ = float(_trivial(jnp.float32(0)))
    rtts = []
    for _t in range(3):
        t0 = time.perf_counter()
        _ = float(_trivial(jnp.float32(_t)))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[1]

    results = {}
    for name, glue in [("back2back", None), ("tiny_glue", "tiny"),
                       ("norm_glue", "norm"), ("attn_glue", "attn")]:
        fn = make(glue)
        try:
            t0 = time.perf_counter()
            _ = float(fn(x0))
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for _ in range(args.trials):
                t0 = time.perf_counter()
                _ = float(fn(x0))
                d = time.perf_counter() - t0
                best = min(best, max(d - rtt, d * 0.5))
            per_call_us = best / steps / calls * 1e6
            gbs = wbytes / (best / steps / calls) / 1e9
            rec = {"us_per_call": round(per_call_us, 1),
                   "eff_gbs": round(gbs, 1), "compile_s": round(compile_s, 1)}
            results[name] = rec
            print(f"[{name}] {rec}", file=sys.stderr, flush=True)
        except Exception as exc:  # noqa: BLE001
            results[name] = str(exc)[:300]
            print(f"[{name}] FAILED {results[name]}", file=sys.stderr)

    print(json.dumps({"wbytes_mb": round(wbytes / 1e6, 1), "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
