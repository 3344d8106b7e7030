"""Round-3 perf decomposition on the real TPU (VERDICT r2 task 1a).

Measures, all in the UNROLLED per-layer layout (no scan weight-slice copies):

  kernel_single   one big fused GEMV (w_gateup 28672x4096) repeated — the
                  kernel's steady-state HBM streaming rate, no glue at all
  kernel_down     w_down 4096x14336 repeated (different tiling shape)
  gemv            the 4 fused GEMVs/layer x 32 layers, data-dependent chain
  head            the 128256x4096 logits head GEMV
  full            the bench's full decode step (XLA attention)
  full_flash      full with Pallas flash attention
  full_fast       full with bf16 in-kernel compute (PRIMA_QMM_FAST=1)
  attn_only       full minus (gemv + head): attention/norm/rope/KV glue

Each variant gets a PAIRED raw-HBM probe so the shared chip's throttle is
normalized out: report ms/token AND effective/probe ratio per variant.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--only", default=None, help="comma-list of variants")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from prima_tpu.gguf.constants import GGMLType
    from prima_tpu.models.config import tiny_config
    from prima_tpu.models.llama import (ForwardOptions, forward,
                                        init_kv_caches,
                                        synth_params_device_stacked,
                                        synth_qtensor_device)
    from prima_tpu.quant.pallas.qmatmul import qmatmul_pallas as qmm

    assert jax.default_backend() == "tpu", "this experiment needs the chip"

    cfg = tiny_config(n_layers=32, n_embd=4096, n_heads=32, n_kv_heads=8,
                      head_dim=128, n_ff=14336, n_vocab=128256,
                      n_ctx_train=8192, rope_base=500000.0, rope_dim=128)
    steps = args.steps
    e = cfg.n_embd

    def qt_bytes(qt):
        return sum(a.size * a.dtype.itemsize
                   for a in (qt.qs, qt.scales, qt.mins, qt.d, qt.dmin)
                   if a is not None)

    # ---- params: synth stacked (single-layer compile), then unstack -------
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
    del stacked

    layer_bytes = sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree.leaves(params["layers"]))
    head_bytes = sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree.leaves(params["output"]))

    kv = init_kv_caches(cfg, 1, args.ctx)
    token = jnp.ones((1, 1), jnp.int32)
    pos0 = jnp.ones((1,), jnp.int32)

    def decode_loop(attn_impl):
        o = ForwardOptions(matmul_impl="pallas", attn_impl=attn_impl)

        @jax.jit
        def fn(prm, kv, token, pos0):
            def body(i, carry):
                kv, tok = carry
                pos = pos0 + i
                logits, kv = forward(prm, cfg, tok, pos[:, None], kv, pos, o)
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                return (kv, nxt[:, None])
            return jax.lax.fori_loop(0, steps, body, (kv, token))

        def run():
            out = fn(params, kv, token, pos0)
            return int(out[1][0, 0])
        return run

    @jax.jit
    def gemv_loop(prm, x0):
        def body(i, x):
            for layer in prm["layers"]:
                qkv = qmm(x, layer["wqkv"])
                o = qmm(qkv[..., : e] * 0 + x, layer["wo"])
                gu = qmm(x, layer["w_gateup"])
                d = qmm(gu[..., : cfg.n_ff] * 0 + 1.0, layer["w_down"])
                x = x + o * 0 + d * 0
            return x
        return jax.lax.fori_loop(0, steps, body, x0).sum()

    @jax.jit
    def head_loop(prm, x0):
        w = prm["output"]

        def body(i, x):
            lg = qmm(x, w)
            return x + lg.max() * 0
        return jax.lax.fori_loop(0, steps, body, x0).sum()

    # single-kernel steady state: the same weight streamed `steps` times
    w_big = jax.jit(lambda: synth_qtensor_device(
        jax.random.PRNGKey(1), 2 * cfg.n_ff, e, GGMLType.Q4_K))()
    w_down1 = jax.jit(lambda: synth_qtensor_device(
        jax.random.PRNGKey(2), e, cfg.n_ff, GGMLType.Q4_K))()
    jax.block_until_ready(w_big.qs)

    def single_loop(w, k_in):
        @jax.jit
        def fn(x0):
            def body(i, x):
                y = qmm(x, w)
                return x + y.max() * 0
            return jax.lax.fori_loop(0, steps * 8, body, x0).sum()
        return lambda: float(fn(jnp.ones((1, k_in), jnp.float32)))

    x0 = jnp.ones((1, e), jnp.float32)

    # ---- RTT + probe --------------------------------------------------------
    _trivial = jax.jit(lambda x: x + 1)
    _ = float(_trivial(jnp.float32(0)))
    rtts = []
    for _t in range(3):
        t0 = time.perf_counter()
        _ = float(_trivial(jnp.float32(_t)))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[1]

    n = 48 * 1024 * 1024
    xbig = jnp.ones((n,), jnp.int8)
    probe_iters = 100

    @jax.jit
    def hbm_chain(x):
        def body(i, acc):
            z = (acc * 0).astype(x.dtype)
            return acc + jnp.sum((x + z[None]).astype(jnp.int32)).astype(jnp.float32)
        return jax.lax.fori_loop(0, probe_iters, body, jnp.float32(0))

    _ = float(hbm_chain(xbig))

    def probe_once():
        t0 = time.perf_counter()
        _ = float(hbm_chain(xbig))
        d = time.perf_counter() - t0
        return n * probe_iters / max(d - rtt, d * 0.5) / 1e9

    variants = {
        "kernel_single": (single_loop(w_big, e), qt_bytes(w_big) * 8),
        "kernel_down": (single_loop(w_down1, cfg.n_ff), qt_bytes(w_down1) * 8),
        "gemv": (lambda: float(gemv_loop(params, x0)), layer_bytes),
        "head": (lambda: float(head_loop(params, x0)), head_bytes),
        "full": (decode_loop("xla"), layer_bytes + head_bytes),
        "full_flash": (decode_loop("pallas"), layer_bytes + head_bytes),
    }
    if args.only:
        keep = set(args.only.split(","))
        variants = {k: v for k, v in variants.items() if k in keep}

    results = {}

    def time_variant(name, run, bytes_per_step):
        t0 = time.perf_counter()
        run()  # compile + warm
        compile_s = time.perf_counter() - t0
        best = float("inf")
        probes = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            run()
            d = time.perf_counter() - t0
            best = min(best, max(d - rtt, d * 0.5))
            probes.append(probe_once())
        ms = best / steps * 1e3
        gbs = bytes_per_step / (ms / 1e3) / 1e9
        rec = {"ms_per_token": round(ms, 3), "eff_gbs": round(gbs, 1),
               "probe_gbs": round(max(probes), 1),
               "vs_probe": round(gbs / max(probes), 3),
               "compile_s": round(compile_s, 1)}
        results[name] = rec
        print(f"[{name}] {rec}", file=sys.stderr, flush=True)

    for name, (run, nbytes) in variants.items():
        if name in ("kernel_single", "kernel_down"):
            nb = nbytes / 8  # loop runs 8x steps internally
            try:
                t0 = time.perf_counter()
                run()
                compile_s = time.perf_counter() - t0
                best = float("inf")
                probes = []
                for _ in range(args.trials):
                    t0 = time.perf_counter()
                    run()
                    d = time.perf_counter() - t0
                    best = min(best, max(d - rtt, d * 0.5))
                    probes.append(probe_once())
                ms = best / (steps * 8) * 1e3
                gbs = nb / (ms / 1e3) / 1e9
                rec = {"ms_per_call": round(ms, 4), "eff_gbs": round(gbs, 1),
                       "probe_gbs": round(max(probes), 1),
                       "vs_probe": round(gbs / max(probes), 3),
                       "compile_s": round(compile_s, 1)}
                results[name] = rec
                print(f"[{name}] {rec}", file=sys.stderr, flush=True)
            except Exception as exc:  # noqa: BLE001
                results[name] = str(exc)[:200]
                print(f"[{name}] FAILED {results[name]}", file=sys.stderr)
            continue
        try:
            time_variant(name, run, nbytes)
        except Exception as exc:  # noqa: BLE001
            results[name] = str(exc)[:200]
            print(f"[{name}] FAILED {results[name]}", file=sys.stderr)

    # fast variant compiles under the env flag
    if not args.only or "full_fast" in (args.only or ""):
        os.environ["PRIMA_QMM_FAST"] = "1"
        try:
            time_variant("full_fast", decode_loop("xla"),
                         layer_bytes + head_bytes)
        except Exception as exc:  # noqa: BLE001
            results["full_fast"] = str(exc)[:200]
        finally:
            os.environ["PRIMA_QMM_FAST"] = "0"

    print(json.dumps({
        "steps": steps, "rtt_ms": round(rtt * 1e3, 1),
        "layer_gb": round(layer_bytes / 1e9, 3),
        "head_gb": round(head_bytes / 1e9, 3),
        "results": results,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
