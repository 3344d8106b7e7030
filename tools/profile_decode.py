"""Decompose the 8B Q4_K decode step on the real TPU (VERDICT r1 weak #1).

Times, with the bench methodology (whole loop in ONE jit via lax.fori_loop,
value readback to sync, tunnel RTT subtracted, paired raw-HBM probes):

  full        the bench's decode step (unfused weights, default precision)
  fused       fused QKV + gate-up weights (4 GEMV launches/layer instead of 7)
  fused_fast  fused + bf16 in-kernel compute (PRIMA_QMM_FAST=1)
  gemv        the 7 per-layer qmatmuls alone (no attention/norm/rope/KV)
  head        the 128256x4096 logits head matmul alone
  attn        full minus GEMVs: attention + norms + rope + KV update + glue

Prints a JSON object with ms/token per variant and derived effective GB/s,
so the gap between the decode step and the moment's memory speed-of-light
is attributable to a specific component.
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
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon TPU plugin initializes (and hangs if the tunnel is down)
        # unless the platform is ALSO forced via config (tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from prima_tpu.gguf.constants import GGMLType
    from prima_tpu.models.config import tiny_config
    from prima_tpu.models.llama import (ForwardOptions, forward_scan,
                                        init_kv_stacked,
                                        synth_params_device_stacked)
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from prima_tpu.quant.pallas.qmatmul import qmatmul_pallas as qmm
    else:
        # interpret-mode Pallas is far too slow for a smoke run; the XLA
        # path keeps the tool executable off-TPU (numbers only matter on)
        from prima_tpu.quant.dequant_jax import qmatmul_xla as qmm
    if not on_tpu:
        os.environ.setdefault("PRIMA_PALLAS_INTERPRET", "1")
    if args.small or not on_tpu:
        cfg = tiny_config(n_layers=4, n_embd=1024, n_heads=16, n_kv_heads=8,
                          head_dim=64, n_ff=2816, n_vocab=32000, rope_dim=64)
    else:
        cfg = tiny_config(n_layers=32, n_embd=4096, n_heads=32, n_kv_heads=8,
                          head_dim=128, n_ff=14336, n_vocab=128256,
                          n_ctx_train=8192, rope_base=500000.0, rope_dim=128)
    steps = args.steps
    impl = "pallas" if on_tpu else "xla"
    opts = ForwardOptions(matmul_impl=impl)

    params = jax.jit(lambda: synth_params_device_stacked(cfg, GGMLType.Q4_K))()
    jax.block_until_ready(jax.tree.leaves(params)[0])
    params_f = jax.jit(
        lambda: synth_params_device_stacked(cfg, GGMLType.Q4_K, fused=True))()
    jax.block_until_ready(jax.tree.leaves(params_f)[0])

    kv = init_kv_stacked(cfg, 1, args.ctx)
    token = jnp.ones((1, 1), jnp.int32)
    pos0 = jnp.ones((1,), jnp.int32)

    def decode_loop(prm):
        o = ForwardOptions(matmul_impl=impl)

        @jax.jit
        def fn(prm, kv, token, pos0):
            def body(i, carry):
                kv, tok = carry
                pos = pos0 + i
                logits, kv = forward_scan(prm, cfg, tok, pos[:, None], kv,
                                          pos, o)
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                return (kv, nxt[:, None])
            return jax.lax.fori_loop(0, steps, body, (kv, token))

        def run():
            out = fn(prm, kv, token, pos0)
            return int(out[1][0, 0])
        return run

    # GEMV-only: every per-layer matmul with a live data dependency, no
    # attention/norm/rope/KV — measures the fused kernels' streaming rate.
    e = cfg.n_embd

    @jax.jit
    def gemv_loop(prm, x0):
        layers = prm["layers"]

        def body(i, x):
            def scan_body(xc, layer):
                q = qmm(xc, layer["wq"])
                k = qmm(xc, layer["wk"])
                v = qmm(xc, layer["wv"])
                o = qmm(q, layer["wo"])
                g = qmm(xc, layer["w_gate"])
                u = qmm(xc, layer["w_up"])
                d = qmm(g * 0 + u * 0 + 1.0, layer["w_down"])
                nxt = xc + o * 0 + d * 0 + k.sum() * 0 + v.sum() * 0
                return nxt, ()
            x, _ = jax.lax.scan(scan_body, x, layers)
            return x
        return jax.lax.fori_loop(0, steps, body, x0).sum()

    @jax.jit
    def head_loop(prm, x0):
        w = prm["output"]

        def body(i, x):
            lg = qmm(x, w)
            return x + lg.max() * 0
        return jax.lax.fori_loop(0, steps, body, x0).sum()

    x0 = jnp.ones((1, e), jnp.float32)

    variants = {
        "full": decode_loop(params),
        "fused": decode_loop(params_f),
        "gemv": lambda: float(gemv_loop(params, x0)),
        "head": lambda: float(head_loop(params, x0)),
    }
    # RTT measurement
    _trivial = jax.jit(lambda x: x + 1)
    _ = float(_trivial(jnp.float32(0)))
    rtts = []
    for _t in range(3):
        t0 = time.perf_counter()
        _ = float(_trivial(jnp.float32(_t)))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[1]

    def time_variant(run, trials=3):
        run()  # compile + warm
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            run()
            d = time.perf_counter() - t0
            best = min(best, max(d - rtt, d * 0.5))
        return best / steps * 1e3  # ms per step

    results = {}
    for name, run in variants.items():
        try:
            results[name] = round(time_variant(run), 3)
        except Exception as exc:  # noqa: BLE001 — report all variants
            results[name] = str(exc)[:160]
        print(f"[{name}] {results[name]}", file=sys.stderr, flush=True)

    # fused_fast: compile under the env flag (lru_cache keys include fast)
    os.environ["PRIMA_QMM_FAST"] = "1"
    try:
        ff = decode_loop(params_f)
        results["fused_fast"] = round(time_variant(ff), 3)
    except Exception as exc:  # noqa: BLE001
        results["fused_fast"] = str(exc)[:160]
    finally:
        os.environ["PRIMA_QMM_FAST"] = "0"

    layer_bytes = sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree.leaves(params["layers"]))
    head_bytes = sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree.leaves(params["output"]))
    derived = {}
    if isinstance(results.get("gemv"), float):
        derived["gemv_gbs"] = round(layer_bytes / (results["gemv"] / 1e3) / 1e9, 1)
    if isinstance(results.get("head"), float):
        derived["head_gbs"] = round(head_bytes / (results["head"] / 1e3) / 1e9, 1)
    if isinstance(results.get("full"), float) and isinstance(results.get("gemv"), float) \
            and isinstance(results.get("head"), float):
        derived["attn_glue_ms"] = round(
            results["full"] - results["gemv"] - results["head"], 3)
    print(json.dumps({
        "steps": steps,
        "rtt_ms": round(rtt * 1e3, 1),
        "ms_per_token": results,
        "layer_gb": round(layer_bytes / 1e9, 3),
        "head_gb": round(head_bytes / 1e9, 3),
        **derived,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
