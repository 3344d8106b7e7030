"""Profile the single-chip decode step on real TPU: where does the token
budget go? (VERDICT r1: 57.6 tok/s vs 66.7 baseline — find the gap instead
of normalizing it away.)

Measures, each as ONE jit with an internal fori_loop (dispatch-amortized,
value-readback synchronized — see .claude/skills/verify/SKILL.md):
  * full decode step (pallas, f32 accumulate)      -> tok/s
  * full decode step (pallas, fast=bf16)           -> tok/s
  * layers-only (no output head)                   -> isolates head cost
  * per-shape fused qmatmul GEMV                   -> GB/s per weight shape
  * attention-only                                  -> us/layer
  * raw HBM read probe                              -> GB/s ceiling

Usage: python tools/profile_decode.py [--small] [--steps 32]
"""

from __future__ import annotations

import argparse
import json
import time


def sync(x):
    import jax.numpy as jnp

    return float(jnp.asarray(x).reshape(-1)[0])


def timeit(fn, *args, trials=3, sleep=0.0, tag=""):
    import sys
    t0 = time.perf_counter()
    fn(*args)  # compile + warm
    print(f"[{tag}] compiled+warm in {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
    best = float("inf")
    for t in range(trials):
        t0 = time.perf_counter()
        fn(*args)
        best = min(best, time.perf_counter() - t0)
        if sleep and t < trials - 1:
            time.sleep(sleep)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from prima_tpu.gguf.constants import GGMLType
    from prima_tpu.models.config import tiny_config
    from prima_tpu.models.llama import (ForwardOptions, forward_scan,
                                        init_kv_stacked,
                                        synth_params_device_stacked,
                                        synth_qtensor_device)
    from prima_tpu.quant.pallas.qmatmul import qmatmul_pallas

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        import os

        os.environ.setdefault("PRIMA_PALLAS_INTERPRET", "1")

    if args.small or not on_tpu:
        cfg = tiny_config(n_layers=4, n_embd=1024, n_heads=16, n_kv_heads=8,
                          head_dim=64, n_ff=2816, n_vocab=32000, rope_dim=64)
    else:
        cfg = tiny_config(n_layers=32, n_embd=4096, n_heads=32, n_kv_heads=8,
                          head_dim=128, n_ff=14336, n_vocab=128256,
                          n_ctx_train=8192, rope_base=500000.0, rope_dim=128)

    impl = "pallas" if on_tpu else "xla"
    steps = args.steps
    report = {}

    import sys as _sys
    t0 = time.perf_counter()
    params = jax.jit(lambda: synth_params_device_stacked(cfg, GGMLType.Q4_K))()
    jax.block_until_ready(jax.tree.leaves(params)[0])
    print(f"[synth] params ready in {time.perf_counter()-t0:.1f}s", file=_sys.stderr, flush=True)
    kv = init_kv_stacked(cfg, 1, args.ctx)

    def weight_bytes(tree):
        return sum(l.size * l.dtype.itemsize for l in jax.tree.leaves(tree))

    wb = weight_bytes(params)
    report["weight_bytes_gb"] = round(wb / 1e9, 3)

    def decode_fn(fast):
        opts = ForwardOptions(matmul_impl=impl)

        @jax.jit
        def run(params, kv, token, pos0):
            def body(i, carry):
                kv, token = carry
                pos = pos0 + i
                logits, kv = forward_scan(params, cfg, token, pos[:, None],
                                          kv, pos, opts)
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                return (kv, nxt[:, None])
            out = jax.lax.fori_loop(0, steps, body, (kv, token))
            return out[1]

        return lambda: sync(run(params, kv, jnp.ones((1, 1), jnp.int32),
                                jnp.ones((1,), jnp.int32)))

    def layers_only_fn():
        opts = ForwardOptions(matmul_impl=impl)

        @jax.jit
        def run(params, kv, x0, pos0):
            def body(i, carry):
                kv, tok = carry
                pos = pos0 + i
                hid, kv = forward_scan(params, cfg, tok, pos[:, None], kv,
                                       pos, opts, return_hidden=True)
                nxt = (jnp.abs(hid[0, -1, :8]).argmax()).astype(jnp.int32)
                return (kv, nxt[None, None])
            out = jax.lax.fori_loop(0, steps, body, (kv, x0))
            return out[1]

        return lambda: sync(run(params, kv, jnp.ones((1, 1), jnp.int32),
                                jnp.ones((1,), jnp.int32)))

    import os

    os.environ["PRIMA_QMM_FAST"] = "0"
    t = timeit(decode_fn(False), trials=args.trials, sleep=2, tag="decode_f32")
    report["decode_f32_tok_s"] = round(steps / t, 2)

    t = timeit(layers_only_fn(), trials=args.trials, sleep=2, tag="layers_only")
    report["layers_only_tok_s"] = round(steps / t, 2)

    def decode_fast_fn():
        os.environ["PRIMA_QMM_FAST"] = "1"
        return decode_fn(True)

    t = timeit(decode_fast_fn(), trials=args.trials, sleep=2, tag="decode_bf16")
    report["decode_bf16_tok_s"] = round(steps / t, 2)
    os.environ["PRIMA_QMM_FAST"] = "0"

    # per-shape qmm GEMV
    e, f, v = cfg.n_embd, cfg.n_ff, cfg.n_vocab
    shapes = [("wq", e, e), ("wkv", cfg.n_kv_heads * cfg.head_dim, e),
              ("ffn", f, e), ("down", e, f), ("head", v, e)]
    qmm_iters = 32
    for name, n, k in shapes:
        qt = synth_qtensor_device(jax.random.PRNGKey(1), n, k, GGMLType.Q4_K)
        jax.block_until_ready(qt.qs)
        qb = (qt.qs.size * qt.qs.dtype.itemsize
              + sum(a.size * a.dtype.itemsize
                    for a in (qt.scales, qt.mins, qt.d, qt.dmin)
                    if a is not None))

        @jax.jit
        def run(qt, x):
            def body(i, x):
                y = qmatmul_pallas(x, qt, out_dtype=jnp.float32)
                return (y[..., :k] * 1e-3 if y.shape[-1] >= k
                        else jnp.pad(y, ((0, 0), (0, k - y.shape[-1]))) * 1e-3)
            return jax.lax.fori_loop(0, qmm_iters, body,
                                     x, unroll=False)

        x = jnp.ones((1, k), jnp.float32)
        t = timeit(lambda r=run, q=qt, xx=x: sync(r(q, xx)),
                   trials=args.trials, tag=f"qmm_{name}")
        report[f"qmm_{name}_gbs"] = round(qb * qmm_iters / t / 1e9, 1)

    # attention-only
    from prima_tpu.ops.layers import causal_mask, gqa_attention

    b, T = 1, args.ctx
    q1 = jnp.ones((b, 1, cfg.n_heads, cfg.head_dim), jnp.bfloat16)
    kc = jnp.ones((b, T, cfg.n_kv_heads, cfg.head_dim), jnp.bfloat16)
    att_iters = 256

    @jax.jit
    def att_run(q1, kc):
        mask = causal_mask(jnp.full((b, 1), T - 1, jnp.int32), T)

        def body(i, q):
            o = gqa_attention(q, kc, kc, mask, 0.088)
            return (q + o * 1e-6).astype(q.dtype)
        return jax.lax.fori_loop(0, att_iters, body, q1)

    t = timeit(lambda: sync(att_run(q1, kc)), trials=args.trials, tag='attn')
    report["attn_us_per_layer"] = round(t / att_iters * 1e6, 1)

    # raw HBM probe
    n = 48 * 1024 * 1024
    xbig = jnp.ones((n,), jnp.int8)
    probe_iters = 100

    @jax.jit
    def hbm_chain(x):
        def body(i, acc):
            z = (acc * 0).astype(x.dtype)
            return acc + jnp.sum((x + z[None]).astype(jnp.int32)).astype(jnp.float32)
        return jax.lax.fori_loop(0, probe_iters, body, jnp.float32(0))

    t = timeit(lambda: sync(hbm_chain(xbig)), trials=args.trials, tag='hbm')
    report["hbm_probe_gbs"] = round(n * probe_iters / t / 1e9, 1)

    report["decode_f32_eff_gbs"] = round(wb * report["decode_f32_tok_s"] / 1e9, 1)
    report["decode_bf16_eff_gbs"] = round(wb * report["decode_bf16_tok_s"] / 1e9, 1)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    import sys as _sys0

    if "--experiment" not in _sys0.argv:
        main()


def experiment_unstacked(steps=32, trials=3, ctx=1024, flash=False,
                         unstacked=True, fused=False):
    """Hypothesis test: lax.scan's per-layer dynamic slice of stacked params
    materializes a copy of every weight every token (3x HBM traffic).
    Decode with UNSTACKED per-layer params (forward(), no slicing) should
    approach the true streaming rate if so."""
    import sys

    import jax
    import jax.numpy as jnp

    from prima_tpu.gguf.constants import GGMLType
    from prima_tpu.models.config import tiny_config
    from prima_tpu.models.llama import (ForwardOptions, forward,
                                        forward_scan, init_kv_caches,
                                        init_kv_stacked,
                                        synth_params_device,
                                        synth_params_device_stacked)

    cfg = tiny_config(n_layers=32, n_embd=4096, n_heads=32, n_kv_heads=8,
                      head_dim=128, n_ff=14336, n_vocab=128256,
                      n_ctx_train=8192, rope_base=500000.0, rope_dim=128)
    opts = ForwardOptions(matmul_impl="pallas",
                          attn_impl="pallas" if flash else "xla")
    t0 = time.perf_counter()
    if unstacked:
        params = jax.jit(lambda: synth_params_device(cfg, GGMLType.Q4_K))()
        kv = init_kv_caches(cfg, 1, ctx)
        fwd = forward
    else:
        params = jax.jit(lambda: synth_params_device_stacked(
            cfg, GGMLType.Q4_K, fused=fused))()
        kv = init_kv_stacked(cfg, 1, ctx)
        fwd = forward_scan
    jax.block_until_ready(jax.tree.leaves(params)[0])
    print(f"[synth] {time.perf_counter()-t0:.1f}s", file=sys.stderr,
          flush=True)

    @jax.jit
    def decode_many(params, kv, token, pos0):
        def body(i, carry):
            kv, token = carry
            pos = pos0 + i
            logits, kv = fwd(params, cfg, token, pos[:, None], kv, pos, opts)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (kv, nxt[:, None])
        return jax.lax.fori_loop(0, steps, body, (kv, token))[1]

    fn = lambda: sync(decode_many(params, kv, jnp.ones((1, 1), jnp.int32),
                                  jnp.ones((1,), jnp.int32)))
    t = timeit(fn, trials=trials, sleep=3,
               tag=f"decode_{'unstacked' if unstacked else 'scan'}"
                   f"{'_flash' if flash else ''}{'_fused' if fused else ''}")
    wb = sum(l.size * l.dtype.itemsize for l in jax.tree.leaves(params))
    print(json.dumps({
        "mode": ("unstacked" if unstacked else "scan")
        + ("_flash" if flash else "") + ("_fused" if fused else ""),
        "tok_s": round(steps / t, 2),
        "eff_gbs": round(wb * steps / t / 1e9, 1),
    }), flush=True)


if __name__ == "__main__" and "--experiment" in __import__("sys").argv:
    import sys as _s

    _s.argv.remove("--experiment")
    experiment_unstacked(flash="--flash" in _s.argv,
                         unstacked="--scan" not in _s.argv,
                         fused="--fused" in _s.argv)
    _s.exit(0)
