"""Round-3: isolate the non-GEMV 'glue' cost of the decode step.

decompose_r3 showed: gemv(10.2ms) + head(0.8ms) vs full(17.7ms) — 6.7ms/token
is attention/norm/rope/KV-update glue at B=1, T=1024, 32 layers. This bench
runs ONLY that glue (GEMVs stubbed with slices of x) and sub-variants to find
the pathology.

Variants (each: 32-layer loop x `steps` inside one jit fori_loop):
  glue_full   norm+rope+update_kv+attention(xla)+norm+residuals, no GEMVs
  glue_flash  same with the Pallas flash_decode attention
  kv_update   update_kv x2 per layer only
  attn_core   gqa_attention on a FIXED cache per layer only
  norm_rope   norms + rope only
  carry_only  fori_loop carrying the full KV pytree doing x+=1 (carry cost)
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from prima_tpu.models.config import tiny_config
    from prima_tpu.models.llama import init_kv_caches
    from prima_tpu.ops.layers import (apply_rope, causal_mask, gqa_attention,
                                      rms_norm, rope_freqs)
    from prima_tpu.ops.kvquant import update_kv

    cfg = tiny_config(n_layers=args.layers, n_embd=4096, n_heads=32,
                      n_kv_heads=8, head_dim=128, n_ff=14336, n_vocab=128256,
                      n_ctx_train=8192, rope_base=500000.0, rope_dim=128)
    L, e, h, kvh, hd = args.layers, 4096, 32, 8, 128
    T, steps = args.ctx, args.steps
    inv_freq, mscale = rope_freqs(cfg)
    nw = jnp.ones((e,), jnp.float32)  # norm weight

    kv = init_kv_caches(cfg, 1, T)

    def fake_qkv(x):
        # (1,1,e) -> q (1,1,h,hd), k/v (1,1,kvh,hd) via cheap slices
        q = x.reshape(1, 1, h, hd)
        k = x[..., : kvh * hd].reshape(1, 1, kvh, hd)
        v = x[..., kvh * hd : 2 * kvh * hd].reshape(1, 1, kvh, hd)
        return q, k, v

    def layer_glue(x, kv_i, pos, cache_pos, mask, attn):
        xin = x
        x = rms_norm(x, nw, 1e-5)
        q, k, v = fake_qkv(x)
        q = apply_rope(q, pos, inv_freq, cfg.rope_type, mscale)
        k = apply_rope(k, pos, inv_freq, cfg.rope_type, mscale)
        kc, vc = kv_i
        kc = update_kv(kc, k, cache_pos)
        vc = update_kv(vc, v, cache_pos)
        if attn == "xla":
            out = gqa_attention(q, kc.astype(q.dtype), vc.astype(q.dtype),
                                mask, 0.0883883)
        elif attn == "flash":
            from prima_tpu.ops.attention_pallas import flash_attention
            out = flash_attention(q, kc.astype(q.dtype), vc.astype(q.dtype),
                                  pos, 0.0883883)
        else:
            out = q
        x = xin + out.reshape(1, 1, e)
        x2 = rms_norm(x, nw, 1e-5)
        x = x + x2  # residual stub for the FFN
        return x, (kc, vc)

    def make_loop(attn, do_kv=True, do_attn=True, do_norm=True):
        @jax.jit
        def fn(kv, x0, pos0):
            def body(i, carry):
                kv, x = carry
                cache_pos = pos0 + i
                pos = cache_pos[:, None]
                mask = causal_mask(pos, T) if attn == "xla" else None
                kv = list(kv)
                for li in range(L):
                    if do_kv and do_attn and do_norm:
                        x, kv[li] = layer_glue(x, kv[li], pos, cache_pos,
                                               mask, attn)
                    elif do_kv:
                        q, k, v = fake_qkv(x)
                        kc, vc = kv[li]
                        kc = update_kv(kc, k, cache_pos)
                        vc = update_kv(vc, v, cache_pos)
                        kv[li] = (kc, vc)
                        x = x + kc[0, 0, 0, 0].astype(x.dtype)
                    elif do_attn:
                        xq = rms_norm(x, nw, 1e-5)
                        q, _, _ = fake_qkv(xq)
                        kc, vc = kv[li]
                        out = gqa_attention(q, kc.astype(q.dtype),
                                            vc.astype(q.dtype), mask,
                                            0.0883883)
                        x = x + out.reshape(1, 1, e)
                    else:  # norm_rope
                        xq = rms_norm(x, nw, 1e-5)
                        q, k, _ = fake_qkv(xq)
                        q = apply_rope(q, pos, inv_freq, cfg.rope_type, mscale)
                        k = apply_rope(k, pos, inv_freq, cfg.rope_type, mscale)
                        x = x + q.reshape(1, 1, e) * 0.5
                return (tuple(kv), x)
            kv, x = jax.lax.fori_loop(0, steps, body, (tuple(kv), x0))
            return x.sum()
        return fn

    @jax.jit
    def carry_only(kv, x0, pos0):
        def body(i, carry):
            kv, x = carry
            return (kv, x + 1.0)
        kv, x = jax.lax.fori_loop(0, steps, body, (tuple(kv), x0))
        return x.sum()

    x0 = jnp.ones((1, 1, e), jnp.bfloat16)
    pos0 = jnp.ones((1,), jnp.int32)

    variants = {
        "glue_full": make_loop("xla"),
        "glue_flash": make_loop("flash"),
        "kv_update": make_loop("xla", do_attn=False, do_norm=False),
        "attn_core": make_loop("xla", do_kv=False, do_norm=False),
        "norm_rope": make_loop("xla", do_kv=False, do_attn=False,
                               do_norm=True),
        "carry_only": carry_only,
    }
    if args.only:
        keep = set(args.only.split(","))
        variants = {k: v for k, v in variants.items() if k in keep}

    _trivial = jax.jit(lambda x: x + 1)
    _ = float(_trivial(jnp.float32(0)))
    rtts = []
    for _t in range(3):
        t0 = time.perf_counter()
        _ = float(_trivial(jnp.float32(_t)))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[1]

    results = {}
    for name, fn in variants.items():
        try:
            t0 = time.perf_counter()
            _ = float(fn(kv, x0, pos0))
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for _ in range(args.trials):
                t0 = time.perf_counter()
                _ = float(fn(kv, x0, pos0))
                d = time.perf_counter() - t0
                best = min(best, max(d - rtt, d * 0.5))
            rec = {"ms_per_token": round(best / steps * 1e3, 3),
                   "us_per_layer": round(best / steps / L * 1e6, 1),
                   "compile_s": round(compile_s, 1)}
            results[name] = rec
            print(f"[{name}] {rec}", file=sys.stderr, flush=True)
        except Exception as exc:  # noqa: BLE001
            results[name] = str(exc)[:300]
            print(f"[{name}] FAILED {results[name]}", file=sys.stderr)

    print(json.dumps({"steps": steps, "ctx": T, "layers": L,
                      "rtt_ms": round(rtt * 1e3, 1), "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
