"""Round-4: fused on-device speculative decoding speedup on the real chip.

VERDICT r3 task 6 "done" criterion: a committed JSON artifact showing
spec_speedup > 1.0 vs plain fused decode at batch 1 on the chip
(reference claim to match: up to +80%, /root/reference/README.md:117-118).

Setup mirrors the reference's recipe: an 8B-shaped Q4_K target with a
1B-class same-vocab draft, both fully on-device (FusedSpeculative: draft +
verify + accept in one dispatch per R rounds). Plain baseline is
Engine.step_fused — the serving fast path.

Measurement design: with SYNTHETIC weights, real draft/target agreement is
meaningless (independent random models never agree), so the sweep uses
FusedSpeculative(force_accept=a): every forward pass and sample runs
exactly as in production; only the token-match comparison is overridden to
accept `a` drafts per round. The measured tok/s at acceptance a is
therefore the true hardware cost of that acceptance level — the number a
real model pair with that acceptance would deliver. The artifact reports
the full speedup(acceptance) curve, the break-even acceptance, and the
a=n_draft upper bound; `spec_speedup` is the upper bound. A natural-pair
row (independent weights, near-zero acceptance) records the worst case.
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
    ap.add_argument("--tokens", type=int, default=96)
    ap.add_argument("--n-draft", type=int, default=6)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--accepts", default="")
    ap.add_argument("--target-layers", type=int, default=32)
    ap.add_argument("--target-scan", action="store_true",
                    help="run the spec-loop target in scan layout: the "
                         "tunneled remote-compile endpoint reproducibly "
                         "drops larger unrolled-multi-layer programs "
                         "mid-compile (broken pipe), and scan compiles one "
                         "layer body. Costs ~3x target weight traffic "
                         "(XLA copies each scan iteration's slice), so the "
                         "speedup is ALSO reported against the faster "
                         "unrolled plain baseline.")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("PRIMA_JAX_CACHE",
                                     "/root/.cache/prima_jax_cache"))
    from prima_tpu.gguf.constants import GGMLType
    from prima_tpu.models.config import tiny_config
    from prima_tpu.models.llama import (ForwardOptions,
                                        synth_params_device_unrolled)
    from prima_tpu.runtime.engine import Engine
    from prima_tpu.runtime.speculative_fused import FusedSpeculative
    from prima_tpu.sampling import Sampler, SamplerParams

    if args.small:
        t_cfg = tiny_config(n_layers=4, n_embd=1024, n_heads=16,
                            n_kv_heads=8, head_dim=64, n_ff=2816,
                            n_vocab=32000, rope_dim=64)
        d_cfg = tiny_config(n_layers=2, n_embd=512, n_heads=8, n_kv_heads=4,
                            head_dim=64, n_ff=1024, n_vocab=32000,
                            rope_dim=64)
    else:
        t_cfg = tiny_config(n_layers=args.target_layers, n_embd=4096,
                            n_heads=32, n_kv_heads=8, head_dim=128,
                            n_ff=14336, n_vocab=128256, n_ctx_train=8192,
                            rope_base=500000.0, rope_dim=128)
        # 1B-class draft, same vocab (llama-3.2-1B shape), depth scaled
        # with the target
        d_cfg = tiny_config(n_layers=max(args.target_layers // 2, 2),
                            n_embd=2048, n_heads=32,
                            n_kv_heads=8, head_dim=64, n_ff=8192,
                            n_vocab=128256, n_ctx_train=8192,
                            rope_base=500000.0, rope_dim=64)

    opts = ForwardOptions(matmul_impl="pallas"
                          if jax.default_backend() == "tpu" else "xla")
    prompt = list(range(1, 9))
    k = args.n_draft
    report = {"n_draft": k, "rounds": args.rounds, "tokens": args.tokens,
              "target": f"{t_cfg.n_layers}L/{t_cfg.n_embd}e",
              "draft": f"{d_cfg.n_layers}L/{d_cfg.n_embd}e",
              "method": "force_accept sweep: all compute real, only the "
                        "match comparison overridden (synthetic weights "
                        "cannot exhibit real agreement)"}

    t_params = None

    def mk_engine(cfg, seed, scan=False, params=None):
        p = params
        if p is None:
            p = synth_params_device_unrolled(cfg, GGMLType.Q4_K, fused=True,
                                             seed=seed)
            jax.block_until_ready(jax.tree.leaves(p)[0])
        return Engine(cfg, p, n_slots=1, max_seq=512, n_batch=64,
                      opts=opts, scan=scan), p

    t_eng, t_params = mk_engine(t_cfg, 0, scan=args.target_scan)
    # draft runs the SCAN layout: its single compiled layer body keeps the
    # fused round program small (unrolled-multi-layer programs break the
    # remote-compile endpoint); the scan weight-copy penalty only touches
    # the small draft's ~0.6 GB stream
    d_eng, _dp = mk_engine(d_cfg, 1, scan=True)

    # -- plain fused baselines ----------------------------------------------
    def measure_plain(eng, name):
        s = eng.submit(prompt, sampler=Sampler(SamplerParams(temp=0.0)),
                       n_predict=args.tokens)
        eng.prefill_only(s)
        t0 = time.perf_counter()
        eng.step_fused(max_chunk=16)  # compile
        report[f"{name}_compile_s"] = round(time.perf_counter() - t0, 1)
        eng.perf["n_decode"], eng.perf["t_decode_s"] = 0, 0.0
        while s.state.name != "IDLE":
            eng.step_fused(max_chunk=16)
        tok_s = eng.perf["n_decode"] / eng.perf["t_decode_s"]
        report[name] = round(tok_s, 2)
        print(f"[{name}] {report[name]} tok/s", file=sys.stderr, flush=True)
        eng.kv.seq_rm(s.id)
        s.prompt = []
        return tok_s

    plain_tok_s = measure_plain(t_eng, "plain_tok_s")
    plain_best = plain_tok_s
    if args.target_scan:
        # the faster unrolled plain layout is the HONEST denominator
        # (spec must beat the best plain path, not just same-layout plain);
        # shares the same unstacked weight arrays
        try:
            u_eng, _ = mk_engine(t_cfg, 0, scan=False, params=t_params)
            plain_best = max(plain_best,
                             measure_plain(u_eng, "plain_unrolled_tok_s"))
            del u_eng
            import gc as _gc

            _gc.collect()
        except Exception as e:  # noqa: BLE001
            report["plain_unrolled_error"] = str(e)[:200]

    def reset():
        t_eng.kv.seq_rm(0)
        t_eng.slots[0].prompt = []
        d_eng.kv.seq_rm(0)
        d_eng.slots[0].prompt = []

    # -- acceptance sweep ----------------------------------------------------
    accepts = ([int(x) for x in args.accepts.split(",") if x]
               or [k, 2, -1])  # -1 = natural comparison
    curve = {}
    for a in accepts:
        # p_min=0: random draft weights rarely clear the default 0.75
        # confidence gate, which would cap n_valid at 1 and make the sweep
        # measure nothing
        spec = FusedSpeculative(t_eng, d_eng, n_draft=k, p_min=0.0,
                                rounds=args.rounds, force_accept=a)
        name = f"accept_{a}" if a >= 0 else "natural"
        t0 = time.perf_counter()
        out, _st = spec.generate(prompt, Sampler(SamplerParams(temp=0.0)),
                                 n_predict=args.rounds * (k + 1))
        compile_s = time.perf_counter() - t0
        reset()
        t0 = time.perf_counter()
        out, stats = spec.generate(prompt, Sampler(SamplerParams(temp=0.0)),
                                   n_predict=args.tokens)
        dt = time.perf_counter() - t0
        tok_s = len(out) / dt
        curve[name] = {
            "tok_s": round(tok_s, 2),
            "speedup_vs_plain": round(tok_s / plain_tok_s, 3),
            "speedup_vs_best_plain": round(tok_s / plain_best, 3),
            "acceptance": round(stats.acceptance, 3),
            "n_tokens": len(out),
            "compile_s": round(compile_s, 1),
        }
        print(f"[{name}] {curve[name]}", file=sys.stderr, flush=True)
        reset()

    report["curve"] = curve
    top = curve.get(f"accept_{k}", {})
    report["spec_speedup"] = top.get("speedup_vs_best_plain", 0.0)
    # break-even: smallest measured acceptance with speedup >= 1
    be = [n for n, r in curve.items()
          if n.startswith("accept_") and r["speedup_vs_plain"] >= 1.0]
    report["breakeven_hit_at"] = sorted(be) if be else []
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
