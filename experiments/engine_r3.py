"""Round-3: Engine-path decode throughput on the real chip.

VERDICT r2 task 2 "done" criterion: Engine-path decode tok/s within 15% of
bench.py's raw fori_loop. Uses the 8B-shaped synth model, Engine with the
TPU default (unrolled layers) + step_fused chunked on-device sampling.
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
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import functools

    import jax
    import numpy as np

    from prima_tpu.gguf.constants import GGMLType
    from prima_tpu.models.config import tiny_config
    from prima_tpu.models.llama import ForwardOptions, synth_params_device_stacked
    from prima_tpu.runtime.engine import Engine
    from prima_tpu.sampling import Sampler, SamplerParams

    if args.small:
        cfg = tiny_config(n_layers=4, n_embd=1024, n_heads=16, n_kv_heads=8,
                          head_dim=64, n_ff=2816, n_vocab=32000, rope_dim=64)
    else:
        cfg = tiny_config(n_layers=32, n_embd=4096, n_heads=32, n_kv_heads=8,
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
    del stacked

    eng = Engine(cfg, params, n_slots=1, max_seq=1024, n_batch=64,
                 opts=ForwardOptions(matmul_impl="pallas"))
    print(f"engine scan={eng.use_scan}", file=sys.stderr)

    results = {}
    for mode in ("fused", "host"):
        s = eng.submit(list(range(1, 9)),
                       sampler=Sampler(SamplerParams(temp=0.0)),
                       n_predict=args.tokens)
        eng.prefill_only(s)
        # warm-up chunk (compile)
        t0 = time.perf_counter()
        if mode == "fused":
            eng.step_fused(max_chunk=args.chunk)
        else:
            eng.step()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        while s.state.name != "IDLE":
            if mode == "fused":
                eng.step_fused(max_chunk=args.chunk)
            else:
                eng.step()
        dt = time.perf_counter() - t0
        n = len(s.generated) - (args.chunk if mode == "fused" else 1)
        results[mode] = {
            "tok_s": round(n / dt, 2),
            "ms_per_token": round(dt / n * 1e3, 2),
            "compile_s": round(compile_s, 1),
        }
        print(f"[{mode}] {results[mode]}", file=sys.stderr, flush=True)
        # reset slot for next mode
        eng.kv.seq_rm(s.id)
        s.prompt = []

    print(json.dumps({"chunk": args.chunk, "tokens": args.tokens,
                      "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
