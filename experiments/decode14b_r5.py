"""Round-5: model-level 14B decode across kernel configs (the fix proof).

scale_expand_r5.json showed the _group_expand MXU->repeat change gains
4-23% per matmul shape; this measures what actually lands at the model
level on the full 48-layer Qwen2.5-14B-shaped decode (the bench row that
sat at 0.84x baseline in round 4), sweeping:

  r4_baseline — PRIMA_QMM_EXPAND=dot,    PRIMA_QMM_REPEAT=direct
  rep_direct  — PRIMA_QMM_EXPAND=repeat, PRIMA_QMM_REPEAT=direct
  rep_twostep — PRIMA_QMM_EXPAND=repeat, PRIMA_QMM_REPEAT=twostep
  +fast       — best of the above + PRIMA_QMM_FAST=1 (bf16 in-kernel
                dequant: still above the reference CPU path's 8-bit
                activation quantization, ggml-quants.c:3835)

Writes experiments/decode14b_r5.json. Baseline: 43.5 tok/s (23 ms/tok,
reference README.md:55 on its 4-device cluster). Requires the TPU.
"""

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CONFIGS = [
    ("r4_baseline", {"PRIMA_QMM_EXPAND": "dot", "PRIMA_QMM_REPEAT": "direct",
                     "PRIMA_QMM_FAST": "0"}),
    ("rep_direct", {"PRIMA_QMM_EXPAND": "repeat",
                    "PRIMA_QMM_REPEAT": "direct", "PRIMA_QMM_FAST": "0"}),
    ("rep_twostep", {"PRIMA_QMM_EXPAND": "repeat",
                     "PRIMA_QMM_REPEAT": "twostep", "PRIMA_QMM_FAST": "0"}),
    ("rep_direct_fast", {"PRIMA_QMM_EXPAND": "repeat",
                         "PRIMA_QMM_REPEAT": "direct",
                         "PRIMA_QMM_FAST": "1"}),
]


def measure(name):
    import jax
    import jax.numpy as jnp

    import bench
    from prima_tpu.gguf.constants import GGMLType
    from prima_tpu.models.llama import (ForwardOptions, init_kv_caches,
                                        synth_params_device_unrolled)
    from prima_tpu.quant.pallas import qmatmul

    qmatmul._build_qmm.cache_clear()
    jax.clear_caches()
    gc.collect()

    cfg = bench.model_shape("14b")
    steps = 32
    params = synth_params_device_unrolled(cfg, GGMLType.Q4_K, fused=True)
    jax.block_until_ready(jax.tree.leaves(params)[0])
    kv = init_kv_caches(cfg, 1, 256)
    fn = bench.build_decode_fn(cfg, ForwardOptions(matmul_impl="pallas"),
                               steps)
    token = jnp.ones((1, 1), jnp.int32)
    pos0 = jnp.ones((1,), jnp.int32)
    t0 = time.perf_counter()
    out = fn(params, kv, token, pos0)
    _ = int(out[1][0, 0])
    compile_s = time.perf_counter() - t0
    trials = []
    for _i in range(4):
        time.sleep(3.0)
        t0 = time.perf_counter()
        out = fn(params, kv, token, pos0)
        _ = int(out[1][0, 0])
        trials.append(time.perf_counter() - t0)
    rtt = float(os.environ.get("PRIMA_BENCH_RTT", "0.05"))
    tok_s = bench.best_tok_s(trials, steps, 1, rtt)
    gb = bench.tree_bytes(params) / 1e9
    del params, kv, fn
    gc.collect()
    return {"tok_s": round(tok_s, 2), "compile_s": round(compile_s, 1),
            "trials_s": [round(t, 3) for t in trials],
            "weight_gb": round(gb, 2),
            "eff_gbs": round(gb * tok_s, 1),
            "vs_baseline": round(tok_s / 43.478, 3)}


def main():
    import jax

    out = {"backend": jax.default_backend(), "model": "14b", "steps": 32,
           "baseline_tok_s": 43.478,
           "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "configs": {}}
    only = os.environ.get("PRIMA_14B_ONLY")
    for name, env in CONFIGS:
        if only and only not in name:
            continue
        os.environ.update(env)
        try:
            out["configs"][name] = measure(name)
        except Exception as e:  # noqa: BLE001
            out["configs"][name] = {"error": str(e)[:300]}
        print(json.dumps({name: out["configs"][name]}), flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "decode14b_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": path}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
