"""Weight-streaming decode on real TPU: a model held to an artificial HBM
budget (n_resident < n_layers) decodes via the double-buffered host->HBM
StreamedRunner — the capability that runs models LARGER than device memory
(VERDICT r1 item 2's single-chip bench; manage_graph_tensors analogue).

On this tunneled runtime host->device moves at ~20 MB/s, so the model is
kept small; the point is the composition working end-to-end on hardware
with correct logits, plus the achieved stream bandwidth. Prints one JSON
line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from prima_tpu.gguf.constants import GGMLType
    from prima_tpu.models.config import tiny_config
    from prima_tpu.models.llama import (ForwardOptions, synth_host_head,
                                        synth_host_layer)
    from prima_tpu.runtime.streaming import StreamedRunner, build_streamed_model

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        import os

        os.environ.setdefault("PRIMA_PALLAS_INTERPRET", "1")

    cfg = tiny_config(n_layers=4, n_embd=512, n_heads=8, n_kv_heads=4,
                      head_dim=64, n_ff=1408, n_vocab=4096, rope_dim=64)
    impl = "pallas" if on_tpu else "xla"
    opts = ForwardOptions(matmul_impl=impl)

    def get_layer(i):
        return synth_host_layer(cfg, i, GGMLType.Q4_K, seed=1)

    head = synth_host_head(cfg, GGMLType.Q4_K, seed=1)

    def run(n_resident, prompt, n_new):
        m = build_streamed_model(get_layer, head, cfg, n_resident,
                                 pallas=impl == "pallas")
        r = StreamedRunner(m, 1, 128, opts)
        t0 = time.perf_counter()
        out = r.greedy_generate(prompt, n_new)
        dt = time.perf_counter() - t0
        return out, dt, m

    prompt, n_new = [3, 17, 42, 7], 8
    # fully resident reference
    ref, _, _ = run(cfg.n_layers, prompt, n_new)
    # streamed: only 1 of 4 layers HBM-resident (the model "exceeds" a
    # 1-layer HBM budget); per token 3 layers upload host->HBM
    t0 = time.perf_counter()
    got, dt, model = run(1, prompt, n_new)
    ok = got == ref

    layer_bytes = sum(
        int(np.asarray(a).nbytes)
        for rec in model.streamed_host[0].values()
        for a in rec.values() if not isinstance(a, tuple) and a is not None
    )
    streamed_per_tok = layer_bytes * len(model.streamed_host)
    print(json.dumps({
        "metric": "streamed_decode",
        "value": round(n_new / dt, 3),
        "unit": "tok/s",
        "vs_baseline": 1.0 if ok else 0.0,
        "on_tpu": on_tpu,
        "logits_match_resident": ok,
        "n_resident": 1,
        "n_layers": cfg.n_layers,
        "streamed_mb_per_token": round(streamed_per_tok / 1e6, 2),
        "stream_gbs": round(streamed_per_tok * n_new / dt / 1e9, 3),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
