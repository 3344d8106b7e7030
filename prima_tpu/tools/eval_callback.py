"""prima-eval-callback — per-tensor activation inspection for one prompt.

The analogue of examples/eval-callback (reference
examples/eval-callback/eval-callback.cpp): runs a single forward pass and
prints, for every matmul input the forward taps (the same hook imatrix
uses, models/llama.py:_tap), the activation RMS and column statistics,
followed by a logits summary — the debugging surface for "which layer
went wrong" comparisons between builds or quantizations.

Usage:
  python -m prima_tpu.tools.eval_callback -m model.gguf -p "Hello world"
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="Hello world")
    ap.add_argument("--matmul", default="xla", choices=["pallas", "xla"])
    ap.add_argument("--top", type=int, default=5,
                    help="top-N logits to print")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models.llama import ForwardOptions, forward, init_kv_caches
    from ..models.loader import load_model

    model = load_model(args.model)
    cfg = model.cfg
    toks = model.tokenizer.encode(args.prompt, add_special=True,
                                  parse_special=True)
    opts = ForwardOptions(matmul_impl=args.matmul, dtype=jnp.float32,
                          logits_dtype=jnp.float32)

    @jax.jit
    def run(params, t):
        kv = init_kv_caches(cfg, 1, len(toks) + 8, jnp.float32)
        pos = jnp.arange(t.shape[1], dtype=jnp.int32)[None]
        taps: dict = {}
        logits, _ = forward(params, cfg, t, pos, kv,
                            jnp.zeros(1, jnp.int32), opts, taps=taps)
        return logits, taps

    logits, taps = jax.device_get(
        run(model.params, jnp.asarray([toks], jnp.int32)))

    def order(n: str):
        # execution order: embedding-side first, then by layer index
        parts = n.split(".")
        return ((int(parts[1]), n) if parts[0] == "blk" else (10**9, n))

    print(f"{'tensor':<28} {'rms':>12} {'col_min':>12} {'col_max':>12}")
    for name in sorted(taps, key=order):
        ssq, cnt = taps[name]
        col_ms = np.asarray(ssq, np.float64) / max(int(cnt), 1)
        rms = float(np.sqrt(col_ms.mean()))
        print(f"{name:<28} {rms:>12.6f} {np.sqrt(col_ms.min()):>12.6f} "
              f"{np.sqrt(col_ms.max()):>12.6f}")

    last = np.asarray(logits[0, -1], np.float64)
    exp = np.exp(last - last.max())
    probs = exp / exp.sum()
    top = np.argsort(-last)[: args.top]
    print(f"\nlogits: mean={last.mean():.4f} std={last.std():.4f} "
          f"max={last.max():.4f}")
    for t in top:
        piece = model.tokenizer.decode([int(t)])
        print(f"  {int(t):>7} {probs[t]:.4f} {piece!r}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
