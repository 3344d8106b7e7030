"""prima-imatrix — importance matrix collection over a calibration corpus.

The analogue of examples/imatrix/imatrix.cpp: runs the model over n_ctx
chunks of a text corpus, accumulating per-input-column sum(x^2) for every
matmul weight (via the forward pass's activation taps), and writes the
llama.cpp-compatible .imatrix file that prima-quantize --imatrix consumes.

  python -m prima_tpu.tools.imatrix -m model.gguf -f calib.txt -o out.imatrix
"""

from __future__ import annotations

import argparse
import sys
import time


def collect_imatrix(model, text: str, n_ctx: int = 512, matmul: str = "xla",
                    max_chunks: int = 0, logfile=sys.stderr) -> dict:
    """-> stats dict: name -> (sum_sq f32 (n_cols,), n_tokens, ncall)."""
    import jax
    import jax.numpy as jnp

    from ..models.llama import ForwardOptions, forward, init_kv_caches

    cfg = model.cfg
    opts = ForwardOptions(matmul_impl=matmul)
    tokens = model.tokenizer.encode(text, add_special=True)
    n_chunks = len(tokens) // n_ctx
    if max_chunks:
        n_chunks = min(n_chunks, max_chunks)
    if n_chunks < 1:
        raise ValueError(f"need at least {n_ctx} tokens, got {len(tokens)}")

    @jax.jit
    def chunk_taps(params, toks):
        kv = init_kv_caches(cfg, 1, n_ctx, jnp.bfloat16)
        positions = jnp.arange(n_ctx, dtype=jnp.int32)[None]
        taps: dict = {}
        forward(params, cfg, toks[None], positions, kv,
                jnp.zeros(1, jnp.int32), opts, taps=taps)
        return taps

    import numpy as np

    stats: dict = {}
    t0 = time.time()
    for c in range(n_chunks):
        chunk = np.asarray(tokens[c * n_ctx:(c + 1) * n_ctx], np.int32)
        taps = jax.device_get(chunk_taps(model.params, jnp.asarray(chunk)))
        for name, (ssq, cnt) in taps.items():
            prev = stats.get(name)
            if prev is None:
                stats[name] = [np.asarray(ssq, np.float64), int(cnt), 1]
            else:
                prev[0] += ssq
                prev[1] += int(cnt)
                prev[2] += 1
        print(f"[{c + 1}/{n_chunks}] {time.time() - t0:.1f}s", file=logfile)
    return stats


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="prima-imatrix", description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True, help="calibration text")
    ap.add_argument("-o", "--output", default="imatrix.dat")
    ap.add_argument("-c", "--n-ctx", type=int, default=512)
    ap.add_argument("--chunks", type=int, default=0, help="max chunks (0 = all)")
    ap.add_argument("--matmul", default="xla", choices=["pallas", "xla"])
    args = ap.parse_args(argv)

    from ..models.loader import load_model
    from ..quant.quantize_imatrix import save_imatrix

    model = load_model(args.model)
    text = open(args.file, encoding="utf-8").read()
    stats = collect_imatrix(model, text, n_ctx=args.n_ctx, matmul=args.matmul,
                            max_chunks=args.chunks)
    # stored form: (sum_sq / n_tokens) * ncall (imatrix.cpp:265-277)
    out = {
        name: (((ssq / max(cnt, 1)) * ncall).astype("float32"), ncall)
        for name, (ssq, cnt, ncall) in stats.items()
    }
    last_call = max((v[1] for v in out.values()), default=0)
    save_imatrix(args.output, out, last_call, dataset=args.file)
    print(f"stored {len(out)} entries ({last_call} chunks) in {args.output}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
