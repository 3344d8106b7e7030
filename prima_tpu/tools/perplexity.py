"""prima-perplexity — wikitext-style perplexity evaluation.

The analogue of examples/perplexity/perplexity.cpp: tokenize the corpus,
split into n_ctx-token chunks, run each chunk through the model, and
accumulate NLL over the second half of each chunk (the first half is
context warm-up), reporting running PPL like the reference.
"""

from __future__ import annotations

import argparse
import functools
import math
import sys

import numpy as np


def compute_perplexity(model, text: str, n_ctx: int = 512, matmul: str = "xla",
                       max_chunks: int = 0, logfile=sys.stderr):
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
    def chunk_nll(params, toks):
        kv = init_kv_caches(cfg, 1, n_ctx, jnp.bfloat16)
        positions = jnp.arange(n_ctx, dtype=jnp.int32)[None]
        logits, _ = forward(params, cfg, toks[None], positions, kv,
                            jnp.zeros(1, jnp.int32), opts)
        logp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
        # predict token[i+1] from position i; count the second half only
        idx = jnp.arange(n_ctx - 1)
        ll = logp[idx, toks[1:]]
        start = n_ctx // 2
        mask = idx >= start
        return -jnp.sum(jnp.where(mask, ll, 0.0)), jnp.sum(mask)

    total_nll, total_cnt = 0.0, 0
    for c in range(n_chunks):
        chunk = np.asarray(tokens[c * n_ctx : (c + 1) * n_ctx], dtype=np.int32)
        nll, cnt = chunk_nll(model.params, jnp.asarray(chunk))
        total_nll += float(nll)
        total_cnt += int(cnt)
        ppl = math.exp(total_nll / total_cnt)
        print(f"[{c + 1}/{n_chunks}] ppl = {ppl:.4f}", file=logfile, flush=True)
    return math.exp(total_nll / total_cnt), total_cnt


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="prima-perplexity", description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True, help="text corpus")
    ap.add_argument("-c", "--ctx-size", type=int, default=512)
    ap.add_argument("--chunks", type=int, default=0, help="limit #chunks (0=all)")
    ap.add_argument("--matmul", default="pallas", choices=["pallas", "xla"])
    args = ap.parse_args(argv)

    from ..models.loader import load_model

    model = load_model(args.model)
    text = open(args.file, encoding="utf-8").read()
    ppl, n = compute_perplexity(model, text, args.ctx_size, args.matmul, args.chunks)
    print(f"final ppl = {ppl:.4f} over {n} tokens")
    return 0


if __name__ == "__main__":
    sys.exit(main())
