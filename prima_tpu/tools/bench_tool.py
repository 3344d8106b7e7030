"""prima-bench — pp/tg benchmark matrix over model files or synth shapes.

The analogue of examples/llama-bench/llama-bench.cpp: times prompt
processing (pp: one batched forward over n_prompt tokens) and token
generation (tg: n_gen sequential single-token decodes) for every
combination of the requested sizes, repeats each test and reports
mean +- stddev tok/s in markdown / csv / json / jsonl.

  python -m prima_tpu.tools.bench_tool -m model.gguf -p 512 -n 128 -o md
  python -m prima_tpu.tools.bench_tool --synth 8b -p 0 -n 64 -b 1,8 -o json

Timing methodology (tunneled-TPU-safe): the whole test runs inside one jit
with a lax.fori_loop and a value readback, so per-call dispatch and the
remote sync are amortized (see bench.py).
"""

from __future__ import annotations

import argparse
import json
import platform
import statistics
import sys
import time


def _ints(csv: str) -> list[int]:
    return [int(x) for x in csv.split(",") if x != ""]


SYNTH_SHAPES = {
    # name -> tiny_config kwargs (Llama-3-8B / 1B-ish shapes)
    "8b": dict(n_layers=32, n_embd=4096, n_heads=32, n_kv_heads=8, head_dim=128,
               n_ff=14336, n_vocab=128256, n_ctx_train=8192, rope_base=500000.0,
               rope_dim=128),
    "1b": dict(n_layers=16, n_embd=2048, n_heads=32, n_kv_heads=8, head_dim=64,
               n_ff=8192, n_vocab=128256, rope_dim=64),
    "tiny": dict(n_layers=4, n_embd=1024, n_heads=16, n_kv_heads=8, head_dim=64,
                 n_ff=2816, n_vocab=32000, rope_dim=64),
}


def run_test(cfg, params, opts, *, batch: int, n_prompt: int, n_gen: int,
             ctx: int, reps: int) -> dict:
    """One matrix cell; returns timing stats."""
    import jax
    import jax.numpy as jnp

    from ..models.llama import forward, init_kv_caches

    B = batch
    T = max(ctx, n_prompt + n_gen + 2)
    kv = init_kv_caches(cfg, B, T)

    if n_prompt > 0:
        @jax.jit
        def pp(params, kv, toks):
            positions = jnp.broadcast_to(
                jnp.arange(n_prompt, dtype=jnp.int32), (B, n_prompt))
            logits, kv = forward(params, cfg, toks, positions, kv,
                                 jnp.zeros(B, jnp.int32), opts)
            return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32), kv

        toks = jnp.ones((B, n_prompt), jnp.int32)
        out, _ = pp(params, kv, toks)
        _ = int(out[0])  # sync (tunnel-safe readback)
        times = []
        for _r in range(reps):
            t0 = time.perf_counter()
            out, _ = pp(params, kv, toks)
            _ = int(out[0])
            times.append(n_prompt * B / (time.perf_counter() - t0))
        n_tok = n_prompt
    else:
        @jax.jit
        def tg(params, kv, token, pos0):
            def body(i, carry):
                kv, token = carry
                pos = pos0 + i
                logits, kv = forward(params, cfg, token, pos[:, None], kv, pos, opts)
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                return (kv, nxt[:, None])
            return jax.lax.fori_loop(0, n_gen, body, (kv, token))

        token = jnp.ones((B, 1), jnp.int32)
        pos0 = jnp.ones((B,), jnp.int32)
        out = tg(params, kv, token, pos0)
        _ = int(out[1][0, 0])
        times = []
        for _r in range(reps):
            t0 = time.perf_counter()
            out = tg(params, kv, token, pos0)
            _ = int(out[1][0, 0])
            times.append(n_gen * B / (time.perf_counter() - t0))
        n_tok = n_gen

    return {
        "avg_ts": statistics.fmean(times),
        "stddev_ts": statistics.stdev(times) if len(times) > 1 else 0.0,
        "max_ts": max(times),
        "n_tokens": n_tok,
    }


def fmt_markdown(rows: list[dict]) -> str:
    hdr = ["model", "size", "params", "backend", "n_batch", "test", "t/s"]
    out = ["| " + " | ".join(hdr) + " |",
           "| " + " | ".join("-" * len(h) for h in hdr) + " |"]
    for r in rows:
        out.append("| {model} | {size_gib:.2f} GiB | {n_params_b:.2f} B | {backend} "
                   "| {n_batch} | {test} | {avg_ts:.2f} ± {stddev_ts:.2f} |".format(**r))
    return "\n".join(out)


def fmt_csv(rows: list[dict]) -> str:
    keys = list(rows[0].keys())
    lines = [",".join(keys)]
    for r in rows:
        lines.append(",".join(str(r[k]) for k in keys))
    return "\n".join(lines)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="prima-bench", description=__doc__)
    ap.add_argument("-m", "--model", help="GGUF file (or use --synth)")
    ap.add_argument("--synth", choices=sorted(SYNTH_SHAPES),
                    help="synthetic Q4_K weights of a named shape (no file IO)")
    ap.add_argument("-p", "--n-prompt", default="512", type=_ints,
                    help="CSV prompt sizes; 0 skips the pp test")
    ap.add_argument("-n", "--n-gen", default="128", type=_ints,
                    help="CSV generation lengths; 0 skips the tg test")
    ap.add_argument("-b", "--batch-size", default="1", type=_ints)
    ap.add_argument("-c", "--ctx-size", type=int, default=1024)
    ap.add_argument("-r", "--reps", type=int, default=3)
    ap.add_argument("--matmul", default=None, choices=["pallas", "xla"])
    ap.add_argument("-o", "--output", default="md",
                    choices=["md", "csv", "json", "jsonl"])
    args = ap.parse_args(argv)
    if not args.model and not args.synth:
        ap.error("need -m or --synth")

    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() == "tpu"
    matmul = args.matmul or ("pallas" if on_tpu else "xla")
    if not on_tpu:
        import os

        os.environ.setdefault("PRIMA_PALLAS_INTERPRET", "1")

    from ..models.llama import ForwardOptions

    opts = ForwardOptions(matmul_impl=matmul)
    if args.model:
        from ..models.loader import load_model

        model = load_model(args.model)
        cfg, params = model.cfg, model.params
        name = args.model.rsplit("/", 1)[-1]
    else:
        from ..gguf.constants import GGMLType
        from ..models.config import tiny_config
        from ..models.llama import synth_params_device

        cfg = tiny_config(**SYNTH_SHAPES[args.synth])
        params = jax.jit(lambda: synth_params_device(cfg, GGMLType.Q4_K))()
        jax.block_until_ready(jax.tree.leaves(params)[0])
        name = f"synth-{args.synth}-Q4_K"

    n_params = cfg.n_layers * (
        cfg.n_embd * (cfg.n_heads + 2 * cfg.n_kv_heads) * cfg.head_dim
        + cfg.n_heads * cfg.head_dim * cfg.n_embd + 3 * cfg.n_embd * cfg.n_ff
    ) + 2 * cfg.n_vocab * cfg.n_embd
    size_bytes = sum(
        leaf.size * leaf.dtype.itemsize for leaf in jax.tree.leaves(params)
    )

    base = {
        "model": name,
        "size_gib": size_bytes / 2**30,
        "n_params_b": n_params / 1e9,
        "backend": jax.devices()[0].device_kind if on_tpu else "cpu",
        "matmul": matmul,
        "host": platform.node(),
    }

    rows = []
    for b in args.batch_size:
        for p in args.n_prompt:
            if p > 0:
                r = run_test(cfg, params, opts, batch=b, n_prompt=p, n_gen=0,
                             ctx=args.ctx_size, reps=args.reps)
                rows.append({**base, "n_batch": b, "test": f"pp{p}", **r})
                print(f"  pp{p} b={b}: {r['avg_ts']:.2f} t/s", file=sys.stderr)
        for g in args.n_gen:
            if g > 0:
                r = run_test(cfg, params, opts, batch=b, n_prompt=0, n_gen=g,
                             ctx=args.ctx_size, reps=args.reps)
                rows.append({**base, "n_batch": b, "test": f"tg{g}", **r})
                print(f"  tg{g} b={b}: {r['avg_ts']:.2f} t/s", file=sys.stderr)

    if args.output == "md":
        print(fmt_markdown(rows))
    elif args.output == "csv":
        print(fmt_csv(rows))
    elif args.output == "json":
        print(json.dumps(rows, indent=2))
    else:
        for r in rows:
            print(json.dumps(r))
    return 0


if __name__ == "__main__":
    sys.exit(main())
