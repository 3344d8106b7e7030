"""prima-server launcher: python -m prima_tpu.server -m model.gguf [...]"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    def env(name, default=None):
        return os.environ.get(f"LLAMA_ARG_{name}", default)

    ap = argparse.ArgumentParser(prog="prima-server")
    ap.add_argument("-m", "--model", default=env("MODEL"), required=env("MODEL") is None)
    ap.add_argument("--host", default=env("HOST", "127.0.0.1"))
    ap.add_argument("--port", type=int, default=int(env("PORT", 8080)))
    ap.add_argument("-c", "--ctx-size", type=int, default=int(env("CTX_SIZE", 2048)))
    ap.add_argument("-np", "--parallel", type=int, default=int(env("N_PARALLEL", 4)),
                    help="number of server slots")
    ap.add_argument("-b", "--batch-size", type=int, default=256)
    ap.add_argument("--matmul", default="pallas", choices=["pallas", "xla"])
    ap.add_argument("-ctk", "--cache-type-k", default="bf16",
                    choices=["f32", "bf16", "q8_0", "q4_0"], dest="cache_type")
    ap.add_argument("--alias", default="prima-tpu")
    ap.add_argument("--lora", action="append", default=[], metavar="FNAME",
                    help="LoRA adapter GGUF (repeatable)")
    ap.add_argument("--lora-scaled", action="append", default=[], nargs=2,
                    metavar=("FNAME", "SCALE"),
                    help="LoRA adapter GGUF with user scale (repeatable)")
    ap.add_argument("-md", "--model-draft", default=env("MODEL_DRAFT"),
                    help="draft model GGUF for speculative decoding")
    ap.add_argument("--draft-max", "--draft", type=int, default=8,
                    dest="draft_max", help="max tokens drafted per round")
    ap.add_argument("--draft-p-min", type=float, default=0.75,
                    help="draft confidence floor")
    ap.add_argument("--slot-save-path", default=env("SLOT_SAVE_PATH"),
                    help="confine /slots save/restore files to this dir")
    args = ap.parse_args(argv)

    from ..gguf.reader import GGUFModel
    from ..models.loader import load_model
    from ..models.llama import ForwardOptions
    from ..runtime.engine import Engine
    from .app import serve

    print(f"loading {args.model} ...", file=sys.stderr)
    probe = GGUFModel.open(args.model)
    arch = probe.arch
    probe.close()
    if arch in ("bert", "nomic-bert"):  # embedding model: /v1/embeddings only
        from ..models.bert import BertModelRuntime
        from .app import serve_embeddings

        rt = BertModelRuntime.load(args.model)
        rt.embed(["warmup"])
        httpd = serve_embeddings(rt, args.host, args.port, args.alias)
        print(f"embeddings server on http://{args.host}:{args.port}", file=sys.stderr)
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        return 0
    model = load_model(args.model)
    import jax.numpy as jnp

    kv_dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16, "q8_0": "q8_0", "q4_0": "q4_0"}[args.cache_type]
    engine = Engine(model.cfg, model.params, n_slots=args.parallel,
                    max_seq=args.ctx_size, n_batch=args.batch_size,
                    opts=ForwardOptions(matmul_impl=args.matmul),
                    eog_ids=model.eog_ids, kv_dtype=kv_dtype)
    # warmup decode so the first request doesn't pay jit compilation
    # (the reference's BOS/EOS warmup, common.cpp:1959-1997)
    bos = model.tokenizer.vocab.bos_id
    engine.run_to_completion([bos if bos >= 0 else 0], n_predict=1)
    print("warmup done", file=sys.stderr)

    loras = []
    specs = [(p, 1.0) for p in args.lora] + [
        (p, float(s)) for p, s in args.lora_scaled]
    if specs:
        from ..models.adapters import load_lora_gguf

        for i, (path, scale) in enumerate(specs):
            loras.append({"id": i, "path": path, "scale": scale,
                          "data": load_lora_gguf(path, scale=1.0)})

    spec = None
    if args.model_draft:
        from ..runtime.speculative import SpeculativeDecoder

        print(f"loading draft {args.model_draft} ...", file=sys.stderr)
        dmodel = load_model(args.model_draft)
        deng = Engine(dmodel.cfg, dmodel.params, n_slots=1,
                      max_seq=args.ctx_size,
                      opts=ForwardOptions(matmul_impl=args.matmul),
                      eog_ids=dmodel.eog_ids)
        spec = SpeculativeDecoder(engine, deng, n_draft=args.draft_max,
                                  p_min=args.draft_p_min)

    httpd, _ctx = serve(model, engine, args.host, args.port, args.alias,
                        loras=loras, spec=spec,
                        slot_save_dir=args.slot_save_path)
    if loras:
        _ctx.set_lora_scales(
            [{"id": r["id"], "scale": r["scale"]} for r in loras])
    print(f"listening on http://{args.host}:{args.port}", file=sys.stderr)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
