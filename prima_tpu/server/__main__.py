"""prima-server launcher: python -m prima_tpu.server -m model.gguf [...]"""

from __future__ import annotations

import argparse
import os
import sys


def _load_api_keys(args) -> list[str]:
    """--api-key flags plus one key per line of --api-key-file."""
    keys = list(args.api_key or [])
    if args.api_key_file:
        with open(args.api_key_file) as f:
            keys += [ln.strip() for ln in f if ln.strip()]
    return keys


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
    ap.add_argument("--fuse", action="store_true",
                    help="fuse Q/K/V and gate/up weights at load where quant "
                         "types match (fewer GEMV launches per layer)")
    ap.add_argument("-ngl", "--n-gpu-layers", type=int, default=-1,
                    help="ring mode: HBM-resident layers per window, the "
                         "rest stream from host RAM each cycle")
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
    ap.add_argument("--rope-scaling", choices=["none", "linear", "yarn"],
                    default=None)
    ap.add_argument("--rope-freq-base", type=float, default=0.0)
    ap.add_argument("--rope-freq-scale", type=float, default=0.0,
                    help="position scale (1/factor); 0.25 = 4x context")
    ap.add_argument("--yarn-orig-ctx", type=int, default=0)
    ap.add_argument("--yarn-ext-factor", type=float, default=-1.0)
    ap.add_argument("--yarn-attn-factor", type=float, default=-1.0)
    ap.add_argument("--yarn-beta-fast", type=float, default=-1.0)
    ap.add_argument("--yarn-beta-slow", type=float, default=-1.0)
    ap.add_argument("--no-context-shift", action="store_true",
                    help="stop at context_full instead of shifting "
                         "(reference --no-context-shift; shift is default)")
    ap.add_argument("--keep", type=int, default=0,
                    help="tokens to keep at the start on context shift")
    ap.add_argument("-gan", "--grp-attn-n", type=int, default=1,
                    help="Self-Extend group factor (disables context shift)")
    ap.add_argument("-gaw", "--grp-attn-w", type=int, default=512,
                    help="Self-Extend group window")
    ap.add_argument("--slot-save-path", default=env("SLOT_SAVE_PATH"),
                    help="confine /slots save/restore files to this dir")
    ap.add_argument("--api-key", action="append", default=None,
                    metavar="KEY", help="API key for Bearer auth on "
                    "completion/embedding endpoints (repeatable)")
    ap.add_argument("--api-key-file", default=env("API_KEY_FILE"),
                    help="file with one API key per line")
    ap.add_argument("--override-kv", action="append", default=[],
                    metavar="KEY=TYPE:VALUE",
                    help="override model metadata (int/float/bool/str); "
                         "repeatable")
    # distributed (mesh) mode: serve a piped-ring pipelined model — the
    # analogue of llama-server driving the distributed ring
    # (server.cpp:2431 llama_decode(ctx, batch_view, true))
    ap.add_argument("--pp", type=int, default=int(env("PP", 1)),
                    help="pipeline stages (layer windows over the mesh)")
    ap.add_argument("--tp", type=int, default=int(env("TP", 1)),
                    help="tensor-parallel ranks per stage")
    ap.add_argument("--dp", type=int, default=int(env("DP", 1)),
                    help="data-parallel replicas")
    ap.add_argument("-k", "--n-cycles", type=int, default=0,
                    help="piped-ring cycles per token (reference -k; "
                         "0 = solver-chosen in ring mode, 1 in mesh mode)")
    # multi-process (TCP ring) mode: one server process per host, rank 0
    # serves HTTP — the reference's llama-server -w/--rank flow
    ap.add_argument("-w", "--world", type=int, default=int(env("WORLD", 1)),
                    help="TCP ring size (1 = no ring)")
    ap.add_argument("--rank", type=int, default=int(env("RANK", 0)))
    ap.add_argument("-mip", "--master-ip", default="127.0.0.1")
    ap.add_argument("-nip", "--next-ip", default="127.0.0.1")
    ap.add_argument("--data-port", type=int, default=9337)
    ap.add_argument("-lw", "--n-layer-window", default=None,
                    help="CSV layer windows per rank (manual mode)")
    from ..utils.args import apply_env_defaults

    apply_env_defaults(ap)  # PRIMA_ARG_*/LLAMA_ARG_* fallbacks
    args = ap.parse_args(argv)

    from ..gguf.reader import GGUFModel
    from ..models.loader import load_model
    from ..models.llama import ForwardOptions
    from ..runtime.engine import Engine
    from .app import serve

    print(f"loading {args.model} ...", file=sys.stderr)
    probe = GGUFModel.open(args.model)
    arch = probe.arch
    if args.ctx_size == 0:  # -c 0: the model's training context (common.cpp)
        # read the KV directly: encoder archs (bert) have no decoder config
        args.ctx_size = int(probe.get(f"{arch}.context_length") or 2048)
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
    import jax.numpy as jnp

    kv_dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16, "q8_0": "q8_0", "q4_0": "q4_0"}[args.cache_type]
    # Self-Extend disables context shift (reference server.cpp:2034
    # `if (slot.ga_n == 1)` guards the shift path)
    ctx_shift = not args.no_context_shift and args.grp_attn_n == 1

    def rope_overrides(cfg):
        from ..models.config import apply_rope_overrides

        return apply_rope_overrides(
            cfg, rope_scaling=args.rope_scaling,
            rope_freq_base=args.rope_freq_base,
            rope_freq_scale=args.rope_freq_scale,
            yarn_orig_ctx=args.yarn_orig_ctx,
            yarn_ext_factor=args.yarn_ext_factor,
            yarn_attn_factor=args.yarn_attn_factor,
            yarn_beta_fast=args.yarn_beta_fast,
            yarn_beta_slow=args.yarn_beta_slow)
    if args.world > 1:
        return _ring_main(args)

    n_mesh = args.pp * args.tp * args.dp
    if n_mesh > 1 and (args.lora or args.lora_scaled):
        print("--lora is not supported in mesh-distributed mode", file=sys.stderr)
        return 1
    if n_mesh > 1:
        # mesh-distributed serving: slots live on the microbatch grid
        import functools

        from ..models.config import ModelConfig
        from ..models.llama import gguf_host_head, gguf_host_layer
        from ..parallel.engine import DistributedEngine
        from ..parallel.mesh import make_mesh
        from ..parallel.pipeline import PipeSpec, build_pipe_model
        from ..tokenizer import Tokenizer

        m = GGUFModel.open(args.model)
        cfg = rope_overrides(ModelConfig.from_gguf(m))
        mesh = make_mesh(dp=args.dp, pp=args.pp, tp=args.tp)
        micro = max(args.pp, 1)
        bpm = max(1, -(-args.parallel // micro))  # slots = micro * bpm
        bpm = -(-bpm // args.dp) * args.dp  # dp shards the microbatch rows
        spec = PipeSpec.for_model(cfg, n_pp=args.pp, n_tp=args.tp,
                                  n_dp=args.dp, k_cycles=args.n_cycles or 1,
                                  microbatches=micro)
        pallas = args.matmul == "pallas"
        params = build_pipe_model(
            functools.partial(gguf_host_layer, m, cfg), gguf_host_head(m, cfg),
            cfg, spec, mesh, pallas=pallas)
        tok = Tokenizer.from_gguf(m)
        from ..models.loader import LoadedModel

        model = LoadedModel(cfg, params, tok, m)
        engine = DistributedEngine(
            cfg, params, spec, mesh, batch_per_micro=bpm,
            max_seq=args.ctx_size, n_batch=args.batch_size,
            opts=ForwardOptions(matmul_impl=args.matmul),
            eog_ids=model.eog_ids, kv_dtype=kv_dtype,
            ctx_shift=ctx_shift, n_keep=args.keep,
            grp_attn_n=args.grp_attn_n, grp_attn_w=args.grp_attn_w)
    else:
        from ..models.loader import parse_kv_override

        # LoRA adapters target the unfused tensor names — never fuse with one
        model = load_model(args.model,
                           fuse=args.fuse and not (args.lora or args.lora_scaled),
                           kv_overrides=dict(parse_kv_override(s)
                                             for s in args.override_kv))
        rope_overrides(model.cfg)
        engine = Engine(model.cfg, model.params, n_slots=args.parallel,
                        max_seq=args.ctx_size, n_batch=args.batch_size,
                        opts=ForwardOptions(matmul_impl=args.matmul),
                        eog_ids=model.eog_ids, kv_dtype=kv_dtype,
                        ctx_shift=ctx_shift, n_keep=args.keep,
                        grp_attn_n=args.grp_attn_n,
                        grp_attn_w=args.grp_attn_w)
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
        # one draft slot per server slot: per-slot concurrent speculation
        deng = Engine(dmodel.cfg, dmodel.params, n_slots=args.parallel,
                      max_seq=args.ctx_size,
                      opts=ForwardOptions(matmul_impl=args.matmul),
                      eog_ids=dmodel.eog_ids)
        spec = SpeculativeDecoder(engine, deng, n_draft=args.draft_max,
                                  p_min=args.draft_p_min)

    httpd, _ctx = serve(model, engine, args.host, args.port, args.alias,
                        loras=loras, spec=spec,
                        slot_save_dir=args.slot_save_path,
                        api_keys=_load_api_keys(args))
    if loras:
        _ctx.set_lora_scales(
            [{"id": r["id"], "scale": r["scale"]} for r in loras])
    print(f"listening on http://{args.host}:{args.port}", file=sys.stderr)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


def _ring_main(args) -> int:
    """Multi-process serving: rank 0 = HTTP server over a TcpRingEngine,
    workers = batched window service loops. The analogue of running
    llama-server as the rank-0 command of a prima.cpp ring
    (reference README 'use prima.cpp in your apps' + server.cpp:2431)."""
    from ..parallel.ring_tcp import TcpRingEngine, TcpRingWorker
    from ..tools.cli_distributed import setup_ring

    n_slots = max(1, args.parallel)
    n_groups = max(1, min(args.world, n_slots))
    while n_slots % n_groups:
        n_groups -= 1

    # shared bootstrap: ring connect, auto schedule (profile + MILP) when
    # -lw is absent, rank-filtered load, resident/streamed split, relays
    rt = setup_ring(args)
    if rt is None:
        return 0
    node, ctx, cfg, params = rt.node, rt.ctx, rt.cfg, rt.params
    m, opts, kv_dtype = rt.m, rt.opts, rt.kv_dtype
    streamed_host, owned = rt.streamed_host, rt.owned
    args.rank, args.world = rt.res.rank, rt.res.world

    if args.rank != 0:
        worker = TcpRingWorker(ctx, cfg, params, max_seq=args.ctx_size,
                               opts=opts, n_slots=n_slots, n_groups=n_groups,
                               kv_dtype=kv_dtype, streamed_host=streamed_host)
        print(f"rank {args.rank}: serving ring windows {sorted(owned)}",
              file=sys.stderr)
        worker.serve()
        node.close()
        return 0

    from ..models.loader import LoadedModel
    from ..tokenizer import Tokenizer
    from .app import serve

    tok = Tokenizer.from_gguf(m)
    model = LoadedModel(cfg, params, tok, m)
    engine = TcpRingEngine(ctx, cfg, params, n_slots=n_slots,
                           n_groups=n_groups, max_seq=args.ctx_size,
                           n_batch=args.batch_size, opts=opts,
                           eog_ids=model.eog_ids, kv_dtype=kv_dtype,
                           ctx_shift=(not args.no_context_shift
                                      and args.grp_attn_n == 1),
                           n_keep=args.keep, grp_attn_n=args.grp_attn_n,
                           grp_attn_w=args.grp_attn_w,
                           streamed_host=streamed_host)
    spec = None
    if args.model_draft:
        # ring speculative serving: draft whole on rank 0, ring-verified
        # target (server.cpp:715-733)
        from ..models.loader import load_model
        from ..runtime.engine import Engine
        from ..runtime.speculative import SpeculativeDecoder

        dmodel = load_model(args.model_draft)
        deng = Engine(dmodel.cfg, dmodel.params, n_slots=engine.n_slots,
                      max_seq=args.ctx_size, opts=opts,
                      eog_ids=dmodel.eog_ids)
        spec = SpeculativeDecoder(engine, deng, n_draft=args.draft_max,
                                  p_min=args.draft_p_min)
    httpd, _ctx = serve(model, engine, args.host, args.port, args.alias,
                        spec=spec, api_keys=_load_api_keys(args))
    print(f"listening on http://{args.host}:{args.port} "
          f"(ring world={args.world})", file=sys.stderr)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    engine.stop()
    node.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
