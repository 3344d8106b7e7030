"""Distributed CLI flow: the llama_init_from_gpt_params bootstrap + decode.

Run one process per device (the reference's one-command-per-device model,
README.md:232-268):

  rank 0: prima-cli -m m.gguf -w 3 --rank 0 -p "..." [-lw 16,8,8] [-k 2]
  rank 1: prima-cli -m m.gguf -w 3 --rank 1
  rank 2: prima-cli -m m.gguf -w 3 --rank 2

Flow (common/common.cpp:1663-2003): ring TCP setup -> startup-args bcast ->
device profile gather -> rank-0 MILP solve (or -lw manual) -> layer-setup
bcast -> rank-filtered model load -> master drives decode, workers serve,
scheduler-removed devices become pure forwarders.
"""

from __future__ import annotations

import sys


def parse_lw(s: str | None) -> list[int] | None:
    if not s:
        return None
    return [int(x) for x in s.split(",")]


def setup_ring(args):
    """Bootstrap one TCP-ring rank: connect (with optional topology
    rebuild), auto-schedule via profile + MILP unless -lw is given, load
    the rank's windowed params with the resident/streamed split, and
    return everything a master or worker runtime needs. Returns None when
    this rank was assigned no layers (it relayed until STOP and exited) —
    the shared half of llama_init_from_gpt_params (common.cpp:1663-2003),
    used by both the CLI and the ring server."""
    import types

    import jax.numpy as jnp

    from ..gguf.reader import GGUFModel
    from ..models.config import ModelConfig, apply_rope_overrides
    from ..models.llama import ForwardOptions, load_params
    from ..parallel.bootstrap import RingConfig, RingNode, bootstrap
    from ..parallel.ring_host import RingPlan
    from ..parallel.ring_tcp import RingContext, relay_loop
    from ..profiler.device import profile_device
    from ..profiler.model_cost import model_cost_from_gguf

    node = RingNode(RingConfig(
        rank=args.rank, world=args.world, master_ip=args.master_ip,
        next_ip=args.next_ip, data_port=args.data_port,
    ))
    grace = getattr(args, "topo_grace", 0.0)
    if grace > 0:
        # llama_rebuild_topo analogue: build the ring over the ranks that
        # actually register within the grace window (dead hosts skipped,
        # rank/world renumbered densely)
        node.connect_ring_robust(grace=grace)
        if node.rank != args.rank or node.world != args.world:
            print(f"rebuild_topo: rank {args.rank} -> {node.rank}, "
                  f"world {args.world} -> {node.world}", file=sys.stderr)
        args.rank, args.world = node.rank, node.world
    else:
        node.connect_ring()

    m = GGUFModel.open(args.model)
    cfg = ModelConfig.from_gguf(m)
    # rope overrides must apply identically on EVERY rank (each rank ropes
    # its own windows)
    apply_rope_overrides(
        cfg, rope_scaling=getattr(args, "rope_scaling", None),
        rope_freq_base=getattr(args, "rope_freq_base", 0.0),
        rope_freq_scale=getattr(args, "rope_freq_scale", 0.0),
        yarn_orig_ctx=getattr(args, "yarn_orig_ctx", 0),
        yarn_ext_factor=getattr(args, "yarn_ext_factor", -1.0),
        yarn_attn_factor=getattr(args, "yarn_attn_factor", -1.0),
        yarn_beta_fast=getattr(args, "yarn_beta_fast", -1.0),
        yarn_beta_slow=getattr(args, "yarn_beta_slow", -1.0))
    if args.ctx_size == 0:  # -c 0: the model's training context (common.cpp)
        args.ctx_size = cfg.n_ctx_train
    cost = model_cost_from_gguf(m)
    manual_w = parse_lw(getattr(args, "n_layer_window", None))
    if manual_w is not None and len(manual_w) != args.world:
        # topology rebuild shrank the ring: manual windows no longer apply
        print(f"-lw has {len(manual_w)} entries but ring world is "
              f"{args.world}; falling back to auto schedule", file=sys.stderr)
        manual_w = None
    if manual_w is None:
        profile = profile_device(full=True, bench_disk=False)
    else:
        # manual -lw skips profiling entirely (README FAQ #1 / auto_schedule
        # check, common.cpp:1717) — benches would only delay the ring
        from ..profiler.device import DeviceProfile, _mem_info

        mi = _mem_info()
        profile = DeviceProfile(host_ram_total=mi["host_ram_total"],
                                host_ram_avail=mi["host_ram_avail"])

    res = bootstrap(node, profile, cost, n_ctx=args.ctx_size,
                    master_priority=getattr(args, "master_priority", 1.01),
                    force_k=getattr(args, "n_cycles", None) or None,
                    manual_w=manual_w)
    if not res.is_active:
        # the reference's forwarder role: relay until STOP, then exit
        print("No layer is assigned to me; relaying.", file=sys.stderr)
        relay_loop(node)
        node.close()
        return None

    plan = RingPlan(windows=res.w, k=res.k)
    ctx = RingContext(node, plan, res.rank, res.world)
    ranges = plan.layer_ranges()[res.rank]
    owned = set()
    for lo, hi in ranges:
        owned.update(range(lo, hi))
    print(f"rank {res.rank}/{res.world}: layers {sorted(owned)} (k={res.k})",
          file=sys.stderr)

    opts = ForwardOptions(matmul_impl=args.matmul)
    # resident/streamed split: n[m] layers of each window stay HBM-resident
    # (the reference keeps the LAST n of each window on the fast device,
    # src/llama.cpp:7597-7605); the rest live host-packed and stream
    # HBM-ward per cycle (manage_graph_tensors @18152). -ngl overrides the
    # scheduler's n[m].
    n_res = getattr(args, "n_gpu_layers", -1)
    if n_res is None or n_res < 0:
        n_res = res.n[res.rank]
    streamed_ids: set[int] = set()
    for lo, hi in ranges:
        nr = min(max(n_res, 0), hi - lo)
        streamed_ids.update(range(lo, hi - nr))
    resident = owned - streamed_ids
    params = load_params(m, cfg, layer_filter=lambda i: i in resident,
                         with_embedding=res.rank == 0, with_output=res.rank == 0,
                         fuse=getattr(args, "fuse", False))
    streamed_host = None
    if streamed_ids:
        from ..models.llama import gguf_host_layer
        from ..runtime.streaming import pack_host_layer

        print(f"rank {res.rank}: streaming {len(streamed_ids)} of "
              f"{len(owned)} layers from host RAM", file=sys.stderr)
        streamed_host = {
            i: pack_host_layer(gguf_host_layer(m, cfg, i),
                               pallas=args.matmul == "pallas")
            for i in sorted(streamed_ids)}

    kv_dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16,
                "q8_0": "q8_0", "q4_0": "q4_0"}[
                    getattr(args, "cache_type", "bf16")]
    return types.SimpleNamespace(
        node=node, ctx=ctx, cfg=cfg, params=params, res=res, m=m,
        opts=opts, kv_dtype=kv_dtype, streamed_host=streamed_host,
        owned=owned)


def run_distributed(args, prompt: str) -> int:
    from ..parallel.ring_tcp import TcpRingEngine, TcpRingWorker
    from ..tokenizer import Tokenizer

    rt = setup_ring(args)
    if rt is None:
        return 0
    node, ctx, cfg, params = rt.node, rt.ctx, rt.cfg, rt.params
    res, m, opts, kv_dtype = rt.res, rt.m, rt.opts, rt.kv_dtype
    streamed_host = rt.streamed_host
    if res.rank != 0:
        worker = TcpRingWorker(ctx, cfg, params, max_seq=args.ctx_size,
                               opts=opts, kv_dtype=kv_dtype,
                               streamed_host=streamed_host)
        worker.serve()
        node.close()
        return 0

    # master: tokenize, then drive the full ring engine (sampler chain,
    # context shift, Self-Extend, reverse prompts, conversation mode — the
    # reference CLI's feature set) through the same streaming loop as the
    # single-chip CLI
    from ..models.loader import LoadedModel
    from .cli import _stream_generate, make_sampler

    tok = Tokenizer.from_gguf(m)
    model = LoadedModel(cfg, params, tok, m)
    ga_n = getattr(args, "grp_attn_n", 1)
    n_batch = max(1, min(args.batch_size, args.ctx_size))
    eng = TcpRingEngine(
        ctx, cfg, params, n_slots=1, n_groups=1, max_seq=args.ctx_size,
        n_batch=n_batch, opts=opts, eog_ids=model.eog_ids,
        kv_dtype=kv_dtype,
        ctx_shift=(not getattr(args, "no_context_shift", False)
                   and ga_n == 1),
        n_keep=getattr(args, "n_keep", 0),
        grp_attn_n=ga_n, grp_attn_w=getattr(args, "grp_attn_w", 512),
        streamed_host=streamed_host)

    # any master-side failure (oversized prompt, sampler error, Ctrl-C)
    # must still propagate STOP, or every worker blocks forever on recv
    try:
        if getattr(args, "conversation", False):
            from ..server.chat import apply_chat_template

            tmpl = (getattr(args, "chat_template", None)
                    or m.get("tokenizer.chat_template"))
            msgs = []
            if prompt.strip():
                msgs.append({"role": "system", "content": prompt})
            print("== conversation mode: empty line or Ctrl-D to exit ==",
                  file=sys.stderr)
            while True:
                try:
                    line = input("> ")
                except EOFError:
                    break
                if not line.strip():
                    break
                msgs.append({"role": "user", "content": line})
                text = apply_chat_template(msgs, tmpl, tok.vocab,
                                           add_generation_prompt=True)
                toks = tok.encode(text, add_special=True, parse_special=True)
                sampler = make_sampler(args, model, tok.vocab.n_tokens)
                out = _stream_generate(eng, model, sampler, toks,
                                       args.n_predict, args.reverse_prompt)
                msgs.append({"role": "assistant", "content": out})
                print()
        elif getattr(args, "model_draft", None):
            # distributed speculative decoding: the draft model lives WHOLE
            # on rank 0 (server.cpp:715-733 / speculative.cpp:73-76) and the
            # ring engine batch-verifies the chain across all ranks
            from ..models.loader import load_model
            from ..runtime.engine import Engine
            from ..runtime.speculative import SpeculativeDecoder

            dmodel = load_model(args.model_draft)
            deng = Engine(dmodel.cfg, dmodel.params, n_slots=1,
                          max_seq=args.ctx_size, opts=opts,
                          eog_ids=dmodel.eog_ids)
            spec = SpeculativeDecoder(
                eng, deng, n_draft=getattr(args, "draft_max", 8),
                p_min=getattr(args, "draft_p_min", 0.75))
            toks = tok.encode(prompt, add_special=True, parse_special=True)
            if not args.no_display_prompt:
                sys.stdout.write(prompt)
            if args.n_predict != 0:
                sampler = make_sampler(args, model, tok.vocab.n_tokens)
                n = args.n_predict if args.n_predict > 0 else 128
                buf = b""
                for chunk in spec.generate_stream(toks, sampler, n):
                    for t in chunk:
                        buf += tok.decode_token_bytes(t)
                        try:
                            sys.stdout.write(buf.decode("utf-8"))
                            buf = b""
                            sys.stdout.flush()
                        except UnicodeDecodeError:
                            continue
            sys.stdout.write("\n")
        else:
            toks = tok.encode(prompt, add_special=True, parse_special=True)
            if not args.no_display_prompt:
                sys.stdout.write(prompt)
            if args.n_predict != 0:
                sampler = make_sampler(args, model, tok.vocab.n_tokens)
                _stream_generate(eng, model, sampler, toks, args.n_predict,
                                 args.reverse_prompt)
            sys.stdout.write("\n")
    finally:
        ctx.node.send_stop()
        node.close()
    return 0
