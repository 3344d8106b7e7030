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

import numpy as np


def parse_lw(s: str | None) -> list[int] | None:
    if not s:
        return None
    return [int(x) for x in s.split(",")]


def run_distributed(args, prompt: str) -> int:
    import jax.numpy as jnp

    from ..gguf.reader import GGUFModel
    from ..models.config import ModelConfig
    from ..models.llama import ForwardOptions, load_params
    from ..parallel.bootstrap import RingConfig, RingNode, bootstrap
    from ..parallel.ring_host import RingPlan
    from ..parallel.ring_tcp import RingContext, TcpRingMaster, TcpRingWorker, relay_loop
    from ..profiler.device import profile_device
    from ..profiler.model_cost import model_cost_from_gguf
    from ..tokenizer import Tokenizer

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
        return 0

    plan = RingPlan(windows=res.w, k=res.k)
    ctx = RingContext(node, plan, res.rank, res.world)
    ranges = plan.layer_ranges()[res.rank]
    owned = set()
    for lo, hi in ranges:
        owned.update(range(lo, hi))
    print(f"rank {res.rank}/{res.world}: layers {sorted(owned)} (k={res.k})",
          file=sys.stderr)

    opts = ForwardOptions(matmul_impl=args.matmul)
    params = load_params(m, cfg, layer_filter=lambda i: i in owned,
                         with_embedding=res.rank == 0, with_output=res.rank == 0)

    if res.rank != 0:
        worker = TcpRingWorker(ctx, cfg, params, max_seq=args.ctx_size, opts=opts)
        worker.serve()
        node.close()
        return 0

    # master: tokenize, prefill, decode, stream
    from .cli import make_sampler
    from ..models.loader import LoadedModel

    tok = Tokenizer.from_gguf(m)
    model = LoadedModel(cfg, params, tok, m)
    sampler = make_sampler(args, model, tok.vocab.n_tokens)
    master = TcpRingMaster(ctx, cfg, params, max_seq=args.ctx_size, opts=opts)

    toks = tok.encode(prompt, add_special=True, parse_special=True)
    if not args.no_display_prompt:
        sys.stdout.write(prompt)
    # prefill in n_batch chunks (all but the last token)
    pos = 0
    while pos < len(toks) - 1:
        chunk = toks[pos : min(pos + args.batch_size, len(toks) - 1)]
        p = np.arange(pos, pos + len(chunk), dtype=np.int32)[None]
        master.decode(np.asarray([chunk], np.int32), p)
        pos += len(chunk)

    cur = toks[-1]
    n_predict = args.n_predict if args.n_predict >= 0 else 128
    buf = b""
    for _ in range(n_predict):
        p = np.asarray([[int(master.cache_pos[0])]], np.int32)
        logits = master.decode(np.asarray([[cur]], np.int32), p)
        cur = sampler.sample_and_accept(logits[0])
        if cur in model.eog_ids:
            break
        buf += tok.decode_token_bytes(cur)
        try:
            sys.stdout.write(buf.decode("utf-8"))
            sys.stdout.flush()
            buf = b""
        except UnicodeDecodeError:
            pass
    sys.stdout.write("\n")
    master.stop()
    node.close()
    return 0
