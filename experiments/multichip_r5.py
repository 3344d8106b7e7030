"""Per-stage wall-time breakdown of the multi-chip pipeline + the
scaling-efficiency projection (VERDICT r4 task 7).

Runs on the virtual 8-device CPU mesh (the same surface the driver's
dryrun_multichip uses). Times FOUR separately-jitted programs under the
same mesh/shardings as the production pipeline:

  embed   — token embedding (replicated, rank-0 role)
  layers  — the per-device window compute (k*W decode_layer calls, the
            work one stage performs across a full token)
  hop     — n_steps ppermute ring hops of the activation (the comm the
            pipeline inserts)
  head    — final norm + lm_head
  pipe    — the REAL fused pipeline program (make_pipe_forward), whose
            wall time the component programs should roughly compose to

CPU wall times validate the schedule SHAPE (hop cost ~ activation bytes,
layers dominate, embed/head marginal); the chip-level projection uses
measured single-chip decode + measured TCP hop + nominal ICI via
prima_tpu.profiler.scaling. Emits MULTICHIP_r05_breakdown.json.
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("PRIMA_PALLAS_INTERPRET", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def cpu_mesh_breakdown():
    from jax.sharding import PartitionSpec as P

    from prima_tpu.gguf.constants import GGMLType
    from prima_tpu.models.config import tiny_config
    from prima_tpu.models.llama import (ForwardOptions, decode_layer, embed,
                                        model_norm, synth_host_head,
                                        synth_host_layer)
    from prima_tpu.ops.layers import causal_mask, rope_freqs
    from prima_tpu.parallel.mesh import make_mesh
    from prima_tpu.parallel.pipeline import (PipeSpec, build_pipe_model,
                                             init_pipe_kv, make_pipe_forward)

    dp, pp, tp = 2, 2, 2
    mesh = make_mesh(dp=dp, pp=pp, tp=tp)
    cfg = tiny_config(n_layers=2 * pp)
    spec = PipeSpec.for_model(cfg, n_pp=pp, n_tp=tp, n_dp=dp, k_cycles=2)
    M, B, S, T = spec.microbatches, dp, 4, 16
    opts = ForwardOptions(matmul_impl="xla")

    params = build_pipe_model(
        lambda i: synth_host_layer(cfg, i, GGMLType.Q4_K),
        synth_host_head(cfg, GGMLType.Q4_K), cfg, spec, mesh)
    kv = init_pipe_kv(cfg, spec, mesh, B, T)
    fwd = jax.jit(make_pipe_forward(cfg, spec, mesh, opts))

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.n_vocab, size=(M, B, S)).astype(np.int32)
    positions = np.broadcast_to(np.arange(S, dtype=np.int32),
                                (M, B, S)).copy()
    cache_pos = np.zeros((M, B), np.int32)

    t_pipe = timeit(lambda: fwd(params, tokens, positions, cache_pos, kv))

    # embed program (replicated, rank-0 role)
    emb = jax.jit(lambda te, tk: embed(te, tk, opts.dtype))
    t_embed = timeit(lambda: emb(params["tok_embd"], tokens))

    # head program
    x_h = jnp.asarray(rng.standard_normal((M, B, S, cfg.n_embd)),
                      jnp.bfloat16)

    @jax.jit
    def head(p, h):
        from prima_tpu.models.llama import linear

        h = model_norm(h, p.get("output_norm"), p.get("output_norm_b"), cfg)
        w = p["output"] if p.get("output") is not None else p["tok_embd"]
        return linear(h, w, opts.matmul_impl)

    head_params = {k: params.get(k) for k in
                   ("output", "output_norm", "output_norm_b", "tok_embd")}
    t_head = timeit(lambda: head(head_params, x_h))

    # hop program: the pipeline's n_steps ppermutes on the activation shape
    perm = [(i, (i + 1) % pp) for i in range(pp)]

    def hop_body(x):
        def step(c, _):
            return jax.lax.ppermute(c, "pp", perm), None
        out, _ = jax.lax.scan(step, x, None, length=spec.n_steps)
        return out

    hop = jax.jit(jax.shard_map(
        hop_body, mesh=mesh, in_specs=P(None, "dp", None, None),
        out_specs=P(None, "dp", None, None), check_vma=False))
    x_a = jnp.asarray(rng.standard_normal((M, B, S, cfg.n_embd)),
                      jnp.bfloat16)
    t_hop = timeit(lambda: hop(x_a))

    # layers program: one stage's full-token compute (k*W layers) on the
    # local batch shard — plain decode_layer loop, no ring
    from prima_tpu.models.llama import init_kv_caches, synth_params

    cfg1 = tiny_config(n_layers=spec.k_cycles * spec.window)
    p1 = synth_params(cfg1, GGMLType.Q4_K)
    kv1 = init_kv_caches(cfg1, B, T)
    inv_freq, mscale = rope_freqs(cfg1)

    @jax.jit
    def layers_fn(p, x, pos, cp, kv):
        mask = causal_mask(pos, T)
        for i, layer in enumerate(p["layers"]):
            x, kv_i = decode_layer(layer, cfg1, x, pos, (kv[0][i], kv[1][i]),
                                   cp, mask, inv_freq, mscale, opts)
        return x

    x1 = jnp.asarray(rng.standard_normal((B, S, cfg1.n_embd)), jnp.bfloat16)
    pos1 = jnp.asarray(positions[0])
    t_layers = timeit(lambda: layers_fn(p1, x1, pos1,
                                        jnp.zeros((B,), jnp.int32), kv1))

    return {
        "mesh": {"dp": dp, "pp": pp, "tp": tp},
        "spec": {"microbatches": M, "k_cycles": spec.k_cycles,
                 "window": spec.window, "n_steps": spec.n_steps},
        "wall_ms": {
            "pipe_full": round(t_pipe * 1e3, 2),
            "embed": round(t_embed * 1e3, 2),
            "layers_per_stage_token": round(t_layers * 1e3, 2),
            "hop_all_steps": round(t_hop * 1e3, 2),
            "hop_per_step": round(t_hop / spec.n_steps * 1e3, 3),
            "head": round(t_head * 1e3, 2),
        },
        "note": "CPU-mesh wall times: validates schedule shape only; "
                "chip-level numbers come from the projection below",
    }


def main():
    out = {"breakdown_cpu_mesh": cpu_mesh_breakdown()}

    # measured TCP hop (the DCN/wire plane stand-in, loopback)
    from prima_tpu.profiler.device import _bench_tcp_hop
    from prima_tpu.profiler.scaling import (ICI_V5E_NOMINAL, HopProfile,
                                            project_all)

    try:
        tcp_gbs, tcp_lat = _bench_tcp_hop()
        dcn = HopProfile(gbs=tcp_gbs, lat_s=tcp_lat, name="tcp-loopback")
    except Exception as e:  # noqa: BLE001
        dcn = HopProfile(gbs=10.0, lat_s=100e-6, name="tcp-assumed")
        out["tcp_bench_error"] = str(e)[:200]
    out["hops"] = {"ici": ICI_V5E_NOMINAL.__dict__, "dcn": dcn.__dict__}

    # measured single-chip rates: prefer the live bench partial
    partial = {}
    try:
        with open(os.path.join(ROOT, "BENCH_partial.json")) as f:
            partial = json.load(f)
    except Exception:  # noqa: BLE001
        pass
    t1_8b = 1000.0 / partial.get("value", 84.0)
    out["t1_source"] = ("BENCH_partial.json" if partial.get("value")
                       else "round-3 captured 84 tok/s")

    # per-model projections vs the reference's cluster numbers
    shapes = {
        # (t1_ms, n_embd, n_layers, weight_gb, baseline_ms)
        "llama3_8b": (t1_8b, 4096, 32, 4.6, 15.0),
        "qwen25_32b": (None, 5120, 64, 18.5, 89.0),
        "llama3_70b": (None, 8192, 80, 39.8, 674.0),
    }
    hbm_gbs = 819.0
    out["projections"] = {}
    for name, (t1, e, L, wgb, base) in shapes.items():
        if t1 is None:
            # weight-stream-bound estimate at the same effective HBM
            # fraction the 8B row achieves
            eff = (4.6 / t1_8b) * 1e3 / hbm_gbs  # measured eff fraction
            t1 = wgb * 1e9 / (eff * hbm_gbs * 1e9) * 1e3
        out["projections"][name] = project_all(
            round(t1, 3), e, L, wgb, ici=ICI_V5E_NOMINAL, dcn=dcn,
            baseline_ms_tok=base)

    path = os.path.join(ROOT, "MULTICHIP_r05_breakdown.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": path,
                      "pipe_ms": out["breakdown_cpu_mesh"]["wall_ms"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
