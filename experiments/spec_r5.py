"""Speculative decoding on REAL trained weights (VERDICT r4 task 3).

The reference's +80% claim (/root/reference/README.md:117-118) rests on a
draft that actually agrees with its target. Round 4 only measured a
forced-acceptance cost sweep on synthetic weights (natural acceptance 0);
this experiment closes the gap with a real pair:

  * target/draft = byte-level llama models TRAINED on the same local
    corpus (tools/train_tiny_pair.py; no HF checkpoints exist in this
    zero-egress image — full-filesystem search), loaded through the
    PRODUCT path (gguf loader -> Engine -> FusedSpeculative).
  * prompts are HELD-OUT text (the corpus tail the trainer never sampled).
  * measures: natural acceptance, end-to-end fused-speculative tok/s vs
    plain fused decode on the same backend, and losslessness
    (token-identical output).
  * composes the result with the round-4 on-chip forced-acceptance cost
    curve (experiments/spec_r4.json): at the measured natural acceptance,
    linear interpolation of the curve gives the projected 8B-scale
    speedup — stated explicitly as a composition, per VERDICT guidance.

Run with JAX_PLATFORMS=cpu for the acceptance/losslessness measurement or
on the tunneled TPU for on-chip end-to-end numbers (PRIMA_SPEC_R5_TPU=1).
Emits experiments/spec_r5.json.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

if os.environ.get("PRIMA_SPEC_R5_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("PRIMA_PALLAS_INTERPRET", "1")

import numpy as np  # noqa: E402


def plain_decode(eng, prompt, n_predict, chunk=16):
    from prima_tpu.runtime.engine import SlotState
    from prima_tpu.sampling import Sampler, SamplerParams

    s = eng.submit(prompt, sampler=Sampler(SamplerParams(temp=0.0)),
                   n_predict=n_predict)
    eng.prefill_only(s)
    eng.step_fused(max_chunk=chunk)  # compile + first chunk
    t0 = time.perf_counter()
    while s.state != SlotState.IDLE:
        eng.step_fused(max_chunk=chunk)
    dt = time.perf_counter() - t0
    out = list(s.generated)
    n_timed = len(out) - min(chunk, len(out))
    eng.kv.seq_rm(s.id)
    s.prompt = []
    return out, (n_timed / dt if dt > 0 and n_timed > 0 else None)


def spec_decode(spec, prompt, n_predict):
    from prima_tpu.runtime.speculative import SpecStats
    from prima_tpu.sampling import Sampler, SamplerParams

    stats = SpecStats()
    toks = []
    gen = spec.generate_stream(prompt, Sampler(SamplerParams(temp=0.0)),
                               n_predict=n_predict, stats=stats)
    first = next(gen)  # includes compile
    toks.extend(first)
    t0 = time.perf_counter()
    n_at_t0 = len(toks)
    for chunk in gen:
        toks.extend(chunk)
    dt = time.perf_counter() - t0
    n_timed = len(toks) - n_at_t0
    return toks, (n_timed / dt if dt > 0 and n_timed > 0 else None), stats


def main():
    import jax

    from prima_tpu.models.loader import load_model
    from prima_tpu.runtime.engine import Engine
    from prima_tpu.runtime.speculative_fused import FusedSpeculative
    from prima_tpu.tools.train_tiny_pair import encode_bytes, gather_corpus

    pair_dir = os.environ.get("PRIMA_PAIR_DIR",
                              os.path.join(ROOT, "models_tiny_pair"))
    out = {"backend": jax.default_backend(),
           "pair_dir": pair_dir,
           "method": "real trained pair (see module docstring)"}
    tr = os.path.join(pair_dir, "train_report.json")
    if os.path.exists(tr):
        out["training"] = json.load(open(tr))

    target = load_model(os.path.join(pair_dir, "target.gguf"))
    draft = load_model(os.path.join(pair_dir, "draft.gguf"))
    max_seq = 512
    t_eng = Engine(target.cfg, target.params, n_slots=1, max_seq=max_seq,
                   n_batch=32)
    d_eng = Engine(draft.cfg, draft.params, n_slots=1, max_seq=max_seq,
                   n_batch=32)

    # held-out prompts: the corpus TAIL (train() holds out the last slice)
    data = encode_bytes(gather_corpus(4 << 20))
    hold = data[-16384:]
    rng = np.random.default_rng(17)
    n_prompts = int(os.environ.get("PRIMA_SPEC_R5_PROMPTS", "6"))
    n_predict = int(os.environ.get("PRIMA_SPEC_R5_PREDICT", "96"))
    prompts = []
    for _ in range(n_prompts):
        off = int(rng.integers(0, len(hold) - 80))
        prompts.append([int(x) for x in hold[off: off + 64]])

    n_draft = int(os.environ.get("PRIMA_SPEC_R5_NDRAFT", "6"))
    spec = FusedSpeculative(t_eng, d_eng, n_draft=n_draft, p_min=0.5,
                            rounds=6)

    total_acc = total_drafted = 0
    plain_rates, spec_rates = [], []
    lossless = True
    per_prompt = []
    for i, prompt in enumerate(prompts):
        want, plain_r = plain_decode(t_eng, prompt, n_predict)
        got, spec_r, stats = spec_decode(spec, prompt, n_predict)
        ok = got == want[: len(got)] and len(got) >= min(n_predict - 8,
                                                         len(want))
        lossless &= ok
        acc = stats.n_accepted / max(stats.n_drafted, 1)
        total_acc += stats.n_accepted
        total_drafted += stats.n_drafted
        if plain_r:
            plain_rates.append(plain_r)
        if spec_r:
            spec_rates.append(spec_r)
        per_prompt.append({"acceptance": round(acc, 3),
                           "plain_tok_s": round(plain_r, 1) if plain_r
                           else None,
                           "spec_tok_s": round(spec_r, 1) if spec_r
                           else None,
                           "lossless": ok})
        print(f"prompt {i}: acc={acc:.3f} plain={plain_r} spec={spec_r} "
              f"lossless={ok}", flush=True)

    nat = total_acc / max(total_drafted, 1)
    out.update({
        "n_draft": n_draft, "p_min": 0.5, "n_prompts": n_prompts,
        "n_predict": n_predict,
        "natural_acceptance": round(nat, 3),
        "lossless": lossless,
        "per_prompt": per_prompt,
        "plain_tok_s_median": round(float(np.median(plain_rates)), 1)
        if plain_rates else None,
        "spec_tok_s_median": round(float(np.median(spec_rates)), 1)
        if spec_rates else None,
    })
    if plain_rates and spec_rates:
        out["spec_speedup_measured"] = round(
            float(np.median(spec_rates)) / float(np.median(plain_rates)), 3)

    if os.environ.get("PRIMA_SPEC_R5_SWEEP") == "1":
        # acceptance/speedup vs draft depth (k): deeper drafts amortize
        # more verify cost but accept less of the tail
        sweep = {}
        for k in (2, 4, 8):
            sp_k = FusedSpeculative(t_eng, d_eng, n_draft=k, p_min=0.5,
                                    rounds=6)
            accs, rates = [], []
            for prompt in prompts[:3]:
                got, r, st = spec_decode(sp_k, prompt, n_predict)
                accs.append(st.n_accepted / max(st.n_drafted, 1))
                if r:
                    rates.append(r)
            sweep[f"k{k}"] = {
                "acceptance": round(float(np.mean(accs)), 3),
                "spec_tok_s_median": round(float(np.median(rates)), 1)
                if rates else None,
            }
        out["ndraft_sweep"] = sweep
        # p_min gates draft depth on model confidence (reference default
        # 0.75, speculative.py:78): on high-entropy text it cuts rounds to
        # 2-3 tokens; p_min=0 always drafts k deep at lower acceptance
        psweep = {}
        for pm in (0.0, 0.3, 0.75):
            sp_p = FusedSpeculative(t_eng, d_eng, n_draft=n_draft,
                                    p_min=pm, rounds=6)
            accs, rates = [], []
            for prompt in prompts[:4]:
                got, r, st = spec_decode(sp_p, prompt, n_predict)
                accs.append(st.n_accepted / max(st.n_drafted, 1))
                if r:
                    rates.append(r)
            psweep[f"p{pm}"] = {
                "acceptance": round(float(np.mean(accs)), 3),
                "spec_tok_s_median": round(float(np.median(rates)), 1)
                if rates else None,
            }
        out["pmin_sweep"] = psweep

    # composition with the round-4 ON-CHIP forced-acceptance cost curve:
    # speedup(acceptance) is ~linear in accepted-per-round; interpolate at
    # the measured natural acceptance. Explicitly a composition, not an
    # 8B-scale end-to-end measurement.
    try:
        r4 = json.load(open(os.path.join(ROOT, "experiments",
                                         "spec_r4.json")))
        pts = sorted((v["acceptance"], v["speedup_vs_plain"])
                     for v in r4["curve"].values())
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        proj = float(np.interp(nat, xs, ys))
        out["composed_8b_projection"] = {
            "curve_points": pts,
            "at_natural_acceptance": round(nat, 3),
            "projected_speedup_vs_plain": round(proj, 3),
            "note": "r4 on-chip forced-acceptance cost curve (synthetic "
                    "8B weights) evaluated at the REAL pair's measured "
                    "natural acceptance",
        }
    except Exception as e:  # noqa: BLE001
        out["composed_8b_projection"] = {"error": str(e)[:200]}

    path = os.path.join(ROOT, "experiments", "spec_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": path,
                      "natural_acceptance": out["natural_acceptance"],
                      "spec_speedup_measured":
                      out.get("spec_speedup_measured"),
                      "lossless": lossless}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
