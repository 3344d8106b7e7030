"""Train a REAL tiny draft/target llama pair on local text, for measuring
natural speculative-decoding acceptance (VERDICT r4 task 3).

The reference's +80% speculative claim (/root/reference/README.md:117-118)
is measured on real model pairs whose draft actually agrees with the
target. This zero-egress image has no HF checkpoints (full-filesystem
search), so we make our own real weights: two byte-level llama-arch models
(a target and a ~6x smaller draft) trained on the same local corpus
(Python stdlib sources — several MB of genuine text). Trained weights are
quantized with the product quantizer and written as GGUFs, so the
measurement pipeline (loader -> Engine -> FusedSpeculative) is exactly the
production path.

The training forward is assembled from the SAME ops the inference stack
uses (ops/layers rms_norm/apply_rope/gqa_attention/swiglu, rope_freqs from
the same ModelConfig), so trained weights decode identically through
models/llama.forward — checked by tests/test_train_tiny_pair.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

N_SPECIALS = 3  # <unk>, <s>, </s> — prima_tpu.tools.make_tiny_gguf._byte_vocab
N_VOCAB = N_SPECIALS + 256


def gather_corpus(max_bytes: int = 4 << 20, root: str | None = None) -> bytes:
    """Concatenate local Python sources (stdlib by default) — real English
    prose (docstrings/comments) + code, no network needed."""
    import sysconfig

    root = root or sysconfig.get_paths()["stdlib"]
    chunks, total = [], 0
    for dirpath, dirnames, filenames in sorted(os.walk(root)):
        if "site-packages" in dirpath or "__pycache__" in dirpath:
            continue
        dirnames.sort()
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            try:
                with open(os.path.join(dirpath, fn), "rb") as f:
                    b = f.read()
            except OSError:
                continue
            chunks.append(b)
            total += len(b)
            if total >= max_bytes:
                return b"\n".join(chunks)[:max_bytes]
    return b"\n".join(chunks)[:max_bytes]


def encode_bytes(data: bytes) -> np.ndarray:
    """Byte-level SPM ids: token id = 3 + byte (make_tiny_gguf byte vocab)."""
    return np.frombuffer(data, np.uint8).astype(np.int32) + N_SPECIALS


def make_cfg(n_layers, n_embd, n_heads, n_ff, n_ctx=512):
    from ..models.config import tiny_config

    return tiny_config(
        n_layers=n_layers, n_embd=n_embd, n_heads=n_heads,
        n_kv_heads=n_heads, head_dim=n_embd // n_heads, n_ff=n_ff,
        n_vocab=N_VOCAB, n_ctx_train=n_ctx, rope_base=10000.0,
        rope_dim=n_embd // n_heads)


def init_params(cfg, seed: int):
    """f32 training params, same tensor names/shapes the GGUF will carry."""
    import jax

    rng = np.random.default_rng(seed)
    e, hd, f = cfg.n_embd, cfg.head_dim, cfg.n_ff

    def w(rows, k):
        return (rng.standard_normal((rows, k)) * (k ** -0.5)).astype(
            np.float32)

    p = {
        "tok_embd": (rng.standard_normal((cfg.n_vocab, e)) * 0.02).astype(
            np.float32),
        "output": (rng.standard_normal((cfg.n_vocab, e)) * 0.02).astype(
            np.float32),
        "output_norm": np.ones(e, np.float32),
        "layers": [],
    }
    for _ in range(cfg.n_layers):
        p["layers"].append({
            "attn_norm": np.ones(e, np.float32),
            "wq": w(cfg.n_heads * hd, e),
            "wk": w(cfg.n_kv_heads * hd, e),
            "wv": w(cfg.n_kv_heads * hd, e),
            "wo": w(e, cfg.n_heads * hd),
            "ffn_norm": np.ones(e, np.float32),
            "w_gate": w(f, e),
            "w_up": w(f, e),
            "w_down": w(e, f),
        })
    return jax.tree.map(lambda a: a, p)


def train_forward(params, cfg, tokens, inv_freq):
    """Teacher-forcing forward over (B, T) token ids -> (B, T, V) logits.
    Pure-jnp and differentiable; numerically the same math as
    models/llama.forward (same ops/layers primitives + rope_freqs)."""
    import jax.numpy as jnp

    from ..ops.layers import (apply_rope, causal_mask, gqa_attention,
                              rms_norm, swiglu)

    B, T = tokens.shape
    h, kvh, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    mask = causal_mask(pos, T)
    x = params["tok_embd"][tokens]
    scale = hd ** -0.5
    for layer in params["layers"]:
        xa = rms_norm(x, layer["attn_norm"], cfg.rms_eps)
        q = (xa @ layer["wq"].T).reshape(B, T, h, hd)
        k = (xa @ layer["wk"].T).reshape(B, T, kvh, hd)
        v = (xa @ layer["wv"].T).reshape(B, T, kvh, hd)
        q = apply_rope(q, pos, inv_freq, cfg.rope_type)
        k = apply_rope(k, pos, inv_freq, cfg.rope_type)
        att = gqa_attention(q, k, v, mask, scale)
        x = x + att.reshape(B, T, h * hd) @ layer["wo"].T
        xf = rms_norm(x, layer["ffn_norm"], cfg.rms_eps)
        x = x + swiglu(xf @ layer["w_gate"].T, xf @ layer["w_up"].T) \
            @ layer["w_down"].T
    x = rms_norm(x, params["output_norm"], cfg.rms_eps)
    return x @ params["output"].T


def train(cfg, data: np.ndarray, seed: int = 0, steps: int = 1500,
          batch: int = 8, seq: int = 128, lr: float = 3e-3,
          chunk: int = 25, log=print):
    """AdamW + cosine schedule; `chunk` steps run inside one jit dispatch
    (lax.fori_loop) so a tunneled TPU pays one round-trip per chunk."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..ops.layers import rope_freqs

    inv_freq, _ms = rope_freqs(cfg)
    params = init_params(cfg, seed)
    n_hold = max(4 * batch * seq, 16384)
    train_ids = jnp.asarray(data[:-n_hold])
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=max(steps // 20, 10), decay_steps=steps,
        end_value=lr * 0.05)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(sched, weight_decay=0.01))
    opt_state = opt.init(params)

    def loss_fn(p, toks):
        logits = train_forward(p, cfg, toks[:, :-1], inv_freq)
        tgt = toks[:, 1:]
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)
        return nll.mean()

    n = train_ids.shape[0] - seq - 1

    def one_step(carry, key):
        p, s = carry
        off = jax.random.randint(key, (batch,), 0, n)
        toks = jax.vmap(lambda o: jax.lax.dynamic_slice(
            train_ids, (o,), (seq + 1,)))(off)
        loss, grads = jax.value_and_grad(loss_fn)(p, toks)
        updates, s = opt.update(grads, s, p)
        return (jax.tree.map(lambda a, u: a + u, p, updates), s), loss

    @jax.jit
    def run_chunk(p, s, key):
        keys = jax.random.split(key, chunk)
        (p, s), losses = jax.lax.scan(lambda c, k: one_step(c, k),
                                      (p, s), keys)
        return p, s, losses.mean(), losses[-1]

    key = jax.random.PRNGKey(seed + 1)
    t0 = time.time()
    hist = []
    for i in range(0, steps, chunk):
        key, sub = jax.random.split(key)
        params, opt_state, mean_l, last_l = run_chunk(params, opt_state, sub)
        mean_l = float(mean_l)
        hist.append(round(mean_l, 4))
        log(f"step {min(i + chunk, steps):5d}/{steps}  loss {mean_l:.4f}  "
            f"({time.time() - t0:.0f}s)")
    hold = jnp.asarray(data[-n_hold:])
    B_ev = max(n_hold // (seq + 1) // 4, 1)
    ev = hold[: B_ev * (seq + 1)].reshape(B_ev, seq + 1)
    ev_loss = float(jax.jit(loss_fn)(params, ev))
    return params, {"final_train_loss": hist[-1] if hist else None,
                    "holdout_loss": round(ev_loss, 4),
                    "loss_history": hist[::4],
                    "train_s": round(time.time() - t0, 1)}


def save_gguf(path: str, cfg, params, name: str, ftype_name: str = "Q8_0"):
    """Write trained weights through the product GGUF writer (byte vocab),
    quantized with the product quantizer."""
    import jax

    from ..gguf.constants import GGMLType
    from ..gguf.writer import GGUFWriter
    from ..quant.quantize_np import quantize
    from .make_tiny_gguf import _byte_vocab

    ftype = GGMLType[ftype_name]
    params = jax.tree.map(np.asarray, params)
    w = GGUFWriter(path, arch="llama")
    w.add_kv("general.name", name)
    w.add_kv("llama.block_count", cfg.n_layers)
    w.add_kv("llama.embedding_length", cfg.n_embd)
    w.add_kv("llama.attention.head_count", cfg.n_heads)
    w.add_kv("llama.attention.head_count_kv", cfg.n_kv_heads)
    w.add_kv("llama.feed_forward_length", cfg.n_ff)
    w.add_kv("llama.context_length", cfg.n_ctx_train)
    w.add_kv("llama.attention.layer_norm_rms_epsilon", cfg.rms_eps)
    w.add_kv("llama.rope.freq_base", cfg.rope_base)
    w.add_kv("llama.rope.dimension_count", cfg.rope_dim)
    for key, val in _byte_vocab().items():
        w.add_kv(key, val)
    w.add_kv("llama.vocab_size", cfg.n_vocab)

    def q(tname, x):
        x = np.ascontiguousarray(x, np.float32)
        if ftype == GGMLType.F32:
            w.add_tensor(tname, x)
            return
        w.add_tensor(tname, quantize(x, ftype), ne=(x.shape[1], x.shape[0]),
                     ggml_type=ftype)

    def dense(tname, x):
        w.add_tensor(tname, np.ascontiguousarray(x, np.float32))

    q("token_embd.weight", params["tok_embd"])
    for i, layer in enumerate(params["layers"]):
        p = f"blk.{i}."
        dense(p + "attn_norm.weight", layer["attn_norm"])
        q(p + "attn_q.weight", layer["wq"])
        q(p + "attn_k.weight", layer["wk"])
        q(p + "attn_v.weight", layer["wv"])
        q(p + "attn_output.weight", layer["wo"])
        dense(p + "ffn_norm.weight", layer["ffn_norm"])
        q(p + "ffn_gate.weight", layer["w_gate"])
        q(p + "ffn_up.weight", layer["w_up"])
        q(p + "ffn_down.weight", layer["w_down"])
    dense("output_norm.weight", params["output_norm"])
    q("output.weight", params["output"])
    w.write()
    return path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out-dir", default="models_tiny_pair")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--draft-steps", type=int, default=0,
                    help="0 = same as --steps")
    ap.add_argument("--corpus-mb", type=float, default=4.0)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--ftype", default="Q8_0")
    ap.add_argument("--target-shape", default="4,256,4,704",
                    help="layers,embd,heads,ff")
    ap.add_argument("--draft-shape", default="2,128,2,352")
    args = ap.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    data = encode_bytes(gather_corpus(int(args.corpus_mb * (1 << 20))))
    print(f"corpus: {data.shape[0]/1e6:.2f}M tokens", flush=True)
    report = {"corpus_tokens": int(data.shape[0]),
              "backend": None, "models": {}}
    import jax

    report["backend"] = jax.default_backend()
    for role, shape_s, steps in (
            ("target", args.target_shape, args.steps),
            ("draft", args.draft_shape, args.draft_steps or args.steps)):
        L, E, H, F = map(int, shape_s.split(","))
        cfg = make_cfg(L, E, H, F)
        n_par = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(
            init_params(cfg, 0)))
        print(f"training {role}: {L}L/{E}e/{H}h/{F}f = {n_par/1e6:.2f}M "
              f"params, {steps} steps", flush=True)
        params, stats = train(cfg, data, seed=0, steps=steps,
                              batch=args.batch, seq=args.seq)
        path = os.path.join(args.out_dir, f"{role}.gguf")
        save_gguf(path, cfg, params, f"tiny-pair-{role}", args.ftype)
        stats.update({"params_m": round(n_par / 1e6, 3),
                      "shape": [L, E, H, F],
                      "gguf": path,
                      "file_mb": round(os.path.getsize(path) / 1e6, 2)})
        report["models"][role] = stats
        print(json.dumps({role: stats}), flush=True)
    with open(os.path.join(args.out_dir, "train_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
