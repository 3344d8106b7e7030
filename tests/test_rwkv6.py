"""RWKV-v6 vs an independent numpy oracle.

The oracle mirrors the reference graph directly: build_rwkv6
(src/llama.cpp:16617), llm_build_rwkv6_time_mix (@10371),
llm_build_rwkv6_channel_mix (@10514), and the sequential WKV kernel
ggml_compute_forward_rwkv_wkv_f32 (ggml/src/ggml.c:16595-16662).
Also checks that stateful incremental decode equals the full-sequence
forward — the property that replaces KV-cache equivalence here.
"""

import numpy as np
import pytest

from prima_tpu.gguf.reader import GGUFModel
from prima_tpu.gguf.writer import GGUFWriter

pytestmark = pytest.mark.slow  # arch-zoo/e2e tier (ci/run.sh runs it)

ARCH = "rwkv6"
V, E, HS, FF, L = 96, 32, 8, 48, 2  # 4 wkv heads
TMX, TDX = 8, 12
EPS = 1e-5


@pytest.fixture(scope="module")
def rwkv_gguf(tmp_path_factory):
    d = tmp_path_factory.mktemp("rwkv6")
    path = str(d / "rwkv6.gguf")
    rng = np.random.default_rng(17)
    w = GGUFWriter(path, arch=ARCH)
    for k, val in {
        f"{ARCH}.block_count": L,
        f"{ARCH}.embedding_length": E,
        f"{ARCH}.wkv.head_size": HS,
        f"{ARCH}.feed_forward_length": FF,
        f"{ARCH}.context_length": 1 << 16,
        f"{ARCH}.attention.layer_norm_epsilon": EPS,
        f"{ARCH}.rescale_every_n_layers": 2,
        f"{ARCH}.time_mix_extra_dim": TMX,
        f"{ARCH}.time_decay_extra_dim": TDX,
        f"{ARCH}.vocab_size": V,
        f"{ARCH}.attention.head_count": 0,
    }.items():
        w.add_kv(k, val)
    w.add_kv("tokenizer.ggml.tokens", [f"<t{i}>" for i in range(V)])

    dense = {}

    def add(name, shape, scale=0.2, around=None):
        if around is not None:
            x = (around + rng.standard_normal(shape) * 0.05).astype(np.float32)
        else:
            x = (rng.standard_normal(shape) * scale).astype(np.float32)
        w.add_tensor(name, x)
        dense[name] = x

    add("token_embd.weight", (V, E))
    add("token_embd_norm.weight", (E,), around=1.0)
    add("token_embd_norm.bias", (E,), around=0.0)
    add("output_norm.weight", (E,), around=1.0)
    add("output_norm.bias", (E,), around=0.0)
    add("output.weight", (V, E))
    for i in range(L):
        p = f"blk.{i}."
        add(p + "attn_norm.weight", (E,), around=1.0)
        add(p + "attn_norm.bias", (E,), around=0.0)
        add(p + "attn_norm_2.weight", (E,), around=1.0)
        add(p + "attn_norm_2.bias", (E,), around=0.0)
        add(p + "time_mix_w1.weight", (5 * TMX, E))
        add(p + "time_mix_w2.weight", (5, E, TMX))
        for nm in ("lerp_x", "lerp_w", "lerp_k", "lerp_v", "lerp_r",
                   "lerp_g"):
            add(p + f"time_mix_{nm}.weight", (1, 1, E), around=0.5)
        add(p + "time_mix_first.weight", (E // HS, HS))
        add(p + "time_mix_decay.weight", (E,), around=0.5)
        add(p + "time_mix_decay_w1.weight", (TDX, E))
        add(p + "time_mix_decay_w2.weight", (E, TDX))
        for nm in ("key", "value", "receptance", "gate", "output"):
            add(p + f"time_mix_{nm}.weight", (E, E))
        add(p + "time_mix_ln.weight", (E,), around=1.0)
        add(p + "time_mix_ln.bias", (E,), around=0.0)
        add(p + "channel_mix_lerp_k.weight", (1, 1, E), around=0.5)
        add(p + "channel_mix_lerp_r.weight", (1, 1, E), around=0.5)
        add(p + "channel_mix_key.weight", (FF, E))
        add(p + "channel_mix_value.weight", (E, FF))
        add(p + "channel_mix_receptance.weight", (E, E))
    w.write()
    return path, dense


def _ln(x, w, b, eps=EPS):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _np_forward(dense, tokens):
    """Sequential token-by-token oracle (the C kernel's loop structure)."""
    (s,) = tokens.shape
    H = E // HS
    x_seq = _ln(dense["token_embd.weight"][tokens],
                dense["token_embd_norm.weight"],
                dense["token_embd_norm.bias"])
    att_shift = [np.zeros(E, np.float32) for _ in range(L)]
    ffn_shift = [np.zeros(E, np.float32) for _ in range(L)]
    wkv = [np.zeros((H, HS, HS), np.float32) for _ in range(L)]
    logits = []
    for t in range(s):
        x = x_seq[t].astype(np.float64)
        for i in range(L):
            p = f"blk.{i}."
            xa = _ln(x, dense[p + "attn_norm.weight"],
                     dense[p + "attn_norm.bias"])
            sx = att_shift[i] - xa
            lx = dense[p + "time_mix_lerp_x.weight"].reshape(E)
            xxx = xa + sx * lx
            z = np.tanh(xxx @ dense[p + "time_mix_w1.weight"].T)
            z = z.reshape(5, TMX)
            m = np.einsum("gx,gex->ge", z, dense[p + "time_mix_w2.weight"])
            xs = {}
            for gi, nm in enumerate(("w", "k", "v", "r", "g")):
                lerp = dense[p + f"time_mix_lerp_{nm}.weight"].reshape(E)
                xs[nm] = xa + sx * (m[gi] + lerp)
            r = (xs["r"] @ dense[p + "time_mix_receptance.weight"].T
                 ).reshape(H, HS)
            k = (xs["k"] @ dense[p + "time_mix_key.weight"].T).reshape(H, HS)
            v = (xs["v"] @ dense[p + "time_mix_value.weight"].T).reshape(H, HS)
            gt = xs["g"] @ dense[p + "time_mix_gate.weight"].T
            g = gt / (1.0 + np.exp(-gt))
            wr = (np.tanh(xs["w"] @ dense[p + "time_mix_decay_w1.weight"].T)
                  @ dense[p + "time_mix_decay_w2.weight"].T
                  + dense[p + "time_mix_decay.weight"])
            wd = np.exp(-np.exp(wr)).reshape(H, HS)
            u = dense[p + "time_mix_first.weight"]  # (H, HS)
            out = np.zeros((H, HS))
            for h in range(H):
                kv = np.outer(k[h], v[h])  # (i, j)
                out[h] = r[h] @ (u[h][:, None] * kv + wkv[i][h])
                wkv[i][h] = wkv[i][h] * wd[h][:, None] + kv
            o = _ln(out, np.float32(1.0), np.float32(0.0), 64e-5).reshape(E)
            o = o * dense[p + "time_mix_ln.weight"] \
                + dense[p + "time_mix_ln.bias"]
            o = o * g
            x = x + o @ dense[p + "time_mix_output.weight"].T
            att_shift[i] = xa

            xf = _ln(x, dense[p + "attn_norm_2.weight"],
                     dense[p + "attn_norm_2.bias"])
            sx = ffn_shift[i] - xf
            xk = xf + sx * dense[p + "channel_mix_lerp_k.weight"].reshape(E)
            xr = xf + sx * dense[p + "channel_mix_lerp_r.weight"].reshape(E)
            rr = 1.0 / (1.0 + np.exp(-(xr @ dense[p + "channel_mix_receptance.weight"].T)))
            kk = np.maximum(xk @ dense[p + "channel_mix_key.weight"].T, 0) ** 2
            x = x + rr * (kk @ dense[p + "channel_mix_value.weight"].T)
            ffn_shift[i] = xf
            if (i + 1) % 2 == 0:  # rescale_every_n_layers = 2
                x = x * 0.5
        xo = _ln(x, dense["output_norm.weight"], dense["output_norm.bias"])
        logits.append(xo @ dense["output.weight"].T)
    return np.stack(logits)


def test_rwkv6_matches_numpy(rwkv_gguf):
    from prima_tpu.models.rwkv6 import (Rwkv6Config, load_rwkv6_params,
                                        rwkv6_forward)

    path, dense = rwkv_gguf
    m = GGUFModel.open(path)
    cfg = Rwkv6Config.from_gguf(m)
    assert cfg.head_size == HS and cfg.n_heads == E // HS
    assert cfg.rescale_every == 2
    params = load_rwkv6_params(m, cfg)
    m.close()

    rng = np.random.default_rng(23)
    tokens = rng.integers(0, V, size=(7,)).astype(np.int32)
    want = _np_forward(dense, tokens)
    got, _ = rwkv6_forward(params, cfg, tokens[None])
    np.testing.assert_allclose(np.asarray(got[0]), want, rtol=2e-3, atol=2e-3)


def test_rwkv6_stateful_decode_matches_full(rwkv_gguf):
    """Incremental decode with carried state == one full-sequence pass
    (the recurrent analogue of KV-cache/prefill equivalence)."""
    import jax.numpy as jnp

    from prima_tpu.models.rwkv6 import (Rwkv6Config, init_rwkv6_state,
                                        load_rwkv6_params, rwkv6_forward)

    path, _ = rwkv_gguf
    m = GGUFModel.open(path)
    cfg = Rwkv6Config.from_gguf(m)
    params = load_rwkv6_params(m, cfg)
    m.close()

    rng = np.random.default_rng(29)
    toks = rng.integers(0, V, size=(1, 6)).astype(np.int32)
    full, _ = rwkv6_forward(params, cfg, jnp.asarray(toks))

    state = init_rwkv6_state(cfg, 1)
    per_tok = []
    for t in range(toks.shape[1]):
        lg, state = rwkv6_forward(params, cfg,
                                  jnp.asarray(toks[:, t:t + 1]), state)
        per_tok.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(np.stack(per_tok), np.asarray(full[0]),
                               rtol=2e-4, atol=2e-4)


def test_rwkv6_generate(rwkv_gguf):
    from prima_tpu.models.rwkv6 import Rwkv6Runtime

    path, _ = rwkv_gguf
    rt = Rwkv6Runtime.load(path)
    out = rt.generate([3, 11, 25], n_predict=5)
    assert len(out) == 5 and all(0 <= t < V for t in out)
