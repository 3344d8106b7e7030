"""MiniCPM3: MLA attention + minicpm scalings + LongRoPE factors.

Reference: build_minicpm3 (src/llama.cpp:14016) — MLA like deepseek2 but
NEOX rope (rope-type table @21548), kq_scale = 1/sqrt(n_embd_head_k)
(@14023), scale_embd=12 / scale_depth=1.4 / n_embd_base=256 defaults
(@14020-14022), and per-dim LongRoPE frequency factors chosen long/short
by context length (build_rope_factors @10816, loader @7746).

No mainline transformers class exists (trust_remote_code), so the oracle
is an independent numpy implementation in this file.
"""

import numpy as np
import pytest

from prima_tpu.gguf.reader import GGUFModel
from prima_tpu.gguf.writer import GGUFWriter

pytestmark = pytest.mark.slow  # arch-zoo/e2e tier (ci/run.sh runs it)

ARCH = "minicpm3"
V, E, H, QK_NOPE, QK_ROPE, VDIM = 96, 48, 3, 8, 4, 8
QLORA, KVLORA, FF, L = 24, 16, 64, 2
EPS = 1e-6


@pytest.fixture(scope="module")
def m3_gguf(tmp_path_factory):
    d = tmp_path_factory.mktemp("m3")
    path = str(d / "m3.gguf")
    rng = np.random.default_rng(5)
    w = GGUFWriter(path, arch=ARCH)
    kv = {
        f"{ARCH}.block_count": L,
        f"{ARCH}.embedding_length": E,
        f"{ARCH}.attention.head_count": H,
        f"{ARCH}.attention.head_count_kv": H,
        f"{ARCH}.attention.key_length": QK_NOPE + QK_ROPE,
        f"{ARCH}.attention.value_length": VDIM,
        f"{ARCH}.attention.q_lora_rank": QLORA,
        f"{ARCH}.attention.kv_lora_rank": KVLORA,
        f"{ARCH}.feed_forward_length": FF,
        f"{ARCH}.context_length": 128,
        f"{ARCH}.attention.layer_norm_rms_epsilon": EPS,
        f"{ARCH}.rope.freq_base": 10000.0,
        f"{ARCH}.rope.dimension_count": QK_ROPE,
        f"{ARCH}.rope.scaling.original_context_length": 32,
        f"{ARCH}.vocab_size": V,
    }
    for k, val in kv.items():
        w.add_kv(k, val)
    w.add_kv("tokenizer.ggml.tokens", [f"<t{i}>" for i in range(V)])

    dense = {}

    def add(name, rows, cols=None, scale=0.08, around=None):
        if cols is None:
            x = (around + rng.standard_normal(rows) * 0.05).astype(np.float32)
        else:
            x = (rng.standard_normal((rows, cols)) * scale).astype(np.float32)
        w.add_tensor(name, x)
        dense[name] = x

    add("token_embd.weight", V, E)
    qk = QK_NOPE + QK_ROPE
    for i in range(L):
        p = f"blk.{i}."
        add(p + "attn_norm.weight", E, around=1.0)
        add(p + "attn_q_a.weight", QLORA, E)
        add(p + "attn_q_a_norm.weight", QLORA, around=1.0)
        add(p + "attn_q_b.weight", H * qk, QLORA)
        add(p + "attn_kv_a_mqa.weight", KVLORA + QK_ROPE, E)
        add(p + "attn_kv_a_norm.weight", KVLORA, around=1.0)
        add(p + "attn_kv_b.weight", H * (QK_NOPE + VDIM), KVLORA)
        add(p + "attn_output.weight", E, H * VDIM)
        add(p + "ffn_norm.weight", E, around=1.0)
        add(p + "ffn_gate.weight", FF, E)
        add(p + "ffn_up.weight", FF, E)
        add(p + "ffn_down.weight", E, FF)
    add("output_norm.weight", E, around=1.0)
    add("rope_factors_long.weight", QK_ROPE // 2, around=2.0)
    add("rope_factors_short.weight", QK_ROPE // 2, around=1.0)
    w.write()
    return path, dense


def _np_rope_neox(x, pos, inv):
    half = x.shape[-1] // 2
    theta = pos[..., None] * inv  # (b,s,half)
    cos, sin = np.cos(theta)[:, :, None, :], np.sin(theta)[:, :, None, :]
    x0, x1 = x[..., :half], x[..., half:]
    return np.concatenate([x0 * cos - x1 * sin, x0 * sin + x1 * cos], -1)


def _np_rms(x, w, eps=EPS):
    v = np.mean(x.astype(np.float64) ** 2, -1, keepdims=True)
    return (x / np.sqrt(v + eps) * w).astype(np.float32)


def _np_forward(dense, tokens):
    b, s = tokens.shape
    qk = QK_NOPE + QK_ROPE
    x = dense["token_embd.weight"][tokens] * np.float32(12.0)
    pos = np.broadcast_to(np.arange(s, dtype=np.float64), (b, s))
    inv = 1.0 / (10000.0 ** (np.arange(QK_ROPE // 2) * 2.0 / QK_ROPE))
    inv = inv / dense["rope_factors_short.weight"]  # s <= orig ctx 32
    rscale = np.float32(1.4 / np.sqrt(L))
    mask = np.triu(np.full((s, s), -np.inf, np.float32), 1)
    for i in range(L):
        p = f"blk.{i}."
        xin = _np_rms(x, dense[p + "attn_norm.weight"])
        q = _np_rms(xin @ dense[p + "attn_q_a.weight"].T,
                    dense[p + "attn_q_a_norm.weight"])
        q = (q @ dense[p + "attn_q_b.weight"].T).reshape(b, s, H, qk)
        q_nope, q_pe = q[..., :QK_NOPE], q[..., QK_NOPE:]
        kv_c = xin @ dense[p + "attn_kv_a_mqa.weight"].T
        k_pe = kv_c[..., KVLORA:][:, :, None, :]
        kv_c = _np_rms(kv_c[..., :KVLORA], dense[p + "attn_kv_a_norm.weight"])
        kv = (kv_c @ dense[p + "attn_kv_b.weight"].T).reshape(
            b, s, H, QK_NOPE + VDIM)
        k_nope, v = kv[..., :QK_NOPE], kv[..., QK_NOPE:]
        q_pe = _np_rope_neox(q_pe, pos, inv)
        k_pe = _np_rope_neox(k_pe, pos, inv)
        qs = np.concatenate([q_nope, q_pe], -1)
        ks = np.concatenate(
            [k_nope, np.broadcast_to(k_pe, k_nope.shape[:-1] + (QK_ROPE,))], -1)
        scores = np.einsum("bshd,bthd->bhst", qs, ks) / np.sqrt(qk) + mask
        scores = scores - scores.max(-1, keepdims=True)
        pr = np.exp(scores)
        pr /= pr.sum(-1, keepdims=True)
        attn = np.einsum("bhst,bthd->bshd", pr, v).reshape(b, s, H * VDIM)
        x = x + rscale * (attn @ dense[p + "attn_output.weight"].T)
        fin = _np_rms(x, dense[p + "ffn_norm.weight"])
        g = fin @ dense[p + "ffn_gate.weight"].T
        u = fin @ dense[p + "ffn_up.weight"].T
        act = (g / (1.0 + np.exp(-g.astype(np.float64)))).astype(np.float32) * u
        x = x + rscale * (act @ dense[p + "ffn_down.weight"].T)
    x = _np_rms(x, dense["output_norm.weight"]) * np.float32(256.0 / E)
    return x @ dense["token_embd.weight"].T


def test_minicpm3_parity(m3_gguf):
    from prima_tpu.models.deepseek2 import (DeepseekV2Config,
                                            deepseek2_forward,
                                            load_deepseek2_params)

    path, dense = m3_gguf
    m = GGUFModel.open(path)
    cfg = DeepseekV2Config.from_gguf(m)
    assert cfg.arch == ARCH
    assert cfg.q_lora_rank == QLORA and cfg.kv_lora_rank == KVLORA
    assert abs(cfg.embd_scale - 12.0) < 1e-6
    assert abs(cfg.residual_scale - 1.4 / np.sqrt(L)) < 1e-6
    assert abs(cfg.logit_scale - 256.0 / E) < 1e-6
    params = load_deepseek2_params(m, cfg)
    assert params["rope_short"] is not None
    m.close()

    rng = np.random.default_rng(9)
    tokens = rng.integers(0, V, size=(2, 6)).astype(np.int32)
    want = _np_forward(dense, tokens)
    got = deepseek2_forward(params, cfg, tokens)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_minicpm3_generate_and_cli(m3_gguf):
    import io
    import sys as _sys

    from prima_tpu.models.deepseek2 import DeepseekV2Runtime
    from prima_tpu.tools.cli import main as cli_main

    path, _ = m3_gguf
    rt = DeepseekV2Runtime.load(path)
    out = rt.generate([3, 11, 25], n_predict=4)
    assert len(out) == 4 and all(0 <= t < V for t in out)

    old = _sys.stdout
    _sys.stdout = cap = io.StringIO()
    try:
        rc = cli_main(["-m", path, "-p", "hi", "-n", "3",
                       "--no-display-prompt"])
    finally:
        _sys.stdout = old
    assert rc == 0 and len(cap.getvalue().strip()) > 0
