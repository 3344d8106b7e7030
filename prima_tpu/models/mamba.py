"""Mamba (selective state-space) models.

The LLM_ARCH_MAMBA analogue (reference llm_build_mamba src/llama.cpp:10236,
ggml_ssm_conv / ggml_ssm_scan kernels ggml.c:16236): token embedding ->
[RMSNorm -> in_proj -> causal depthwise conv1d -> SiLU -> x_proj ->
(softplus dt, B, C) -> selective scan -> +D*x -> *SiLU(z) -> out_proj]
residual blocks -> RMSNorm -> lm_head.

GGUF schema: `mamba.ssm.{conv_kernel,inner_size,state_size,time_step_rank}`
KVs and blk.N.ssm_{in,conv1d,x,dt,a,d,out} tensors, with ssm_a storing
-exp(A_log) (convert_hf_to_gguf.py MambaModel). Recurrent state replaces
the KV cache: per sequence a (d_inner, d_conv-1) conv window and a
(d_inner, d_state) ssm state.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFModel
from ..quant.dequant_np import dequantize_tensor
from ..ops.layers import rms_norm


@dataclass
class MambaConfig:
    arch: str
    n_layers: int
    n_embd: int
    d_inner: int
    d_conv: int
    d_state: int
    dt_rank: int
    n_vocab: int
    n_ctx_train: int
    rms_eps: float
    dt_b_c_rms: bool = False  # falcon-mamba: RMS-normalize dt/B/C

    @classmethod
    def from_gguf(cls, m: GGUFModel) -> "MambaConfig":
        g = m.arch_key
        tokens = m.get("tokenizer.ggml.tokens")
        return cls(
            arch=m.arch,
            n_layers=int(g("{arch}.block_count")),
            n_embd=int(g("{arch}.embedding_length")),
            d_inner=int(g("{arch}.ssm.inner_size")),
            d_conv=int(g("{arch}.ssm.conv_kernel")),
            d_state=int(g("{arch}.ssm.state_size")),
            dt_rank=int(g("{arch}.ssm.time_step_rank")),
            n_vocab=int(g("{arch}.vocab_size",
                          len(tokens) if tokens is not None else 0)),
            n_ctx_train=int(g("{arch}.context_length", 4096)),
            rms_eps=float(g("{arch}.attention.layer_norm_rms_epsilon", 1e-5)),
            dt_b_c_rms=bool(g("{arch}.ssm.dt_b_c_rms", False)),
        )


def load_mamba_params(m: GGUFModel, cfg: MambaConfig, dtype=jnp.float32) -> dict:
    def get(name):
        ti = m.tensors.get(name)
        if ti is None:
            raise KeyError(f"missing tensor {name}")
        return jnp.asarray(dequantize_tensor(ti), dtype=dtype)

    params: dict = {"tok_embd": get("token_embd.weight"), "layers": []}
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        params["layers"].append({
            "norm": get(p + "attn_norm.weight"),
            "ssm_in": get(p + "ssm_in.weight"),       # (2*d_inner, n_embd)
            "conv_w": get(p + "ssm_conv1d.weight"),   # (d_inner, d_conv)
            "conv_b": get(p + "ssm_conv1d.bias"),
            "ssm_x": get(p + "ssm_x.weight"),         # (dt_rank+2ds, d_inner)
            "dt_w": get(p + "ssm_dt.weight"),         # (d_inner, dt_rank)
            "dt_b": get(p + "ssm_dt.bias"),
            "A": get(p + "ssm_a"),                    # (d_inner, d_state) = -exp(A_log)
            "D": get(p + "ssm_d"),
            "out": get(p + "ssm_out.weight"),         # (n_embd, d_inner)
        })
    params["output_norm"] = get("output_norm.weight")
    params["output"] = (get("output.weight")
                        if "output.weight" in m.tensors else None)
    return params


def _softplus(x):
    # the reference's guarded softplus (ggml.c:16236)
    return jnp.where(x <= 20.0, jnp.log1p(jnp.exp(jnp.minimum(x, 20.0))), x)


def init_mamba_state(cfg: MambaConfig, batch: int):
    """Per-layer (conv_state (b, d_inner, d_conv-1), ssm_state
    (b, d_inner, d_state)) — the recurrent analogue of the KV cache."""
    return [
        (jnp.zeros((batch, cfg.d_inner, cfg.d_conv - 1), jnp.float32),
         jnp.zeros((batch, cfg.d_inner, cfg.d_state), jnp.float32))
        for _ in range(cfg.n_layers)
    ]


def _mamba_block(layer: dict, cfg: MambaConfig, h: jax.Array, state):
    """One mamba mixer over a full (b, s, e) chunk, carrying state."""
    b, s, _ = h.shape
    conv_state, ssm_state = state
    din, ds, dtr = cfg.d_inner, cfg.d_state, cfg.dt_rank

    xz = h @ layer["ssm_in"].T  # (b, s, 2*d_inner)
    x, z = xz[..., :din], xz[..., din:]

    # causal depthwise conv along s with carried left context
    xt = jnp.swapaxes(x, 1, 2)  # (b, d_inner, s)
    full = jnp.concatenate([conv_state, xt], axis=-1)
    new_conv = full[..., full.shape[-1] - (cfg.d_conv - 1):]
    k = layer["conv_w"]  # (d_inner, d_conv)
    x = sum(full[..., i : i + s] * k[:, i][None, :, None]
            for i in range(cfg.d_conv))
    x = x + layer["conv_b"][None, :, None]
    x = jax.nn.silu(x)  # (b, d_inner, s)
    x = jnp.swapaxes(x, 1, 2)  # (b, s, d_inner)

    dbc = x @ layer["ssm_x"].T  # (b, s, dt_rank + 2*d_state)
    dt, B, C = dbc[..., :dtr], dbc[..., dtr:dtr + ds], dbc[..., dtr + ds:]
    if cfg.dt_b_c_rms:  # falcon-mamba
        norm = lambda v: v * jax.lax.rsqrt(
            jnp.mean(v * v, axis=-1, keepdims=True) + cfg.rms_eps)
        dt, B, C = norm(dt), norm(B), norm(C)
    dt = _softplus(dt @ layer["dt_w"].T + layer["dt_b"])  # (b, s, d_inner)

    A = layer["A"]  # (d_inner, d_state), negative
    dA = jnp.exp(dt[..., None] * A)  # (b, s, d_inner, d_state)
    dBx = dt[..., None] * B[:, :, None, :] * x[..., None]

    def step(hs, inputs):
        da_t, dbx_t, c_t = inputs
        hs = hs * da_t + dbx_t  # (b, d_inner, d_state)
        y_t = jnp.einsum("bds,bs->bd", hs, c_t)
        return hs, y_t

    hs, ys = jax.lax.scan(
        step, ssm_state,
        (jnp.swapaxes(dA, 0, 1), jnp.swapaxes(dBx, 0, 1),
         jnp.swapaxes(C, 0, 1)))
    y = jnp.swapaxes(ys, 0, 1)  # (b, s, d_inner)
    y = y + x * layer["D"]
    y = y * jax.nn.silu(z)
    return y @ layer["out"].T, (new_conv, hs)


def mamba_forward(params: dict, cfg: MambaConfig, tokens: jax.Array,
                  states=None):
    """tokens (b, s) -> (logits (b, s, vocab), new per-layer states)."""
    if states is None:
        states = init_mamba_state(cfg, tokens.shape[0])
    h = params["tok_embd"][tokens]
    new_states = []
    for layer, st in zip(params["layers"], states):
        hin = rms_norm(h, layer["norm"], cfg.rms_eps)
        out, st2 = _mamba_block(layer, cfg, hin, st)
        h = h + out
        new_states.append(st2)
    h = rms_norm(h, params["output_norm"], cfg.rms_eps)
    w_out = params["output"] if params["output"] is not None else params["tok_embd"]
    return h @ w_out.T, new_states


class MambaRuntime:
    """Load + generate for mamba GGUFs (stateful decode, no KV cache)."""

    def __init__(self, cfg: MambaConfig, params: dict, tokenizer=None,
                 eog_ids=None):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.eog_ids = eog_ids or set()
        self._fwd = jax.jit(lambda p, t, s: mamba_forward(p, cfg, t, s))

    @classmethod
    def load(cls, path: str, dtype=jnp.float32) -> "MambaRuntime":
        m = GGUFModel.open(path)
        cfg = MambaConfig.from_gguf(m)
        params = load_mamba_params(m, cfg, dtype)
        from ..tokenizer import Tokenizer

        try:
            tok = Tokenizer.from_gguf(m)
        except Exception:
            tok = None
        eog = set()
        eos = m.get("tokenizer.ggml.eos_token_id")
        if eos is not None:
            eog.add(int(eos))
        m.close()
        return cls(cfg, params, tok, eog)

    def generate(self, prompt_tokens: list[int], n_predict: int = 32,
                 sampler=None) -> list[int]:
        toks = jnp.asarray(np.asarray(prompt_tokens, np.int32)[None])
        logits, states = self._fwd(self.params, toks,
                                   init_mamba_state(self.cfg, 1))
        out: list[int] = []
        cur = logits[0, -1]
        for _ in range(n_predict):
            if sampler is not None:
                tok = sampler.sample_and_accept(np.asarray(cur, np.float32))
            else:
                tok = int(jnp.argmax(cur))
            out.append(tok)
            if tok in self.eog_ids:
                break
            logits, states = self._fwd(
                self.params, jnp.asarray([[tok]], jnp.int32), states)
            cur = logits[0, -1]
        return out
