"""Tensor parallelism: Megatron-style sharding of one transformer layer.

The TPU-idiomatic replacement for the reference's intra-device CPU/GPU
offload split (src/llama.cpp:7597-7605): instead of placing some layers on a
GPU, every layer is split *within* the chip group —

  row-parallel   (output features sharded): wq, wk, wv, w_gate, w_up,
                 q/k/v biases → attention heads and FFN columns are local
  column-parallel (input features sharded): wo, w_down → partial outputs,
                 combined with one psum over the `tp` axis per block

All splits happen on the host at load time (parallel/sharding.py) so the
fused Pallas dequant-matmul kernels run unmodified per shard.
"""

from __future__ import annotations

from dataclasses import replace

import numpy as np

from ..models.config import ModelConfig
from ..quant.device_format import UQTensor
from .sharding import shard_uq_cols, shard_uq_rows

# layer-weight name -> how it shards over tp
ROW_PARALLEL = ("wq", "wk", "wv", "w_gate", "w_up")
COL_PARALLEL = ("wo", "w_down")
# biases follow their projection: row-sharded with the output dim; the
# output-side biases (bo, b_down) stay replicated and are added AFTER the
# tp psum in attention_block / ffn_block
ROW_PARALLEL_DENSE = ("bq", "bk", "bv", "b_up")
REPLICATED_DENSE = ("attn_norm", "ffn_norm")


def tp_local_config(cfg: ModelConfig, tp: int) -> ModelConfig:
    """Per-shard view of the model: heads divided over tp ranks."""
    if tp == 1:
        return cfg
    if cfg.n_heads % tp or cfg.n_kv_heads % tp:
        raise ValueError(
            f"n_heads={cfg.n_heads}/n_kv_heads={cfg.n_kv_heads} not divisible by tp={tp}"
        )
    return replace(cfg, n_heads=cfg.n_heads // tp, n_kv_heads=cfg.n_kv_heads // tp)


def shard_layer_uq(layer: dict, tp: int) -> list[dict]:
    """Split one layer's host tensors into `tp` shard dicts."""
    shards: list[dict] = [{} for _ in range(tp)]
    for name, t in layer.items():
        if t is None:
            continue
        if isinstance(t, UQTensor):
            if name in ROW_PARALLEL:
                parts = shard_uq_rows(t, tp)
            elif name in COL_PARALLEL:
                parts = shard_uq_cols(t, tp)
            else:
                raise KeyError(f"unknown quantized layer tensor {name!r}")
            for i in range(tp):
                shards[i][name] = parts[i]
        else:
            a = np.asarray(t)
            if name in ROW_PARALLEL_DENSE or name in ROW_PARALLEL:
                parts = np.split(a, tp, axis=0)
                for i in range(tp):
                    shards[i][name] = parts[i]
            elif name in COL_PARALLEL:
                parts = np.split(a, tp, axis=1)
                for i in range(tp):
                    shards[i][name] = parts[i]
            else:  # norms: replicated
                for i in range(tp):
                    shards[i][name] = a
    return shards
