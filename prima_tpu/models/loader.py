"""One-call model loading: GGUF -> (config, params, tokenizer).

The single-host analogue of llama_init_from_gpt_params (common/common.cpp:
1663) without the distributed bootstrap: parse GGUF, build the params
pytree (rank/layer filtering optional), construct the tokenizer.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax.numpy as jnp

from ..gguf.reader import GGUFModel
from ..tokenizer import Tokenizer
from .config import ModelConfig
from .llama import load_params


@dataclass
class LoadedModel:
    cfg: ModelConfig
    params: dict
    tokenizer: Tokenizer
    gguf: GGUFModel

    @property
    def eog_ids(self) -> set[int]:
        v = self.tokenizer.vocab
        return {t for t in (v.eos_id, v.eot_id, v.eom_id) if t >= 0}


def load_model(
    path: str,
    dtype=jnp.bfloat16,
    layer_filter: Callable[[int], bool] | None = None,
    with_embedding: bool = True,
    with_output: bool = True,
    fuse: bool = False,
) -> LoadedModel:
    m = GGUFModel.open(path)
    cfg = ModelConfig.from_gguf(m)
    params = load_params(m, cfg, dtype=dtype, layer_filter=layer_filter,
                         with_embedding=with_embedding, with_output=with_output,
                         fuse=fuse)
    tok = Tokenizer.from_gguf(m)
    return LoadedModel(cfg, params, tok, m)
