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


def parse_kv_override(spec: str) -> tuple[str, object]:
    """--override-kv KEY=TYPE:VALUE (string_parse_kv_override,
    common/arg.cpp:1652: types int, float, bool, str)."""
    key, _, rest = spec.partition("=")
    typ, _, val = rest.partition(":")
    if not key or not typ or _ != ":":
        raise ValueError(f"invalid KV override {spec!r} "
                         "(expected KEY=TYPE:VALUE)")
    if typ == "int":
        return key, int(val)
    if typ == "float":
        return key, float(val)
    if typ == "bool":
        if val not in ("true", "false"):
            raise ValueError(f"invalid bool {val!r} in {spec!r}")
        return key, val == "true"
    if typ == "str":
        return key, val
    raise ValueError(f"invalid type {typ!r} in {spec!r} "
                     "(int/float/bool/str)")


def load_model(
    path: str,
    dtype=jnp.bfloat16,
    layer_filter: Callable[[int], bool] | None = None,
    with_embedding: bool = True,
    with_output: bool = True,
    fuse: bool = False,
    kv_overrides: dict | None = None,
) -> LoadedModel:
    m = GGUFModel.open(path)
    if kv_overrides:  # --override-kv: patch metadata before config parse
        m.metadata.update(kv_overrides)
    cfg = ModelConfig.from_gguf(m)
    params = load_params(m, cfg, dtype=dtype, layer_filter=layer_filter,
                         with_embedding=with_embedding, with_output=with_output,
                         fuse=fuse)
    tok = Tokenizer.from_gguf(m)
    return LoadedModel(cfg, params, tok, m)
