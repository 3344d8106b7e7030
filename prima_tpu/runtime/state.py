"""State save/load: session files and per-slot KV serialization.

The analogue of llama_state_get_data / llama_state_seq_* (reference
include/llama.h:860-950) and the server's slot save/restore endpoints
(slotsave.feature): a slot's KV rows (trimmed to its used length), its
token history, and versioned model-shape metadata go into one .npz.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

STATE_MAGIC = "prima-tpu-state"
STATE_VERSION = 1


def _meta(engine, n_tokens: int) -> dict:
    cfg = engine.cfg
    return {
        "magic": STATE_MAGIC,
        "version": STATE_VERSION,
        "arch": cfg.arch,
        "n_layers": cfg.n_layers,
        "n_kv_heads": cfg.n_kv_heads,
        "head_dim": cfg.head_dim,
        "n_tokens": n_tokens,
    }


def slot_save(engine, slot_id: int, path: str) -> int:
    """Save one slot's sequence state; returns tokens saved."""
    used = engine.kv.used(slot_id)
    slot = engine.slots[slot_id]
    tokens = list(slot.prompt + slot.generated)
    for n_keep, n_discard in getattr(slot, "shifts", []):
        # replay context shifts: the cache dropped these middle spans
        tokens = tokens[:n_keep] + tokens[n_keep + n_discard:]
    tokens = tokens[: used + 1]
    from ..parallel.pipe_kv import PipeKV
    from .kv import StackedKVCache, _materialize_row, _materialize_srow

    arrays = {}
    if isinstance(engine.kv, PipeKV):
        # distributed cache: materialize in layer order (pipe_kv mapping)
        ks, vs = engine.kv.materialize_slot(slot_id, used)
        for li in range(engine.cfg.n_layers):
            arrays[f"k{li}"] = ks[li]
            arrays[f"v{li}"] = vs[li]
    elif isinstance(engine.kv, StackedKVCache):
        k_all, v_all = engine.kv.caches
        ks = np.asarray(_materialize_srow(k_all, slot_id)[:, :used], np.float32)
        vs = np.asarray(_materialize_srow(v_all, slot_id)[:, :used], np.float32)
        for li in range(engine.cfg.n_layers):
            arrays[f"k{li}"] = ks[li]
            arrays[f"v{li}"] = vs[li]
    else:
        for li, kv in enumerate(engine.kv.caches):
            if kv is None:
                continue
            k, v = kv
            arrays[f"k{li}"] = np.asarray(_materialize_row(k, slot_id)[:used], dtype=np.float32)
            arrays[f"v{li}"] = np.asarray(_materialize_row(v, slot_id)[:used], dtype=np.float32)
    with open(path, "wb") as f:  # exact path (np.savez would append .npz)
        np.savez_compressed(
            f,
            meta=json.dumps(_meta(engine, used)),
            tokens=np.asarray(tokens, dtype=np.int32),
            **arrays,
        )
    return used


def slot_restore(engine, slot_id: int, path: str) -> int:
    """Restore a saved sequence into a slot; returns tokens restored."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        if meta.get("magic") != STATE_MAGIC:
            raise ValueError(f"{path}: not a prima-tpu state file")
        for key in ("arch", "n_layers", "n_kv_heads", "head_dim"):
            want = getattr(engine.cfg, key if key != "arch" else "arch")
            if meta.get(key) != want:
                raise ValueError(f"{path}: state {key}={meta.get(key)} != model {want}")
        used = int(meta["n_tokens"])
        if used > engine.max_seq:
            raise ValueError(f"{path}: state length {used} > max_seq {engine.max_seq}")
        from ..parallel.pipe_kv import PipeKV
        from .kv import (StackedKVCache, _materialize_row, _materialize_srow,
                         _set_row, _set_srow)

        tokens = [int(t) for t in z["tokens"]]
        if isinstance(engine.kv, PipeKV):
            ks = np.stack([np.asarray(z[f"k{li}"])
                           for li in range(engine.cfg.n_layers)])
            vs = np.stack([np.asarray(z[f"v{li}"])
                           for li in range(engine.cfg.n_layers)])
            engine.kv.restore_slot(slot_id, ks, vs, used)
            slot = engine.slots[slot_id]
            slot.prompt = tokens
            slot.generated = []
            slot.n_prompt_done = min(used, max(len(tokens) - 1, 0))
            return used
        if isinstance(engine.kv, StackedKVCache):
            k_all, v_all = engine.kv.caches
            k_rows = _materialize_srow(k_all, slot_id).astype(jnp.float32)
            v_rows = _materialize_srow(v_all, slot_id).astype(jnp.float32)
            ks = jnp.stack([jnp.asarray(z[f"k{li}"])
                            for li in range(engine.cfg.n_layers)])
            vs = jnp.stack([jnp.asarray(z[f"v{li}"])
                            for li in range(engine.cfg.n_layers)])
            k_rows = k_rows.at[:, :used].set(ks)
            v_rows = v_rows.at[:, :used].set(vs)
            engine.kv.caches = (_set_srow(k_all, slot_id, k_rows),
                                _set_srow(v_all, slot_id, v_rows))
            engine.kv.cache_pos[slot_id] = used
            slot = engine.slots[slot_id]
            slot.prompt = tokens
            slot.generated = []
            slot.n_prompt_done = min(used, max(len(tokens) - 1, 0))
            return used
        for li in range(engine.cfg.n_layers):
            k, v = engine.kv.caches[li]
            k_row = _materialize_row(k, slot_id).astype(jnp.float32)
            v_row = _materialize_row(v, slot_id).astype(jnp.float32)
            k_row = k_row.at[:used].set(jnp.asarray(z[f"k{li}"]))
            v_row = v_row.at[:used].set(jnp.asarray(z[f"v{li}"]))
            engine.kv.caches[li] = (_set_row(k, slot_id, k_row),
                                    _set_row(v, slot_id, v_row))
    engine.kv.cache_pos[slot_id] = used
    slot = engine.slots[slot_id]
    slot.prompt = tokens
    slot.generated = []
    slot.n_prompt_done = min(used, max(len(tokens) - 1, 0))
    return used


def session_save(engine, slot_id: int, path: str) -> int:
    """CLI session file (--prompt-cache, main.cpp:268-288)."""
    return slot_save(engine, slot_id, path)


def session_load(engine, slot_id: int, path: str) -> list[int]:
    """Returns the cached token list (the CLI matches it against the new
    prompt and reuses the longest common prefix)."""
    slot_restore(engine, slot_id, path)
    return list(engine.slots[slot_id].prompt)
