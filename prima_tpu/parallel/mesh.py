"""Device mesh construction for the TPU-native runtime.

The reference's "ring of heterogeneous home devices" (SURVEY.md §2.5,
llama_init_sockets src/llama.cpp:20492) becomes a jax.sharding.Mesh with
named axes:

  dp — data parallel (batch / server slots)
  pp — pipeline parallel (layer windows, the piped-ring axis)
  sp — sequence parallel (KV cache sharded over the context axis;
       blockwise attention combined with a log-sum-exp psum — the
       long-context axis the reference lacks, SURVEY §5.7)
  tp — tensor parallel (attention heads / FFN columns within a window)

The ZMQ TCP ring is replaced by XLA collectives over ICI/DCN: the per-window
activation hop is a lax.ppermute over `pp`, the intra-window split is
psum/all_gather over `tp`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("dp", "pp", "sp", "tp")


def make_mesh(dp: int = 1, pp: int = 1, tp: int = 1, sp: int = 1,
              devices=None) -> Mesh:
    """Mesh with (dp, pp, sp, tp) axes over the first dp*pp*sp*tp devices.

    Axis order puts `tp` innermost so tensor-parallel collectives ride the
    fastest links (ICI neighbours), `dp` outermost (DCN-tolerant); `sp`
    sits next to tp because the blockwise-attention psum is per-token.
    """
    devices = devices if devices is not None else jax.devices()
    n = dp * pp * sp * tp
    if len(devices) < n:
        raise ValueError(f"need {n} devices (dp={dp} pp={pp} sp={sp} "
                         f"tp={tp}), have {len(devices)}")
    dev = np.array(devices[:n]).reshape(dp, pp, sp, tp)
    return Mesh(dev, AXES)


def auto_mesh(n_devices: int | None = None, want_pp: int | None = None) -> Mesh:
    """A reasonable default factorization of n devices into (dp, pp, tp)."""
    devices = jax.devices()
    n = n_devices or len(devices)
    pp = want_pp if want_pp is not None else (2 if n % 2 == 0 and n >= 2 else 1)
    rest = n // pp
    tp = _largest_pow2_divisor(rest)
    dp = rest // tp
    return make_mesh(dp=dp, pp=pp, tp=tp, devices=devices[:n])


def _largest_pow2_divisor(n: int) -> int:
    p = 1
    while n % (p * 2) == 0:
        p *= 2
    return p


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
