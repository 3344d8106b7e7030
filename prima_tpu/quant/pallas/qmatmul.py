"""Fused dequant + matmul Pallas kernels for the uniform quant layout.

The TPU replacement for the reference's fused quantized GEMV/GEMM kernels
(ggml_vec_dot_q4_K_q8_K ggml-quants.c:7713, CUDA mmvq/mmq). Weights stay
packed in HBM (nib4: ~4.5 bits/w with scales; int8: ~8.5) and are widened
tile-by-tile in VMEM; the decode GEMV is HBM-bandwidth-bound, so bytes/weight
is the whole ballgame for tokens/s.

Layout trick: weight columns are host-permuted to p = t*S + s (s = sub-block
index, S = K/sub, t = position within the sub-block). In permuted space the
scale for column p is scales[p mod S], so in-kernel scale expansion is a
single lane-aligned pltpu.repeat (tile semantics) — no gathers, no unaligned
slices. The activation picks up the same permutation with one cheap XLA
reshape-transpose per call; the matmul result is permutation-invariant.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dequant_jax import QTensor, qmatmul_xla


def _interpret() -> bool:
    return os.environ.get("PRIMA_PALLAS_INTERPRET", "0") == "1"


def _tile_repeat(sc: jax.Array, reps: int) -> jax.Array:
    """[c0..cS-1] -> [c0..cS-1, c0..cS-1, ...] along axis 1."""
    if reps == 1:
        return sc
    return pltpu.repeat(sc, reps, axis=1) if not _interpret() else jnp.tile(sc, (1, reps))


def permute_cols_np(a: np.ndarray, sub: int) -> np.ndarray:
    """(..., K) natural order -> kernel order p = t*S + s (host, load time)."""
    k = a.shape[-1]
    s = k // sub
    return np.ascontiguousarray(
        a.reshape(a.shape[:-1] + (s, sub)).swapaxes(-1, -2).reshape(a.shape)
    )


def permute_x(x: jax.Array, sub: int) -> jax.Array:
    """Apply the same column permutation to the activation (XLA, per call)."""
    k = x.shape[-1]
    s = k // sub
    return x.reshape(x.shape[:-1] + (s, sub)).swapaxes(-1, -2).reshape(x.shape)


def unpermute_w(w: jax.Array, sub: int) -> jax.Array:
    """Inverse permutation for materialized weights (XLA fallback paths)."""
    k = w.shape[-1]
    s = k // sub
    return w.reshape(w.shape[:-1] + (sub, s)).swapaxes(-1, -2).reshape(w.shape)


def _qmm_kernel(
    x_ref,  # (B, K_T) f32 — permuted activation tile
    qs_ref,  # (N_T, K_T) uint8 nib4 bytes | int8
    sc_ref,  # (N_T, S) f32 — full scale row, tile-repeated in kernel
    mn_ref,  # like sc_ref, or absent
    o_ref,  # (B, N_T) f32
    *,
    layout: str,
    q_offset: int,
    t_chunk: int,
    half_k_tiles: int,
    has_mins: bool,
    fast: bool,
):
    kt = pl.program_id(1)

    cdtype = jnp.bfloat16 if fast else jnp.float32
    if layout == "nib4":
        b = qs_ref[:].astype(jnp.int32)
        lo = (b & 0x0F) + q_offset
        hi = (b >> 4) + q_offset
        q = jnp.where(kt < half_k_tiles, lo, hi).astype(cdtype)
    else:
        q = qs_ref[:].astype(cdtype)

    scales = _tile_repeat(sc_ref[:], t_chunk).astype(cdtype)
    w = scales * q  # (N_T, K_T) dequantized tile
    x = x_ref[:].astype(cdtype)
    acc = jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if has_mins:
        mins = _tile_repeat(mn_ref[:], t_chunk).astype(cdtype)
        acc = acc - jax.lax.dot_general(
            x, mins, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(kt == 0)
    def _():
        o_ref[:] = acc

    @pl.when(kt != 0)
    def _():
        o_ref[:] = o_ref[:] + acc


def _pick_tiles(n: int, k: int, sub: int, layout: str) -> tuple[int, int, int]:
    """Returns (n_tile, k_tile, t_chunk); k_tile = t_chunk * S."""
    s = k // sub
    half_t = (k // 2 if layout == "nib4" else k) // s  # t positions per half
    t_chunk = 1
    for cand in (16, 8, 4, 2, 1):
        if half_t % cand == 0 and cand * s <= 4096:
            t_chunk = cand
            break
    k_tile = t_chunk * s
    n_tile = min(n, 256)
    while n % n_tile:
        n_tile //= 2
    return max(n_tile, 8), k_tile, t_chunk


def pallas_eligible(shape: tuple[int, int], sub: int, layout: str) -> bool:
    n, k = shape
    if k % 256 or n % 8:
        return False
    s = k // sub
    if s % 8:
        return False  # scale row must be loadable as (n_tile, S) tile
    half = k // 2 if layout == "nib4" else k
    if half % s:
        return False
    return True


@functools.lru_cache(maxsize=None)
def _build_qmm(b: int, n: int, k: int, layout: str, q_offset: int, sub: int, has_mins: bool, fast: bool):
    n_tile, k_tile, t_chunk = _pick_tiles(n, k, sub, layout)
    s = k // sub
    n_k_tiles = k // k_tile
    if layout == "nib4":
        half_k_tiles = n_k_tiles // 2
        qs_index = lambda nt, kt: (nt, kt % half_k_tiles)
    else:
        half_k_tiles = n_k_tiles
        qs_index = lambda nt, kt: (nt, kt)

    grid = (n // n_tile, n_k_tiles)
    kernel = functools.partial(
        _qmm_kernel,
        layout=layout,
        q_offset=q_offset,
        t_chunk=t_chunk,
        half_k_tiles=half_k_tiles,
        has_mins=has_mins,
        fast=fast,
    )

    sc_spec = pl.BlockSpec((n_tile, s), lambda nt, kt: (nt, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((b, k_tile), lambda nt, kt: (0, kt), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_tile, k_tile), qs_index, memory_space=pltpu.VMEM),
        sc_spec,
    ]
    if has_mins:
        in_specs.append(sc_spec)

    flops = 2 * b * n * k
    bytes_accessed = n * (k if layout == "int8" else k // 2) + n * s * 4 * (2 if has_mins else 1)

    def _fn(x, qs, scales, mins):
        args = (x, qs, scales) + ((mins,) if has_mins else ())
        return pl.pallas_call(
            kernel if has_mins else functools.partial(_qmm_kernel_nomins, kernel),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((b, n_tile), lambda nt, kt: (0, nt), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=flops, bytes_accessed=int(bytes_accessed), transcendentals=0
            ),
            interpret=_interpret(),
        )(*args)

    return _fn


def _qmm_kernel_nomins(kernel, x_ref, qs_ref, sc_ref, o_ref):
    kernel(x_ref, qs_ref, sc_ref, None, o_ref)


def qmatmul_pallas(x: jax.Array, qt: QTensor, out_dtype=None, fast: bool | None = None) -> jax.Array:
    """x: (..., K) @ dequant(qt)(N, K)^T -> (..., N). Requires a kernel-packed
    QTensor (kperm=True, see QTensor.from_host); falls back to XLA otherwise."""
    n, k = qt.shape
    if not getattr(qt, "kperm", False):
        return qmatmul_xla(x, qt, out_dtype)

    lead = x.shape[:-1]
    b = int(np.prod(lead)) if lead else 1
    x2 = permute_x(x.reshape(b, k).astype(jnp.float32), qt.sub)
    b_pad = max(8, -(-b // 8) * 8)
    if b_pad != b:
        x2 = jnp.pad(x2, ((0, b_pad - b), (0, 0)))

    if fast is None:
        fast = os.environ.get("PRIMA_QMM_FAST", "0") == "1"
    fn = _build_qmm(b_pad, n, k, qt.layout, qt.q_offset, qt.sub, qt.mins is not None, fast)
    out = fn(x2, qt.qs, qt.scales, qt.mins)
    out = out[:b].reshape(lead + (n,))
    return out.astype(out_dtype or x.dtype)


def register():
    from ...models.llama import register_matmul_impl

    register_matmul_impl("pallas", qmatmul_pallas)


register()
