"""Pallas flash attention over the KV cache (GQA, causal).

The TPU analogue of the reference's fused attention kernels (CUDA fattn*.cu
/ Metal flash attention): online-softmax over KV blocks so the (S, T) score
matrix never materializes — prefill memory drops from O(S*T) to O(S*kv_blk)
and long-context decode reads KV exactly once.

Layout: queries are processed per (batch, kv-head) pair with the GQA group
folded into rows (rows = group * S); the causal mask is computed in-kernel
from absolute query positions vs the kv block's global indices, matching
ops/layers.causal_mask (slot j visible iff j <= pos_q).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _interpret() -> bool:
    return os.environ.get("PRIMA_PALLAS_INTERPRET", "0") == "1"


def _attn_kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                 *, scale: float, kv_blk: int, n_kv_blocks: int, group: int, s_q: int):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32)  # (rows, D) rows = group * s_q
    k = k_ref[0].astype(jnp.float32)  # (kv_blk, D)
    v = v_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    # causal mask: kv index vs this row's query position (queries are
    # contiguous: qpos = pos0 + row % s_q)
    kv_idx = j * kv_blk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    pos0 = pos_ref[pl.program_id(0), 0]
    qpos = pos0 + row % s_q
    s = jnp.where(kv_idx <= qpos, s, NEG_INF)

    m_prev = m_scr[:]  # (rows, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(j == n_kv_blocks - 1)
    def _():
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build_attn(b: int, s_q: int, t: int, n_kv: int, group: int, d: int,
                scale: float, dtype_name: str):
    rows = group * s_q
    kv_blk = min(t, 512)
    while t % kv_blk:
        kv_blk //= 2
    n_kv_blocks = t // kv_blk
    grid = (b * n_kv, 1, n_kv_blocks)

    kernel = functools.partial(_attn_kernel, scale=scale, kv_blk=kv_blk,
                               n_kv_blocks=n_kv_blocks, group=group, s_q=s_q)
    dtype = jnp.dtype(dtype_name)

    def fn(q, k, v, pos):
        # q: (B*KVH, rows, D), k/v: (B*KVH, T, D), pos: (B*KVH, s_q)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # pos0 (B*KVH, 1), unblocked
                pl.BlockSpec((1, rows, d), lambda bh, qb, j: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kv_blk, d), lambda bh, qb, j: (bh, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kv_blk, d), lambda bh, qb, j: (bh, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rows, d), lambda bh, qb, j: (bh, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b * n_kv, rows, d), dtype),
            scratch_shapes=[
                pltpu.VMEM((rows, 1), jnp.float32),
                pltpu.VMEM((rows, 1), jnp.float32),
                pltpu.VMEM((rows, d), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=_interpret(),
        )(pos, q, k, v)

    return fn


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    positions: jax.Array, scale: float) -> jax.Array:
    """Drop-in for ops.layers.gqa_attention with causal masking from
    absolute positions.

    q: (B, S, H, D); k, v: (B, T, KVH, D); positions: (B, S). Returns
    (B, S, H, D).
    """
    b, s_q, h, d = q.shape
    t, n_kv = k.shape[1], k.shape[2]
    group = h // n_kv
    if s_q <= 8:
        return flash_decode(q, k, v, positions, scale)
    # (B, S, KVH, G, D) -> (B*KVH, G*S, D)
    qg = (q.reshape(b, s_q, n_kv, group, d)
          .transpose(0, 2, 3, 1, 4)
          .reshape(b * n_kv, group * s_q, d))
    kk = k.transpose(0, 2, 1, 3).reshape(b * n_kv, t, d)
    vv = v.transpose(0, 2, 1, 3).reshape(b * n_kv, t, d)
    pos0 = jnp.broadcast_to(positions[:, None, :1], (b, n_kv, 1)).reshape(b * n_kv, 1)
    fn = _build_attn(b, s_q, t, n_kv, group, d, float(scale), str(q.dtype))
    out = fn(qg, kk, vv, pos0.astype(jnp.int32))
    return (out.reshape(b, n_kv, group, s_q, d)
            .transpose(0, 3, 1, 2, 4)
            .reshape(b, s_q, h, d))


# ---------------------------------------------------------------------------
# Decode-specialized flash attention: bounded KV reads, no cache transpose
# ---------------------------------------------------------------------------


def _decode_kernel(nblk_ref, pos_ref, q_ref, k_ref, v_ref, o_ref,
                   m_scr, l_scr, acc_scr, *,
                   scale: float, kv_blk: int, n_kv_blocks: int,
                   n_kv: int, group: int, s_q: int, d: int):
    bq = pl.program_id(0)
    j = pl.program_id(1)
    gs = group * s_q

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(j < nblk_ref[bq])
    def _():
        pos0 = pos_ref[bq, 0]
        # one (kv_blk, KVH*D) tile holds ALL kv heads: per head, lane-slice
        # the aligned D-column group (cheap on the VPU; the HBM fetch was a
        # single contiguous DMA, unlike a transposed (B*KVH, T, D) layout)
        q = q_ref[0].astype(jnp.float32)        # (KVH*gs, D)
        kv_idx = j * kv_blk + jax.lax.broadcasted_iota(
            jnp.int32, (gs, kv_blk), 1)
        qpos = pos0 + jax.lax.broadcasted_iota(
            jnp.int32, (gs, kv_blk), 0) % s_q
        visible = kv_idx <= qpos
        for hh in range(n_kv):
            kh = k_ref[0, :, hh * d:(hh + 1) * d].astype(jnp.float32)
            vh = v_ref[0, :, hh * d:(hh + 1) * d].astype(jnp.float32)
            qh = q[hh * gs:(hh + 1) * gs]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(visible, s, NEG_INF)
            m_prev = m_scr[hh * gs:(hh + 1) * gs]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_scr[hh * gs:(hh + 1) * gs] = (
                l_scr[hh * gs:(hh + 1) * gs] * alpha
                + jnp.sum(p, axis=1, keepdims=True))
            acc_scr[hh * gs:(hh + 1) * gs] = (
                acc_scr[hh * gs:(hh + 1) * gs] * alpha
                + jax.lax.dot_general(
                    p, vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            m_scr[hh * gs:(hh + 1) * gs] = m_new

    @pl.when(j == n_kv_blocks - 1)
    def _():
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build_decode_attn(b: int, s_q: int, t: int, n_kv: int, group: int,
                       d: int, scale: float, kv_dtype: str, q_dtype: str):
    gs = group * s_q
    kv_blk = min(t, 256)
    while t % kv_blk:
        kv_blk //= 2
    n_kv_blocks = t // kv_blk
    grid = (b, n_kv_blocks)

    kernel = functools.partial(
        _decode_kernel, scale=scale, kv_blk=kv_blk, n_kv_blocks=n_kv_blocks,
        n_kv=n_kv, group=group, s_q=s_q, d=d)

    kv_bytes = jnp.dtype(kv_dtype).itemsize

    def fn(nblk, pos, q, k2, v2):
        # q: (B, KVH*gs, D); k2/v2: (B, T, KVH*D) — free reshapes of the
        # (B, T, KVH, D) cache; nblk: (B,) valid kv blocks; pos: (B, 1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # pos (B, 1)
                pl.BlockSpec((1, n_kv * gs, d), lambda bq, j, nb: (bq, 0, 0),
                             memory_space=pltpu.VMEM),
                # clamp the block index at the last VALID block: revisits
                # skip the DMA, so only ceil((pos+1)/kv_blk) blocks stream
                pl.BlockSpec((1, kv_blk, n_kv * d),
                             lambda bq, j, nb: (bq, jnp.minimum(j, nb[bq] - 1), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kv_blk, n_kv * d),
                             lambda bq, j, nb: (bq, jnp.minimum(j, nb[bq] - 1), 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, n_kv * gs, d),
                                   lambda bq, j, nb: (bq, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((n_kv * gs, 1), jnp.float32),
                pltpu.VMEM((n_kv * gs, 1), jnp.float32),
                pltpu.VMEM((n_kv * gs, d), jnp.float32),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, n_kv * gs, d), jnp.dtype(q_dtype)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * n_kv * gs * t * d,
                bytes_accessed=2 * b * t * n_kv * d * kv_bytes,
                transcendentals=b * n_kv * gs * t,
            ),
            interpret=_interpret(),
        )(nblk, pos, q, k2, v2)

    return fn


def flash_decode(q: jax.Array, k: jax.Array, v: jax.Array,
                 positions: jax.Array, scale: float) -> jax.Array:
    """Decode-phase flash attention: reads ONLY the valid KV prefix.

    The fused analogue of the reference's fattn decode path (CUDA
    fattn-vec*.cu), TPU-shaped: the cache keeps its natural (B, T, KVH, D)
    layout (one contiguous DMA per (t-range) block — no per-layer HBM
    transpose), all KV heads of a batch row ride one grid step, and a
    scalar-prefetch block count clamps the BlockSpec index map so blocks
    past the last valid position are never fetched from HBM (revisit of the
    clamped index elides the DMA). Numerically identical to gqa_attention.

    q: (B, S, H, D) with small S; k/v: (B, T, KVH, D); positions: (B, S).
    """
    b, s_q, h, d = q.shape
    t, n_kv = k.shape[1], k.shape[2]
    group = h // n_kv
    gs = group * s_q
    kv_blk = min(t, 256)
    while t % kv_blk:
        kv_blk //= 2
    # (B, S, KVH, G, D) -> (B, KVH*G*S, D): tiny (one decode step of q)
    qg = (q.reshape(b, s_q, n_kv, group, d)
          .transpose(0, 2, 3, 1, 4)
          .reshape(b, n_kv * gs, d))
    k2 = k.reshape(b, t, n_kv * d)
    v2 = v.reshape(b, t, n_kv * d)
    pos0 = positions[:, 0].astype(jnp.int32)  # (B,) first query position
    pos_last = positions[:, -1].astype(jnp.int32)
    nblk = jnp.clip((pos_last + 1 + kv_blk - 1) // kv_blk, 1, t // kv_blk)
    fn = _build_decode_attn(b, s_q, t, n_kv, group, d, float(scale),
                            str(k.dtype), str(q.dtype))
    out = fn(nblk.astype(jnp.int32), pos0[:, None], qg, k2, v2)
    return (out.reshape(b, n_kv, group, s_q, d)
            .transpose(0, 3, 1, 2, 4)
            .reshape(b, s_q, h, d))
