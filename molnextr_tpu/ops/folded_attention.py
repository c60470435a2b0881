"""Pallas TPU kernel: decode attention over a head-folded KV cache.

Layout is everything on TPU: a ``(B, H, T, d=32)`` cache wastes 3/4 of every
128-lane vector register and pads HBM tiles 4x.  This kernel keeps the cache
**head-folded** as ``(L, B, T, D=H*d)`` — the natural output layout of the
K/V projections, 128-aligned in the lane dimension — and computes all-head
attention with two dense MXU matmuls per chunk:

* scores: ``S = K_chunk @ Q_bd`` where ``Q_bd`` is the query scattered into
  a (D, H) block-diagonal matrix (column h holds q's head-h slice), so one
  matmul yields per-head scores (CHUNK, H);
* context: ``C = P^T @ V_chunk`` gives (H, D); the per-head 32-column block
  of row h is the head-h context, extracted with a block-diagonal mask and
  a row-sum at finalize.

Like :mod:`molnextr_tpu.ops.decode_attention`, the position and layer index
are scalar-prefetch operands and out-of-prefix chunks are never fetched.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128


def _make_kernel(n_heads: int):
    def kernel(pos_ref, layer_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
        c = pl.program_id(1)
        n_chunks = pl.num_programs(1)
        pos = pos_ref[0]

        @pl.when(c == 0)
        def _init():
            for hh in range(n_heads):
                m_ref[hh, 0] = -1e30
                l_ref[hh, 0] = 0.0
            acc_ref[:] = jnp.zeros_like(acc_ref)

        chunk_start = c * CHUNK

        @pl.when(chunk_start <= pos)
        def _attend():
            q = q_ref[0, 0].astype(jnp.float32)  # (D,)
            d_model = q.shape[0]
            hd = d_model // n_heads
            scale = 1.0 / (hd ** 0.5)
            # block-diagonal query: col h = q masked to head h's rows
            row_head = jax.lax.broadcasted_iota(jnp.int32, (d_model, n_heads), 0) // hd
            col = jax.lax.broadcasted_iota(jnp.int32, (d_model, n_heads), 1)
            q_bd = jnp.where(row_head == col, q[:, None], 0.0)  # (D, H)
            k = k_ref[0, 0].astype(jnp.float32)  # (CHUNK, D)
            v = v_ref[0, 0].astype(jnp.float32)  # (CHUNK, D)
            s = jnp.dot(k, q_bd, preferred_element_type=jnp.float32) * scale  # (CHUNK, H)
            t_idx = chunk_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            s = jnp.where(t_idx > pos, -1e30, s)
            s_max = s.max(axis=0)  # (H,)
            # online softmax per head (scalars in SMEM)
            for hh in range(n_heads):
                m_prev = m_ref[hh, 0]
                m_new = jnp.maximum(m_prev, s_max[hh])
                alpha = jnp.exp(m_prev - m_new)
                p_h = jnp.exp(s[:, hh : hh + 1] - m_new)  # (CHUNK, 1)
                l_ref[hh, 0] = l_ref[hh, 0] * alpha + p_h.sum()
                ctx = jnp.dot(p_h.T, v, preferred_element_type=jnp.float32)  # (1, D)
                acc_ref[hh : hh + 1, :] = acc_ref[hh : hh + 1, :] * alpha + ctx
                m_ref[hh, 0] = m_new

        @pl.when(c == n_chunks - 1)
        def _finalize():
            d_model = acc_ref.shape[1]
            hd = d_model // n_heads
            col_head = jax.lax.broadcasted_iota(jnp.int32, (n_heads, d_model), 1) // hd
            row = jax.lax.broadcasted_iota(jnp.int32, (n_heads, d_model), 0)
            mask = (col_head == row).astype(jnp.float32)  # (H, D) block diag
            out = jnp.zeros((1, d_model), jnp.float32)
            for hh in range(n_heads):
                denom = jnp.maximum(l_ref[hh, 0], 1e-30)
                out = out + acc_ref[hh : hh + 1, :] * (mask[hh : hh + 1, :] / denom)
            o_ref[0] = out.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_heads", "interpret"))
def folded_decode_attention(
    q: jnp.ndarray,
    k_full: jnp.ndarray,
    v_full: jnp.ndarray,
    pos: jnp.ndarray,
    layer: jnp.ndarray,
    n_heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """q: (B, D); k_full/v_full: (L, B, T, D); pos/layer scalars.

    Returns the all-head context (B, D), already concatenated in head order.
    """
    lcount, b, t, d_model = k_full.shape
    assert t % CHUNK == 0
    n_chunks = t // CHUNK
    pos_arr = jnp.reshape(pos.astype(jnp.int32), (1,))
    layer_arr = jnp.reshape(layer.astype(jnp.int32), (1,))

    def q_map(bi, ci, pos_ref, layer_ref):
        return (bi, 0, 0)

    def kv_map(bi, ci, pos_ref, layer_ref):
        last_valid = jax.lax.div(pos_ref[0], CHUNK)
        return (layer_ref[0], bi, jnp.minimum(ci, last_valid), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, d_model), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CHUNK, d_model), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CHUNK, d_model), kv_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, d_model), q_map, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((n_heads, 1), jnp.float32),
            pltpu.SMEM((n_heads, 1), jnp.float32),
            pltpu.VMEM((n_heads, d_model), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        _make_kernel(n_heads),
        out_shape=jax.ShapeDtypeStruct((b, 1, d_model), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(pos_arr, layer_arr, q[:, None, :], k_full, v_full)
    return out[:, 0, :]


def _make_kernel_bb(n_heads: int, bb: int):
    """Batch-blocked variant: each program handles ``bb`` batch rows, so
    DMAs move ~1MB instead of ~64KB and the grid shrinks by ``bb``x."""

    def kernel(pos_ref, layer_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
        """Softmax stats live in VMEM as (bb, H) rows: every update is a
        vector op — routing them through SMEM scalars serializes ~1.5k
        scalar-core round trips per call (measured 10x slowdown)."""
        c = pl.program_id(1)
        n_chunks = pl.num_programs(1)
        pos = pos_ref[0]

        @pl.when(c == 0)
        def _init():
            m_ref[:] = jnp.full_like(m_ref, -1e30)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        chunk_start = c * CHUNK

        @pl.when(chunk_start <= pos)
        def _attend():
            d_model = acc_ref.shape[1]
            hd = d_model // n_heads
            scale = 1.0 / (hd ** 0.5)
            row_head = jax.lax.broadcasted_iota(jnp.int32, (d_model, n_heads), 0) // hd
            col = jax.lax.broadcasted_iota(jnp.int32, (d_model, n_heads), 1)
            diag = row_head == col
            t_iota = chunk_start + jax.lax.broadcasted_iota(
                jnp.int32, (CHUNK, n_heads), 0
            )
            invalid = t_iota > pos
            for b_i in range(bb):
                q = q_ref[b_i, 0].astype(jnp.float32)  # (D,)
                q_bd = jnp.where(diag, q[:, None], 0.0)
                k = k_ref[0, b_i].astype(jnp.float32)  # (CHUNK, D)
                v = v_ref[0, b_i].astype(jnp.float32)
                s = jnp.dot(k, q_bd, preferred_element_type=jnp.float32) * scale
                s = jnp.where(invalid, -1e30, s)  # (CHUNK, H)
                m_prev = m_ref[b_i : b_i + 1, :]  # (1, H)
                m_new = jnp.maximum(m_prev, s.max(axis=0, keepdims=True))
                alpha = jnp.exp(m_prev - m_new)  # (1, H)
                p = jnp.exp(s - m_new)  # (CHUNK, H)
                l_ref[b_i : b_i + 1, :] = (
                    l_ref[b_i : b_i + 1, :] * alpha + p.sum(axis=0, keepdims=True)
                )
                ctx = jax.lax.dot_general(
                    p, v, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (H, D)
                off = b_i * n_heads
                acc_ref[off : off + n_heads, :] = (
                    acc_ref[off : off + n_heads, :] * alpha.reshape(n_heads, 1) + ctx
                )
                m_ref[b_i : b_i + 1, :] = m_new

        @pl.when(c == n_chunks - 1)
        def _finalize():
            d_model = acc_ref.shape[1]
            hd = d_model // n_heads
            col_head = jax.lax.broadcasted_iota(jnp.int32, (n_heads, d_model), 1) // hd
            row = jax.lax.broadcasted_iota(jnp.int32, (n_heads, d_model), 0)
            mask = (col_head == row).astype(jnp.float32)
            for b_i in range(bb):
                off = b_i * n_heads
                denom = jnp.maximum(l_ref[b_i : b_i + 1, :], 1e-30)
                ctx = acc_ref[off : off + n_heads, :] / denom.reshape(n_heads, 1)
                o_ref[b_i] = (ctx * mask).sum(axis=0, keepdims=True).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_heads", "bb", "interpret"))
def folded_decode_attention_bb(
    q: jnp.ndarray,
    k_full: jnp.ndarray,
    v_full: jnp.ndarray,
    pos: jnp.ndarray,
    layer: jnp.ndarray,
    n_heads: int,
    bb: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batch-blocked folded attention; q (B, D), cache (L, B, T, D)."""
    lcount, b, t, d_model = k_full.shape
    assert t % CHUNK == 0 and b % bb == 0
    n_chunks = t // CHUNK
    pos_arr = jnp.reshape(pos.astype(jnp.int32), (1,))
    layer_arr = jnp.reshape(layer.astype(jnp.int32), (1,))

    def q_map(bi, ci, pos_ref, layer_ref):
        return (bi, 0, 0)

    def kv_map(bi, ci, pos_ref, layer_ref):
        last_valid = jax.lax.div(pos_ref[0], CHUNK)
        return (layer_ref[0], bi, jnp.minimum(ci, last_valid), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b // bb, n_chunks),
        in_specs=[
            pl.BlockSpec((bb, 1, d_model), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bb, CHUNK, d_model), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bb, CHUNK, d_model), kv_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, 1, d_model), q_map, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bb, n_heads), jnp.float32),  # running max (vector rows)
            pltpu.VMEM((bb, n_heads), jnp.float32),  # running denom
            pltpu.VMEM((bb * n_heads, d_model), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        _make_kernel_bb(n_heads, bb),
        out_shape=jax.ShapeDtypeStruct((b, 1, d_model), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(pos_arr, layer_arr, q[:, None, :], k_full, v_full)
    return out[:, 0, :]


def folded_decode_attention_reference(
    q: jnp.ndarray, k_full: jnp.ndarray, v_full: jnp.ndarray,
    pos: jnp.ndarray, layer: jnp.ndarray, n_heads: int,
) -> jnp.ndarray:
    """Pure-XLA reference / CPU fallback."""
    k = jax.lax.dynamic_index_in_dim(k_full, layer, 0, keepdims=False)
    v = jax.lax.dynamic_index_in_dim(v_full, layer, 0, keepdims=False)
    b, t, d_model = k.shape
    hd = d_model // n_heads
    qh = q.reshape(b, n_heads, hd)
    kh = k.reshape(b, t, n_heads, hd)
    vh = v.reshape(b, t, n_heads, hd)
    # transpose-free einsums: contract on the folded layout directly so XLA
    # fuses the mask/softmax without materializing a (B,H,T,d) copy
    s = jnp.einsum("bhd,bthd->bht", qh.astype(jnp.float32), kh.astype(jnp.float32))
    s = s / (hd ** 0.5)
    s = jnp.where(jnp.arange(t)[None, None] > pos, -1e30, s)
    p = jax.nn.softmax(s, axis=-1)
    ctx = jnp.einsum("bht,bthd->bhd", p, vh.astype(jnp.float32))
    return ctx.reshape(b, d_model).astype(q.dtype)


def cached_folded_attention(
    q: jnp.ndarray, k_full: jnp.ndarray, v_full: jnp.ndarray,
    pos: jnp.ndarray, layer: jnp.ndarray, n_heads: int,
) -> jnp.ndarray:
    from molnextr_tpu.ops.decode_attention import use_pallas

    if use_pallas() and k_full.shape[2] % CHUNK == 0:
        return folded_decode_attention(q, k_full, v_full, pos, layer, n_heads)
    return folded_decode_attention_reference(q, k_full, v_full, pos, layer, n_heads)
