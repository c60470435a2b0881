"""Pallas TPU kernel: single-token decode attention over a KV cache.

The hot op of autoregressive decoding: at step ``pos`` the query attends to
cache positions ``0..pos``.  The XLA fallback reads the FULL ``max_len``
cache every step and masks the tail — at 480 steps that is ~2x the
necessary HBM traffic on average.  This kernel makes the prefix skip real:

* the grid is ``(B, n_chunks)`` over 128-position cache chunks;
* ``pos`` is a scalar-prefetch operand, so the BlockSpec ``index_map``
  clamps out-of-range chunk indices to the last valid chunk — Mosaic skips
  the DMA when the block index repeats, so chunks beyond ``pos`` are never
  fetched from HBM;
* softmax runs online (flash-attention style running max/sum) across chunk
  iterations in VMEM scratch.

Shapes: q (B, H, d), k/v (B, H, T, d) with T a multiple of the chunk.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128


def _kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    pos = pos_ref[0]

    @pl.when(c == 0)
    def _init():
        for hh in range(m_ref.shape[0]):  # SMEM takes scalar stores only
            m_ref[hh, 0] = -1e30
            l_ref[hh, 0] = 0.0
        acc_ref[:] = jnp.zeros_like(acc_ref)

    chunk_start = c * CHUNK

    @pl.when(chunk_start <= pos)
    def _attend():
        q = q_ref[0].astype(jnp.float32)  # (H, d)
        d = q.shape[-1]
        h_heads = q.shape[0]
        scale = 1.0 / (d ** 0.5)
        t_idx = chunk_start + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        invalid = t_idx > pos  # (CHUNK, 1)
        # static per-head loop: Mosaic lowers plain 2D dots, not batched dims
        for hh in range(h_heads):
            kh = k_ref[0, hh].astype(jnp.float32)  # (CHUNK, d)
            vh = v_ref[0, hh].astype(jnp.float32)  # (CHUNK, d)
            qh = q[hh].reshape(d, 1)  # (d, 1)
            scores = (
                jnp.dot(kh, qh, preferred_element_type=jnp.float32) * scale
            )  # (CHUNK, 1)
            scores = jnp.where(invalid, -1e30, scores)
            m_prev = m_ref[hh, 0]
            m_new = jnp.maximum(m_prev, scores.max())
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(scores - m_new)  # (CHUNK, 1)
            l_new = l_ref[hh, 0] * alpha + p.sum()
            ctx = jnp.dot(p.T, vh, preferred_element_type=jnp.float32)  # (1, d)
            acc_ref[hh : hh + 1, :] = acc_ref[hh : hh + 1, :] * alpha + ctx
            m_ref[hh, 0] = m_new
            l_ref[hh, 0] = l_new

    @pl.when(c == n_chunks - 1)
    def _finalize():
        h_heads = acc_ref.shape[0]
        for hh in range(h_heads):
            denom = jnp.maximum(l_ref[hh, 0], 1e-30)
            o_ref[0, hh : hh + 1, :] = (acc_ref[hh : hh + 1, :] / denom).astype(
                o_ref.dtype
            )


def decode_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, pos: jnp.ndarray
) -> jnp.ndarray:
    """q: (B, H, d); k/v: (B, H, T, d); pos: scalar int32 (current step).

    Returns the attention context (B, H, d).  T must be a multiple of 128.
    """
    b, h, t, d = k.shape
    assert t % CHUNK == 0, f"cache length {t} not a multiple of {CHUNK}"
    n_chunks = t // CHUNK
    pos_arr = jnp.reshape(pos.astype(jnp.int32), (1,))

    def q_map(bi, ci, pos_ref):
        return (bi, 0, 0)

    def kv_map(bi, ci, pos_ref):
        # clamp chunks beyond the valid prefix to the last valid chunk:
        # a repeated block index skips the HBM fetch
        last_valid = jax.lax.div(pos_ref[0], CHUNK)
        return (bi, 0, jnp.minimum(ci, last_valid), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, h, d), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, CHUNK, d), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, CHUNK, d), kv_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, d), q_map, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((h, 1), jnp.float32),  # running max (scalar per head)
            pltpu.SMEM((h, 1), jnp.float32),  # running denom
            pltpu.VMEM((h, d), jnp.float32),  # numerator accumulator
        ],
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        grid_spec=grid_spec,
    )(pos_arr, q, k, v)


def _kernel_layered(pos_ref, layer_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
    """Same online-softmax math as _kernel, but k/v blocks are 5D
    (1, 1, h, CHUNK, d) slices of the stacked cache (Mosaic cannot slice a
    sub-ref view, so indexing happens inline)."""
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    pos = pos_ref[0]

    @pl.when(c == 0)
    def _init():
        for hh in range(m_ref.shape[0]):
            m_ref[hh, 0] = -1e30
            l_ref[hh, 0] = 0.0
        acc_ref[:] = jnp.zeros_like(acc_ref)

    chunk_start = c * CHUNK

    @pl.when(chunk_start <= pos)
    def _attend():
        q = q_ref[0].astype(jnp.float32)  # (H, d)
        d = q.shape[-1]
        h_heads = q.shape[0]
        scale = 1.0 / (d ** 0.5)
        t_idx = chunk_start + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        invalid = t_idx > pos
        for hh in range(h_heads):
            kh = k_ref[0, 0, hh].astype(jnp.float32)  # (CHUNK, d)
            vh = v_ref[0, 0, hh].astype(jnp.float32)
            qh = q[hh].reshape(d, 1)
            scores = jnp.dot(kh, qh, preferred_element_type=jnp.float32) * scale
            scores = jnp.where(invalid, -1e30, scores)
            m_prev = m_ref[hh, 0]
            m_new = jnp.maximum(m_prev, scores.max())
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(scores - m_new)
            l_new = l_ref[hh, 0] * alpha + p.sum()
            ctx = jnp.dot(p.T, vh, preferred_element_type=jnp.float32)
            acc_ref[hh : hh + 1, :] = acc_ref[hh : hh + 1, :] * alpha + ctx
            m_ref[hh, 0] = m_new
            l_ref[hh, 0] = l_new

    @pl.when(c == n_chunks - 1)
    def _finalize():
        h_heads = acc_ref.shape[0]
        for hh in range(h_heads):
            denom = jnp.maximum(l_ref[hh, 0], 1e-30)
            o_ref[0, hh : hh + 1, :] = (acc_ref[hh : hh + 1, :] / denom).astype(
                o_ref.dtype
            )


def decode_attention_layered(
    q: jnp.ndarray,
    k_full: jnp.ndarray,
    v_full: jnp.ndarray,
    pos: jnp.ndarray,
    layer: jnp.ndarray,
) -> jnp.ndarray:
    """Attention for one layer of a stacked cache, without slicing it.

    q: (B, H, d); k_full/v_full: (L, B, H, T, d); pos/layer: scalars.
    Reading directly from the stacked HBM array avoids materializing a
    per-layer 67MB dynamic-slice copy inside the scan-over-layers step.
    """
    lcount, b, h, t, d = k_full.shape
    assert t % CHUNK == 0, f"cache length {t} not a multiple of {CHUNK}"
    n_chunks = t // CHUNK
    pos_arr = jnp.reshape(pos.astype(jnp.int32), (1,))
    layer_arr = jnp.reshape(layer.astype(jnp.int32), (1,))

    def q_map(bi, ci, pos_ref, layer_ref):
        return (bi, 0, 0)

    def kv_map(bi, ci, pos_ref, layer_ref):
        last_valid = jax.lax.div(pos_ref[0], CHUNK)
        return (layer_ref[0], bi, 0, jnp.minimum(ci, last_valid), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, h, d), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, CHUNK, d), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, CHUNK, d), kv_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, d), q_map, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((h, 1), jnp.float32),
            pltpu.SMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, d), jnp.float32),
        ],
    )

    return pl.pallas_call(
        _kernel_layered,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        grid_spec=grid_spec,
    )(pos_arr, layer_arr, q, k_full, v_full)


def decode_attention_layered_reference(
    q: jnp.ndarray, k_full: jnp.ndarray, v_full: jnp.ndarray,
    pos: jnp.ndarray, layer: jnp.ndarray,
) -> jnp.ndarray:
    k = jax.lax.dynamic_index_in_dim(k_full, layer, 0, keepdims=False)
    v = jax.lax.dynamic_index_in_dim(v_full, layer, 0, keepdims=False)
    return decode_attention_reference(q, k, v, pos)


def cached_decode_attention_layered(
    q: jnp.ndarray, k_full: jnp.ndarray, v_full: jnp.ndarray,
    pos: jnp.ndarray, layer: jnp.ndarray,
) -> jnp.ndarray:
    if use_pallas() and k_full.shape[3] % CHUNK == 0:
        return decode_attention_layered(q, k_full, v_full, pos, layer)
    return decode_attention_layered_reference(q, k_full, v_full, pos, layer)


def use_pallas() -> bool:
    """Whether to route decode attention through the pallas kernels.

    Measured on v5e: XLA's fused masked attention over the carry-resident
    cache runs at 3.6ms/step (batch 256) vs 16.7ms/step for the per-head
    unrolled pallas kernels, so XLA is the default; set ``MOLNEXTR_PALLAS=1``
    to opt in to the kernels (useful for kernel development).
    """
    import os

    if os.environ.get("MOLNEXTR_NO_PALLAS"):
        return False
    if not os.environ.get("MOLNEXTR_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def cached_decode_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, pos: jnp.ndarray
) -> jnp.ndarray:
    """Dispatch to the pallas kernel on TPU, XLA reference elsewhere."""
    if use_pallas() and k.shape[2] % CHUNK == 0:
        return decode_attention(q, k, v, pos)
    return decode_attention_reference(q, k, v, pos)


def cross_decode_attention_folded(
    q: jnp.ndarray,
    mem_k: jnp.ndarray,
    mem_v: jnp.ndarray,
    layer: jnp.ndarray,
    num_heads: int,
) -> jnp.ndarray:
    """Cross-attention for one decode step against a head-folded memory cache.

    q: (B, H, d); mem_k/mem_v: (L, B, M, H*d) raw K/V projections of the
    encoder memory (Dense channel order is (head, head_dim), so the reshape
    below is a free view); layer: scalar int32.

    The fold keeps the cache's minor HBM axis at H*d (=256 for the default
    model: two exact 128-lane tiles) instead of d=32.  Measured on v5e at
    batch 256: the (L, B, H, M, 32) layout cost 2.2ms/step in 4x-amplified
    reads; this layout reads at full bandwidth.  M is static and unpadded,
    so no masking is needed — softmax runs over the whole memory, exactly
    the reference semantics (`decoder.py:438-448` reads the full memory
    bank every step).
    """
    kl = jax.lax.dynamic_index_in_dim(mem_k, layer, 0, keepdims=False)
    vl = jax.lax.dynamic_index_in_dim(mem_v, layer, 0, keepdims=False)
    b, m, hd_total = kl.shape
    d = hd_total // num_heads
    k4 = kl.reshape(b, m, num_heads, d)
    v4 = vl.reshape(b, m, num_heads, d)
    # contract in the cache dtype with f32 accumulation: an explicit
    # astype(f32) on the cache materializes a full converted copy per
    # layer-step (measured 20ms x 768 in the decode trace)
    scores = jnp.einsum(
        "bhd,bmhd->bhm", q, k4, preferred_element_type=jnp.float32
    ) / (d ** 0.5)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhm,bmhd->bhd", p.astype(q.dtype), v4,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def quantize_per_token(x: jnp.ndarray, axis: int = -1):
    """Symmetric int8 quantization with one scale per token.

    ``axis`` is the reduced (channel) axis; the scale keeps that axis with
    size 1 so it broadcasts back.  Rounding runs in f32 regardless of the
    input dtype.  Returns (int8 values, f32 scales)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def decode_attention_reference_q8(
    q: jnp.ndarray,
    k_q: jnp.ndarray, k_s: jnp.ndarray,
    v_q: jnp.ndarray, v_s: jnp.ndarray,
    pos: jnp.ndarray,
) -> jnp.ndarray:
    """int8-cache self attention: q (B,H,d); k_q/v_q (B,H,T,d) int8 with
    per-token scales k_s/v_s (B,H,T,1) f32.

    Per-token symmetric scales factor OUT of both contractions exactly:
    ``scores[t] = s_k[t] * (q . K_q[t])`` and
    ``out = sum_t (p[t] * s_v[t]) * V_q[t]`` — so the only approximation is
    the 8-bit rounding of K/V themselves.  The int8 operand is converted
    on the fly inside the fused einsum; HBM still only reads 1 byte/elem,
    which is the point (the decode is cache-bandwidth-bound)."""
    d = q.shape[-1]
    # NO explicit astype on the cache: a standalone convert materializes a
    # full-size copy in HBM (round-2 trace, CLAUDE.md); implicit promotion
    # inside the einsum fuses the int8->float convert into the dot, so HBM
    # reads stay 1 byte/elem
    scores = jnp.einsum(
        "bhd,bhtd->bht", q, k_q, preferred_element_type=jnp.float32
    )
    scores = scores * k_s[..., 0] / (d ** 0.5)
    t_idx = jnp.arange(k_q.shape[2])
    scores = jnp.where(t_idx[None, None] > pos, -1e30, scores)
    p = jax.nn.softmax(scores, axis=-1)
    pv = (p * v_s[..., 0]).astype(q.dtype)
    out = jnp.einsum(
        "bht,bhtd->bhd", pv, v_q, preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def cached_decode_attention_layered_q8(
    q: jnp.ndarray,
    k_full: jnp.ndarray, k_scale: jnp.ndarray,
    v_full: jnp.ndarray, v_scale: jnp.ndarray,
    pos: jnp.ndarray, layer: jnp.ndarray,
) -> jnp.ndarray:
    """One layer of a stacked int8 self cache: k_full/v_full
    (L,B,H,T,d) int8, scales (L,B,H,T,1) f32."""
    k_q = jax.lax.dynamic_index_in_dim(k_full, layer, 0, keepdims=False)
    v_q = jax.lax.dynamic_index_in_dim(v_full, layer, 0, keepdims=False)
    k_s = jax.lax.dynamic_index_in_dim(k_scale, layer, 0, keepdims=False)
    v_s = jax.lax.dynamic_index_in_dim(v_scale, layer, 0, keepdims=False)
    return decode_attention_reference_q8(q, k_q, k_s, v_q, v_s, pos)


def cross_decode_attention_folded_q8(
    q: jnp.ndarray,
    mem_k: jnp.ndarray, mem_k_scale: jnp.ndarray,
    mem_v: jnp.ndarray, mem_v_scale: jnp.ndarray,
    layer: jnp.ndarray,
    num_heads: int,
) -> jnp.ndarray:
    """Head-folded cross attention against an int8 memory cache.

    mem_k/mem_v: (L,B,M,H*d) int8; scales (L,B,M,1) f32 (one per memory
    position, shared across the folded channel axis — factoring out of
    both einsums exactly as in :func:`decode_attention_reference_q8`).
    Layout rationale unchanged from :func:`cross_decode_attention_folded`.
    """
    kl = jax.lax.dynamic_index_in_dim(mem_k, layer, 0, keepdims=False)
    vl = jax.lax.dynamic_index_in_dim(mem_v, layer, 0, keepdims=False)
    ks = jax.lax.dynamic_index_in_dim(mem_k_scale, layer, 0, keepdims=False)
    vs = jax.lax.dynamic_index_in_dim(mem_v_scale, layer, 0, keepdims=False)
    b, m, hd_total = kl.shape
    d = hd_total // num_heads
    k4 = kl.reshape(b, m, num_heads, d)
    v4 = vl.reshape(b, m, num_heads, d)
    # implicit promotion only — see decode_attention_reference_q8
    scores = jnp.einsum(
        "bhd,bmhd->bhm", q, k4, preferred_element_type=jnp.float32
    )
    scores = scores * ks[..., 0][:, None, :] / (d ** 0.5)
    p = jax.nn.softmax(scores, axis=-1)
    pv = (p * vs[..., 0][:, None, :]).astype(q.dtype)
    out = jnp.einsum(
        "bhm,bmhd->bhd", pv, v4, preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def decode_attention_reference(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, pos: jnp.ndarray
) -> jnp.ndarray:
    """Pure-XLA reference used for testing and as a CPU fallback."""
    d = q.shape[-1]
    scores = jnp.einsum("bhd,bhtd->bht", q, k, preferred_element_type=jnp.float32)
    scores = scores / (d ** 0.5)
    t_idx = jnp.arange(k.shape[2])
    scores = jnp.where(t_idx[None, None] > pos, -1e30, scores)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bht,bhtd->bhd", p.astype(q.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)
