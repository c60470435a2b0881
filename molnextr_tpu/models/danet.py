"""Dual-attention (DANet) heads.

Parity with the reference's position/channel attention modules
(`/root/reference/MolNexTR/components.py:14-106`), which are defined there
but not used in the released forward path; they are selectable feature-map
refinement heads over encoder features.  Kept as optional modules here for
the same reason — API completeness and experimentation.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class PositionAttention(nn.Module):
    """Spatial self-attention over H*W positions (`components.py:14-34`)."""

    in_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, C) -> same shape."""
        b, h, w, c = x.shape
        qk = max(c // 8, 1)
        cb = nn.Conv(qk, (1, 1), dtype=self.dtype, name="conv_b")(x)
        cc = nn.Conv(qk, (1, 1), dtype=self.dtype, name="conv_c")(x)
        cd = nn.Conv(c, (1, 1), dtype=self.dtype, name="conv_d")(x)
        q = cb.reshape(b, h * w, -1)
        k = cc.reshape(b, h * w, -1)
        v = cd.reshape(b, h * w, c)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32), axis=-1
        ).astype(x.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
        alpha = self.param("alpha", nn.initializers.zeros, ())
        return alpha * out + x


class ChannelAttention(nn.Module):
    """Channel self-attention (`components.py:37-56`)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        flat = x.reshape(b, h * w, c)
        energy = jnp.einsum("bnc,bnd->bcd", flat, flat).astype(jnp.float32)
        # subtract-max trick from the reference: attention on (max - energy)
        energy = energy.max(axis=-1, keepdims=True) - energy
        attn = jax.nn.softmax(energy, axis=-1).astype(x.dtype)
        out = jnp.einsum("bcd,bnd->bnc", attn, flat).reshape(b, h, w, c)
        beta = self.param("beta", nn.initializers.zeros, ())
        return beta * out + x


class DAHead(nn.Module):
    """Fusion head combining both attentions (`components.py:58-106`)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        c = x.shape[-1]
        inter = max(c // 4, 1)

        def conv_block(y, name):
            y = nn.Conv(inter, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=f"{name}_conv")(y)
            y = nn.LayerNorm(dtype=self.dtype, name=f"{name}_norm")(y)
            return nn.relu(y)

        p = conv_block(x, "p1")
        p = PositionAttention(inter, self.dtype, name="pam")(p)
        p = conv_block(p, "p2")
        ch = conv_block(x, "c1")
        ch = ChannelAttention(self.dtype, name="cam")(ch)
        ch = conv_block(ch, "c2")
        fused = p + ch
        fused = nn.Dropout(rate=0.1)(fused, deterministic=deterministic)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="out")(fused)
