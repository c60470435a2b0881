"""Swin vision transformer encoder (Flax).

Re-design of the reference's timm-based Swin implementation
(`/root/reference/MolNexTR/models/transformers.py:68-551`) for XLA: windows
are formed with pure reshapes/transposes (static shapes), the shifted-window
attention mask is a compile-time constant, and every (windows x 144 x dim)
attention batch maps straight onto the MXU.  ``swin_base`` configuration:
patch 4, window 12, dim 128, depths (2,2,18,2), heads (4,8,16,32)
(`transformers.py:547-551`).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from molnextr_tpu.config import EncoderConfig


def _rel_pos_index(ws: int) -> np.ndarray:
    """Relative-position index table for a ws x ws window
    (`transformers.py:122-137`)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # 2, N, N
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # (N, N)


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(x: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """(B*nW, ws*ws, C) -> (B, H, W, C)."""
    c = x.shape[-1]
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


from functools import lru_cache


@lru_cache(maxsize=None)
def shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows: True = masked
    (`transformers.py:204-223`).  Pure numpy so it stays a compile-time
    constant even when traced under jit/remat."""
    img = np.zeros((h, w), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wss in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wss] = cnt
            cnt += 1
    win = (
        img.reshape(h // ws, ws, w // ws, ws)
        .transpose(0, 2, 1, 3)
        .reshape(-1, ws * ws)
    )
    return win[:, None, :] != win[:, :, None]  # (nW, N, N)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: Any = jnp.float32
    softmax_f32: bool = True

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        """x: (nB, N, C) windows; mask: (nW, N, N) bool or None."""
        nb, n, c = x.shape
        h = self.num_heads
        hd = self.dim // h
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        # split q/k/v as minor-axis slices: the Dense channel order is
        # (qkv, head, head_dim), so [..., :C] IS q — no 5D reshape across
        # the packed axis, which XLA materialized as a (nB, N, 3, H, hd)
        # layout copy (measured 10.8ms per stage-1 block)
        q = qkv[..., : self.dim].reshape(nb, n, h, hd)
        k = qkv[..., self.dim : 2 * self.dim].reshape(nb, n, h, hd)
        v = qkv[..., 2 * self.dim :].reshape(nb, n, h, hd)
        scale = jnp.asarray(hd ** -0.5, self.dtype)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
        bias_table = self.param(
            "rel_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, h),
        )
        index = _rel_pos_index(self.window_size)
        bias = bias_table[index.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)
        attn = attn + bias.astype(attn.dtype)[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(nb // nw, nw, h, n, n)
            attn = jnp.where(mask[None, :, None], jnp.asarray(-1e9, attn.dtype), attn)
            attn = attn.reshape(nb, h, n, n)
        if self.softmax_f32:
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        else:
            # bf16 softmax halves the traffic of the (nB, H, 144, 144)
            # attention tensors (max-subtraction keeps it stable over 144
            # logits); gate via EncoderConfig.softmax_f32
            attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(nb, n, c)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    resolution: Tuple[int, int]
    window_size: int
    shift: int
    mlp_ratio: float
    drop_path: float
    dtype: Any = jnp.float32
    softmax_f32: bool = True

    @nn.compact
    def __call__(self, x, deterministic=True):
        hres, wres = self.resolution
        ws = min(self.window_size, min(hres, wres))
        shift = 0 if ws >= min(hres, wres) and self.shift else self.shift
        b, l, c = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x.reshape(b, hres, wres, c)
        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        windows = window_partition(x, ws)
        mask = None
        if shift:
            mask = jnp.asarray(shift_attn_mask(hres, wres, ws, shift))
        attn = WindowAttention(
            self.dim, self.num_heads, ws, self.dtype, self.softmax_f32, name="attn"
        )(windows, mask, deterministic)
        x = window_reverse(attn, ws, hres, wres)
        if shift:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x.reshape(b, l, c)
        x = shortcut + self._drop_path(x, deterministic)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return x + self._drop_path(y, deterministic)

    def _drop_path(self, x, deterministic):
        if self.drop_path == 0.0 or deterministic:
            return x
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1))
        return x * mask.astype(x.dtype) / keep


class PatchMerging(nn.Module):
    dim: int
    resolution: Tuple[int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = self.resolution
        b, l, c = x.shape
        x = x.reshape(b, h, w, c)
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        x = x.reshape(b, (h // 2) * (w // 2), 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction")(x)


def _pick_tile(t: int, cap: int = 512) -> int:
    """Largest power-of-two tile <= cap that divides t (>= 8 if possible).

    When no aligned tile divides t (e.g. t=36 rows at batch 1), fall back
    to the whole array as a single block — Mosaic requires block dims to be
    (8, 128)-aligned OR equal to the full array dims, so a tile of 1 row is
    rejected while the full t x C block is always legal."""
    tile = cap
    while tile > 8 and t % tile != 0:
        tile //= 2
    return tile if (t % tile == 0 and tile >= 8) else t


class SwinEncoder(nn.Module):
    """Full Swin encoder returning final tokens + per-stage hidden maps
    (mirroring `Encoder.forwards`, `components.py:136-160`).

    Inference on TPU routes each block through the fused pallas kernels
    (``ops.swin_fused``): [LN1+window-MHA+proj] and [LN2+MLP] each read and
    write the activation exactly once in its natural layout, eliminating
    the window-partition transpose copies and the transposing LayerNorm
    fusions the XLA path pays for (measured ~2x the encoder's matmul time).
    Training / init / non-TPU use the flax module path (autodiff + remat).
    """

    cfg: EncoderConfig
    input_size: int = 384
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, deterministic=True):
        c = self.cfg
        x = nn.Conv(
            c.embed_dim, (c.patch_size, c.patch_size), strides=(c.patch_size, c.patch_size),
            dtype=self.dtype, name="patch_embed",
        )(images)  # (B, H/4, W/4, C)
        b, h, w, _ = x.shape
        x = x.reshape(b, h * w, c.embed_dim)
        if c.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)

        from molnextr_tpu.ops.swin_fused import fused_encoder_enabled

        use_fused = (
            deterministic
            and not self.is_initializing()
            and fused_encoder_enabled()
        )
        hiddens: List[jnp.ndarray] = []
        res = (h, w)
        dims = [int(c.embed_dim * 2 ** i) for i in range(len(c.depths))]
        total_blocks = sum(c.depths)
        dpr = np.linspace(0, c.drop_path_rate, total_blocks)
        blk = 0
        for stage, depth in enumerate(c.depths):
            dim = dims[stage]
            block_cls = nn.remat(SwinBlock, static_argnums=(2,)) if c.use_remat else SwinBlock
            for i in range(depth):
                shift = 0 if i % 2 == 0 else c.window_size // 2
                if use_fused:
                    x = self._fused_block(
                        x, f"stage{stage}_block{i}", res,
                        c.window_size, shift, c.num_heads[stage], b, dim,
                    )
                else:
                    x = block_cls(
                        dim=dim,
                        num_heads=c.num_heads[stage],
                        resolution=res,
                        window_size=c.window_size,
                        shift=shift,
                        mlp_ratio=c.mlp_ratio,
                        drop_path=float(dpr[blk]),
                        dtype=self.dtype,
                        softmax_f32=c.softmax_f32,
                        name=f"stage{stage}_block{i}",
                    )(x, deterministic)
                blk += 1
            hiddens.append(x.reshape(b, res[0], res[1], dim))
            if stage < len(c.depths) - 1:
                x = PatchMerging(dim, res, self.dtype, name=f"merge{stage}")(x)
                res = (res[0] // 2, res[1] // 2)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        hiddens[-1] = x.reshape(b, res[0], res[1], dims[-1])
        return x, hiddens

    def _fused_block(self, x, pname, res, window_size, shift, heads, b, dim):
        """One Swin block via the fused pallas kernels (inference only).

        Reads the flax params of the (un-called) module ``pname`` directly —
        the parameter tree is identical to the module path, so checkpoints
        and the converter are unaffected.
        """
        from molnextr_tpu.ops.swin_fused import (
            fused_interpret_mode,
            fused_ln_mlp,
            fused_window_attention,
        )

        interp = fused_interpret_mode()

        bp = self.variables["params"][pname]
        hres, wres = res
        ws = min(window_size, min(hres, wres))
        if ws >= min(hres, wres):
            shift = 0
        n = ws * ws
        table = jnp.asarray(bp["attn"]["rel_bias"])
        idx = _rel_pos_index(ws)
        bias = table[idx.reshape(-1)].reshape(n, n, heads).transpose(2, 0, 1)
        bias = bias.astype(jnp.float32)
        xsp = x.reshape(b, hres, wres, dim)
        if shift:
            maskb = shift_attn_mask(hres, wres, ws, shift)
            mask = np.where(maskb, -100.0, 0.0).astype(np.float32)
            xin = jnp.roll(xsp, (-shift, -shift), axis=(1, 2))
        else:
            mask = None
            xin = xsp
        attn = fused_window_attention(
            xin,
            jnp.asarray(bp["attn"]["qkv"]["kernel"]),
            jnp.asarray(bp["attn"]["qkv"]["bias"]),
            jnp.asarray(bp["attn"]["proj"]["kernel"]),
            jnp.asarray(bp["attn"]["proj"]["bias"]),
            jnp.asarray(bp["norm1"]["scale"]),
            jnp.asarray(bp["norm1"]["bias"]),
            bias,
            mask,
            heads,
            ws,
            interpret=interp,
        )
        if shift:
            attn = jnp.roll(attn, (shift, shift), axis=(1, 2))
        xr = xsp + attn
        t = b * hres * wres
        y = fused_ln_mlp(
            xr.reshape(t, dim),
            jnp.asarray(bp["norm2"]["scale"]),
            jnp.asarray(bp["norm2"]["bias"]),
            jnp.asarray(bp["fc1"]["kernel"]),
            jnp.asarray(bp["fc1"]["bias"]),
            jnp.asarray(bp["fc2"]["kernel"]),
            jnp.asarray(bp["fc2"]["bias"]),
            tile=_pick_tile(t),
            interpret=interp,
        )
        return (xr.reshape(b, hres * wres, dim) + y.reshape(b, hres * wres, dim))
