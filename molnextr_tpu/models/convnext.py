"""ConvNeXt encoder backbone (Flax).

The reference selects ConvNeXt through timm as the alternate image encoder
(`/root/reference/MolNexTR/components.py:121-126`); XLA lowers these
depthwise + pointwise convolutions directly onto the MXU, so no custom
kernels are needed.  Returns features shaped (B, H/32 * W/32, C) to match
the Swin encoder contract.
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from molnextr_tpu.config import EncoderConfig


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        y = nn.Conv(
            self.dim, (7, 7), padding=3, feature_group_count=self.dim,
            dtype=self.dtype, name="dwconv",
        )(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="pw1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="pw2")(y)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,))
        y = y * gamma.astype(y.dtype)
        if self.drop_path > 0 and not deterministic:
            keep = 1.0 - self.drop_path
            mask = jax.random.bernoulli(
                self.make_rng("dropout"), keep, (x.shape[0], 1, 1, 1)
            )
            y = y * mask.astype(y.dtype) / keep
        return x + y


class ConvNeXtEncoder(nn.Module):
    cfg: EncoderConfig
    input_size: int = 384
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, deterministic=True):
        c = self.cfg
        depths, dims = c.convnext_depths, c.convnext_dims
        x = nn.Conv(dims[0], (4, 4), strides=(4, 4), dtype=self.dtype, name="stem")(images)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)
        hiddens: List[jnp.ndarray] = []
        total = sum(depths)
        dpr = np.linspace(0, c.drop_path_rate, total)
        blk = 0
        for stage, depth in enumerate(depths):
            if stage > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"down_norm{stage}")(x)
                x = nn.Conv(
                    dims[stage], (2, 2), strides=(2, 2), dtype=self.dtype,
                    name=f"down{stage}",
                )(x)
            for i in range(depth):
                x = ConvNeXtBlock(
                    dims[stage], float(dpr[blk]), self.dtype, name=f"s{stage}_b{i}"
                )(x, deterministic)
                blk += 1
            hiddens.append(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="final_norm")(x)
        b, h, w, d = x.shape
        return x.reshape(b, h * w, d), hiddens
