"""Top-level MolNexTR model: encoder + per-format decoders + edge head.

Mirrors the reference composition (`/root/reference/MolNexTR/components.py`):
``Encoder`` selects the backbone by name (`components.py:110-134`), encoder
features go through a Linear to the decoder width plus an optional learned
position embedding (`components.py:183-216`), and a ModuleDict-style
collection holds one autoregressive decoder per sequence format plus the
``edges`` GraphPredictor (`components.py:403-441`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from molnextr_tpu.config import Config
from molnextr_tpu.models.convnext import ConvNeXtEncoder
from molnextr_tpu.models.decoder import Decoder
from molnextr_tpu.models.heads import AtomHeatmapHead, GraphPredictor
from molnextr_tpu.models.swin import SwinEncoder


SEQ_FORMATS = ("atomtok", "atomtok_coords", "chartok_coords")


class MolNexTRModel(nn.Module):
    cfg: Config
    vocab_sizes: Dict[str, int]  # per sequence format
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.cfg
        if cfg.encoder.name.startswith("swin"):
            self.encoder = SwinEncoder(cfg.encoder, cfg.data.input_size, self.dtype)
        elif cfg.encoder.name.startswith("convnext"):
            self.encoder = ConvNeXtEncoder(cfg.encoder, cfg.data.input_size, self.dtype)
        else:
            raise ValueError(f"unknown encoder {cfg.encoder.name}")
        self.enc_trans = nn.Dense(cfg.decoder.hidden_size, dtype=self.dtype)
        if cfg.decoder.enc_pos_emb:
            self.enc_pos = nn.Embed(144, self.encoder_dim())
        decoders = {}
        for fmt in cfg.data.formats:
            if fmt == "edges":
                continue
            if fmt not in SEQ_FORMATS:
                raise ValueError(f"unknown format {fmt}")
            decoders[fmt] = Decoder(cfg.decoder, self.vocab_sizes[fmt], self.dtype)
        self.decoders = decoders
        if "edges" in cfg.data.formats:
            self.edges_head = GraphPredictor(
                cfg.decoder.hidden_size, coords=cfg.data.continuous_coords, dtype=self.dtype
            )
        if cfg.train.aux_heatmap_weight > 0:
            self.heatmap_head = AtomHeatmapHead(dtype=self.dtype)

    def encoder_dim(self) -> int:
        return self.cfg.encoder.num_features

    # -- encoder ----------------------------------------------------------
    def encode(self, images, deterministic: bool = True) -> jnp.ndarray:
        """images: (B, H, W, 3) -> memory bank (B, M, dec_hidden)."""
        feats, _ = self.encoder(images, deterministic)
        if self.cfg.decoder.enc_pos_emb:
            pos = self.enc_pos(jnp.arange(feats.shape[1]))
            feats = feats + pos[None].astype(feats.dtype)
        return self.enc_trans(feats)

    # -- training forward -------------------------------------------------
    def __call__(
        self,
        images: jnp.ndarray,
        refs: Dict[str, jnp.ndarray],
        deterministic: bool = False,
    ) -> Dict[str, Any]:
        """Teacher-forced forward for all configured formats.

        refs[fmt]: (B, T) label ids (SOS ... EOS, PAD-padded)
        refs["atom_indices"]: (B, K) positions of atom tokens (-1 padded)
        Returns {fmt: logits (B, T-1, V)} plus "edges" logits.
        """
        feats, hiddens = self.encoder(images, deterministic)
        if self.cfg.decoder.enc_pos_emb:
            pos = self.enc_pos(jnp.arange(feats.shape[1]))
            feats = feats + pos[None].astype(feats.dtype)
        memory = self.enc_trans(feats)
        out: Dict[str, Any] = {}
        if self.cfg.train.aux_heatmap_weight > 0:
            # stride-8 map = the stage whose downsampling factor is
            # patch_size * 2 (index 1 for patch 4); final map carries the
            # gradient through the whole encoder
            stride8 = hiddens[1] if len(hiddens) > 1 else hiddens[0]
            out["heatmap"] = self.heatmap_head(stride8, hiddens[-1])
        last_hidden = None
        prime_fmt = None
        for fmt in self.cfg.data.formats:
            if fmt == "edges":
                continue
            labels = refs[fmt]
            from molnextr_tpu.tokenization import PAD_ID

            pad_mask = labels == PAD_ID
            hidden = self.decoders[fmt](labels, memory, pad_mask, deterministic)
            out[fmt] = self.output_logits(fmt, hidden)[:, :-1]
            if fmt in ("atomtok_coords", "chartok_coords"):
                last_hidden = hidden
                prime_fmt = fmt
        if "edges" in self.cfg.data.formats and last_hidden is not None:
            indices = refs["atom_indices"]
            head_out = self.edges_head(last_hidden, jnp.maximum(indices, 0))
            out["edges"] = head_out["edges"]
            if "coords" in head_out:
                out["coords"] = head_out["coords"]
        return out

    def output_logits(self, fmt: str, hidden: jnp.ndarray) -> jnp.ndarray:
        return self.decoders[fmt].output(hidden)

    # -- inference helpers (wired by molnextr_tpu.decoding) ---------------
    def init_cache(self, fmt: str, memory):
        return self.decoders[fmt].init_cache(memory)

    def decode_step(self, fmt: str, token, pos, cache):
        hidden, cache = self.decoders[fmt].step(token, pos, cache)
        logits = self.output_logits(fmt, hidden[:, None])[:, 0]
        return logits, hidden, cache

    def predict_edges(self, hidden, indices):
        return self.edges_head(hidden, jnp.maximum(indices, 0))
