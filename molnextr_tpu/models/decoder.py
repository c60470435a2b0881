"""Autoregressive transformer decoder (Flax), scan-over-layers.

Architecture matches the reference's ONMT-derived decoder
(`/root/reference/MolNexTR/models/decoder.py:162-487`): pre-norm layers of
[LN -> masked self-attn -> +res], [LN -> cross-attn over the encoder memory],
[pre-norm GELU FFN with its own residual], and a final LayerNorm
(`decoder.py:470`).  Word embeddings are scaled by sqrt(dim) and summed with
sinusoidal positions (`models/embedding.py:42-61`).

TPU-first structure: the layer stack is a single ``nn.scan`` over stacked
parameters ``(L, ...)`` — one compiled body instead of L copies, which cuts
HLO size, speeds compilation, and keeps the KV cache as two stacked arrays
``(L, B, H, max_len, head_dim)`` updated with ``dynamic_update_slice`` so
the whole decode loop compiles once with static shapes (the reference keeps
a python dict of per-layer caches, `decoder.py:431-487`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from molnextr_tpu.config import DecoderConfig


def sinusoidal_positions(max_len: int, dim: int) -> np.ndarray:
    """Classic transformer PE table (`embedding.py:26-40`)."""
    pe = np.zeros((max_len, dim), dtype=np.float32)
    position = np.arange(max_len)[:, None].astype(np.float32)
    div = np.exp(np.arange(0, dim, 2).astype(np.float32) * -(np.log(10000.0) / dim))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


class MHA(nn.Module):
    """Multi-head attention with optional KV-cache semantics."""

    num_heads: int
    hidden: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        h = self.hidden
        self.q_proj = nn.Dense(h, dtype=self.dtype, name="q")
        self.k_proj = nn.Dense(h, dtype=self.dtype, name="k")
        self.v_proj = nn.Dense(h, dtype=self.dtype, name="v")
        self.out = nn.Dense(h, dtype=self.dtype, name="out")
        self.attn_drop = nn.Dropout(rate=self.dropout)

    def _split(self, x):
        b, t, _ = x.shape
        hd = self.hidden // self.num_heads
        return x.reshape(b, t, self.num_heads, hd).transpose(0, 2, 1, 3)

    def _merge(self, x):
        b, h, t, hd = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, t, h * hd)

    def __call__(self, q_in, k_in, v_in, mask=None, deterministic=True,
                 causal_flash=False):
        """mask: bool array broadcastable to (B, 1, Tq, Tk); True = masked.

        ``causal_flash``: the mask is known to be causal(+trailing-PAD),
        so the TPU flash-attention kernel may be used — it never
        materializes the (B, H, T, T) score tensor, which at batch 256 x
        T 256 costs ~0.5GB per layer per pass in the XLA path (the
        dominant train-step time).  Trailing PAD keys are safe under
        causal-only masking: PAD only follows EOS, so real queries never
        see them, and PAD-query outputs are loss-ignored.
        """
        q = self._split(self.q_proj(q_in))
        k = self._split(self.k_proj(k_in))
        v = self._split(self.v_proj(v_in))
        if causal_flash and self._can_flash(q, deterministic):
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention,
            )

            hd = self.hidden // self.num_heads
            ctx = flash_attention(q, k, v, causal=True, sm_scale=hd ** -0.5)
            return self.out(self._merge(ctx))
        return self.attend(q, k, v, mask, deterministic)

    def _can_flash(self, q, deterministic) -> bool:
        if not deterministic and self.dropout > 0:
            return False  # the kernel has no attention-dropout path
        t = q.shape[-2]
        if t < 128 or t % 128 != 0:
            return False
        import os

        if os.environ.get("MOLNEXTR_NO_FLASH"):
            return False
        try:
            return jax.default_backend() == "tpu"
        except Exception:
            return False

    def project_kv(self, x):
        return self._split(self.k_proj(x)), self._split(self.v_proj(x))

    def project_q(self, x):
        return self._split(self.q_proj(x))

    def project_qkv(self, x):
        """q/k/v in ONE matmul over the concatenated (D, 3D) kernel.

        Decode-step projections are (B, 1, D) x (D, D) — latency-bound MXU
        dispatches where the fixed per-op cost dominates; one fused matmul
        amortizes it 3x.  The kernel/bias concats are loop-invariant, so
        XLA hoists them out of the decode ``while_loop``.  Bitwise-equal to
        the three separate Dense calls (same contraction, same dtype)."""
        pq = self.q_proj.variables["params"]
        pk = self.k_proj.variables["params"]
        pv = self.v_proj.variables["params"]
        w = jnp.concatenate(
            [pq["kernel"], pk["kernel"], pv["kernel"]], axis=1
        ).astype(self.dtype)
        b = jnp.concatenate([pq["bias"], pk["bias"], pv["bias"]]).astype(self.dtype)
        y = x.astype(self.dtype) @ w + b
        h = self.hidden
        return (
            self._split(y[..., :h]),
            self._split(y[..., h : 2 * h]),
            self._split(y[..., 2 * h :]),
        )

    def attend(self, q, k, v, mask=None, deterministic=True):
        hd = self.hidden // self.num_heads
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd).astype(q.dtype)
        if mask is not None:
            scores = jnp.where(mask, jnp.asarray(-1e9, scores.dtype), scores)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
        probs = self.attn_drop(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        return self.out(self._merge(ctx))


class FeedForward(nn.Module):
    """ONMT PositionwiseFeedForward: pre-norm + internal residual."""

    hidden: int
    ffn: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln")(x)
        y = nn.Dense(self.ffn, dtype=self.dtype, name="w1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dropout(rate=self.dropout, deterministic=deterministic)(y)
        y = nn.Dense(self.hidden, dtype=self.dtype, name="w2")(y)
        y = nn.Dropout(rate=self.dropout, deterministic=deterministic)(y)
        return y + x


class DecoderLayer(nn.Module):
    """One pre-norm decoder layer with scan-compatible method signatures:
    every method is ``(carry, scanned, broadcast) -> (carry, outputs)``."""

    cfg: DecoderConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.ln1 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        self.self_attn = MHA(c.attn_heads, c.hidden_size, c.attn_dropout, self.dtype)
        self.ln2 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        self.cross_attn = MHA(c.attn_heads, c.hidden_size, c.attn_dropout, self.dtype)
        self.ffn = FeedForward(
            c.hidden_size, c.hidden_size * c.ffn_mult, c.hidden_dropout, self.dtype
        )
        self.drop = nn.Dropout(rate=c.hidden_dropout)

    def forward(self, x, scanned, bcast):
        """Full-sequence teacher-forced layer.

        Dropout is active iff a ``dropout`` rng was provided to apply() —
        a trace-time scope check, so the layer stays remat-compatible (a
        python ``deterministic`` flag in the broadcast args would be staged
        into a tracer by nn.remat and break flax Dropout's bool branch).
        """
        memory = bcast["memory"]
        self_mask = bcast["self_mask"]
        det = not self.has_rng("dropout")
        xn = self.ln1(x)
        q = self.self_attn(
            xn, xn, xn, self_mask, det,
            causal_flash=self.cfg.use_flash_attention,
        )
        q = self.drop(q, deterministic=det) + x
        mid = self.cross_attn(self.ln2(q), memory, memory, None, det)
        out = self.ffn(self.drop(mid, deterministic=det) + q, det)
        return out, {}

    def project_memory(self, carry, scanned, bcast):
        """Precompute cross-attention K/V once per sequence (the cache's
        ``memory_keys/values``, reference `decoder.py:438-448`).

        Kept HEAD-FOLDED as the raw (B, M, H*hd) projection: the Dense
        output channel order is exactly (head, head_dim), so a later
        ``reshape(B, M, H, hd)`` view splits heads for free.  Folding makes
        the minor HBM axis H*hd (two full 128-lane tiles) instead of
        hd=32 — a (…, M, 32) cross cache tiles as (8,128) with 4x read
        amplification, measured at 2.2ms of the 3.1ms decode step."""
        mk = self.cross_attn.k_proj(bcast["memory"])
        mv = self.cross_attn.v_proj(bcast["memory"])
        return carry, {"mem_k": mk, "mem_v": mv}

    def cached_step(self, carry, scanned, bcast):
        """One-token forward against the stacked cache, scan-carry style.

        The FULL stacked caches ride in the scan *carry* and are updated in
        place with ``dynamic_update_slice`` at ``(layer, ...)`` — passing
        them through scan xs/ys would copy all ~800MB of cache every decode
        step (measured: 2x403MB HLO copies).  Attention reads go through
        the pallas layered prefix-attention kernel, which reads the valid
        chunks of layer ``l`` straight from the stacked HBM array; cross
        attention uses the same kernel over the (padded) memory cache.
        """
        from molnextr_tpu.ops.decode_attention import (
            cached_decode_attention_layered,
            cross_decode_attention_folded,
        )

        x, self_k, self_v = carry
        layer_idx = scanned["layer_idx"]
        pos = bcast["pos"]
        mem_k, mem_v = bcast["mem_k"], bcast["mem_v"]

        xn = self.ln1(x)
        q, k_new, v_new = self.self_attn.project_qkv(xn)
        self_k = jax.lax.dynamic_update_slice(
            self_k, k_new[None], (layer_idx, 0, 0, pos, 0)
        )
        self_v = jax.lax.dynamic_update_slice(
            self_v, v_new[None], (layer_idx, 0, 0, pos, 0)
        )
        ctx = cached_decode_attention_layered(
            q[:, :, 0], self_k, self_v, pos, layer_idx
        )
        attn_out = self.self_attn.out(self.self_attn._merge(ctx[:, :, None, :]))
        q_res = attn_out + x
        qn = self.ln2(q_res)
        qq = self.cross_attn.project_q(qn)
        cross_ctx = cross_decode_attention_folded(
            qq[:, :, 0], mem_k, mem_v, layer_idx, self.cfg.attn_heads
        )
        mid = self.cross_attn.out(self.cross_attn._merge(cross_ctx[:, :, None, :]))
        out = self.ffn(mid + q_res, True)
        return (out, self_k, self_v), {}

    def cached_step_q8(self, carry, scanned, bcast):
        """One-token forward against int8 caches (``DecoderConfig.kv_int8``).

        Identical math to :meth:`cached_step` up to 8-bit rounding of the
        cached K/V: new self K/V rows are quantized per token (max-abs over
        head_dim) before the ``dynamic_update_slice``; both attention reads
        fold the per-token scales back in exactly.  Halves the decode
        loop's HBM traffic, which bench showed to be the bottleneck
        (docs_bench_decode_r5.log)."""
        from molnextr_tpu.ops.decode_attention import (
            cached_decode_attention_layered_q8,
            cross_decode_attention_folded_q8,
            quantize_per_token,
        )

        x, self_k, self_ks, self_v, self_vs = carry
        layer_idx = scanned["layer_idx"]
        pos = bcast["pos"]

        xn = self.ln1(x)
        q, k_new, v_new = self.self_attn.project_qkv(xn)
        k_q, k_s = quantize_per_token(k_new)  # (B,H,1,hd) int8, (B,H,1,1) f32
        v_q, v_s = quantize_per_token(v_new)
        self_k = jax.lax.dynamic_update_slice(
            self_k, k_q[None], (layer_idx, 0, 0, pos, 0)
        )
        self_ks = jax.lax.dynamic_update_slice(
            self_ks, k_s[None], (layer_idx, 0, 0, pos, 0)
        )
        self_v = jax.lax.dynamic_update_slice(
            self_v, v_q[None], (layer_idx, 0, 0, pos, 0)
        )
        self_vs = jax.lax.dynamic_update_slice(
            self_vs, v_s[None], (layer_idx, 0, 0, pos, 0)
        )
        ctx = cached_decode_attention_layered_q8(
            q[:, :, 0], self_k, self_ks, self_v, self_vs, pos, layer_idx
        )
        attn_out = self.self_attn.out(self.self_attn._merge(ctx[:, :, None, :]))
        q_res = attn_out + x
        qn = self.ln2(q_res)
        qq = self.cross_attn.project_q(qn)
        cross_ctx = cross_decode_attention_folded_q8(
            qq[:, :, 0],
            bcast["mem_k"], bcast["mem_k_scale"],
            bcast["mem_v"], bcast["mem_v_scale"],
            layer_idx, self.cfg.attn_heads,
        )
        mid = self.cross_attn.out(self.cross_attn._merge(cross_ctx[:, :, None, :]))
        out = self.ffn(mid + q_res, True)
        return (out, self_k, self_ks, self_v, self_vs), {}


class Decoder(nn.Module):
    """Full decoder stack with embeddings and final LayerNorm."""

    cfg: DecoderConfig
    vocab_size: int
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.embed = nn.Embed(self.vocab_size, c.hidden_size, dtype=self.dtype,
                              embedding_init=nn.initializers.normal(0.02))
        self.pe = jnp.asarray(sinusoidal_positions(c.max_len + 8, c.hidden_size))
        layer_cls = DecoderLayer
        if c.use_remat:
            # rematerialize the teacher-forced layer in the backward pass:
            # the (B, H, T, T) attention intermediates at T=480 dominate
            # training HBM otherwise (the reference equivalently relies on
            # --use_checkpoint, `transformers.py:376-377`)
            layer_cls = nn.remat(DecoderLayer, methods=["forward"])
        scan = nn.scan(
            layer_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0, nn.broadcast),
            out_axes=0,
            length=c.num_layers,
            methods=["forward", "project_memory", "cached_step", "cached_step_q8"],
        )
        self.layers = scan(c, self.dtype, name="layers")
        self.final_ln = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        self.emb_drop = nn.Dropout(rate=c.hidden_dropout)
        # vocabulary projection (`components.py:226`)
        self.output = nn.Dense(self.vocab_size, dtype=self.dtype)

    def embed_tokens(self, tokens, start_pos):
        """tokens: (B, T) int32; positions start at start_pos."""
        d = self.cfg.hidden_size
        emb = self.embed(tokens) * jnp.sqrt(d).astype(self.dtype)
        t = tokens.shape[1]
        pe = jax.lax.dynamic_slice_in_dim(self.pe, start_pos, t, axis=0)
        return emb + pe.astype(self.dtype)[None]

    def __call__(self, tokens, memory, pad_mask=None, deterministic=True):
        """Teacher-forced full-sequence forward.

        tokens: (B, T) target ids (starting with SOS).
        memory: (B, M, D) transformed encoder output.
        pad_mask: (B, T) bool, True at padding positions.
        Returns final hidden states (B, T, D) after the last LayerNorm.
        """
        b, t = tokens.shape
        x = self.emb_drop(self.embed_tokens(tokens, 0), deterministic=deterministic)
        causal = jnp.triu(jnp.ones((t, t), dtype=bool), k=1)[None, None]
        self_mask = causal
        if pad_mask is not None:
            self_mask = causal | pad_mask[:, None, None, :]
        x, _ = self.layers.forward(
            x,
            {},
            {"memory": memory, "self_mask": self_mask},
        )
        return self.final_ln(x)

    def init_cache(self, memory) -> Dict[str, jnp.ndarray]:
        """Build the static-shape decode cache.

        Returns dict of stacked per-layer arrays:
          self_k/self_v: (L, B, H, max_len, hd)
          mem_k/mem_v:   (L, B, M, H*hd)  (head-folded, unpadded — see
                         ``project_memory``; M=144 is already a sublane
                         multiple and the folded minor axis packs HBM
                         tiles exactly)
        """
        c = self.cfg
        b = memory.shape[0]
        h = c.attn_heads
        hd = c.hidden_size // h
        _, proj = self.layers.project_memory(
            jnp.zeros((), jnp.int32), {}, {"memory": memory}
        )
        # self-cache length rounded up to a 128 multiple: aligns TPU tiles
        # and the pallas decode-attention chunking
        t_cache = ((c.max_len + 127) // 128) * 128
        if c.kv_int8:
            from molnextr_tpu.ops.decode_attention import quantize_per_token

            mem_k, mem_k_scale = quantize_per_token(proj["mem_k"])
            mem_v, mem_v_scale = quantize_per_token(proj["mem_v"])
            zeros = jnp.zeros((c.num_layers, b, h, t_cache, hd), jnp.int8)
            szeros = jnp.zeros((c.num_layers, b, h, t_cache, 1), jnp.float32)
            return {
                "self_k": zeros,
                "self_k_scale": szeros,
                "self_v": jnp.zeros_like(zeros),
                "self_v_scale": jnp.zeros_like(szeros),
                "mem_k": mem_k,
                "mem_k_scale": mem_k_scale,
                "mem_v": mem_v,
                "mem_v_scale": mem_v_scale,
            }
        zeros = jnp.zeros((c.num_layers, b, h, t_cache, hd), dtype=self.dtype)
        return {
            "self_k": zeros,
            "self_v": jnp.zeros_like(zeros),
            "mem_k": proj["mem_k"],
            "mem_v": proj["mem_v"],
        }

    def step(self, token, pos, cache, deterministic=True):
        """Single decode step.

        token: (B,) int32 current input token; pos: scalar int position.
        Returns (hidden (B, D), new_cache).
        """
        c = self.cfg
        x = self.embed_tokens(token[:, None], pos)
        if c.kv_int8:
            carry = (
                x,
                cache["self_k"], cache["self_k_scale"],
                cache["self_v"], cache["self_v_scale"],
            )
            (x, self_k, self_ks, self_v, self_vs), _ = self.layers.cached_step_q8(
                carry,
                {"layer_idx": jnp.arange(c.num_layers, dtype=jnp.int32)},
                {
                    "pos": pos,
                    "mem_k": cache["mem_k"],
                    "mem_k_scale": cache["mem_k_scale"],
                    "mem_v": cache["mem_v"],
                    "mem_v_scale": cache["mem_v_scale"],
                },
            )
            cache = {
                **cache,
                "self_k": self_k,
                "self_k_scale": self_ks,
                "self_v": self_v,
                "self_v_scale": self_vs,
            }
            return self.final_ln(x)[:, 0], cache
        carry = (x, cache["self_k"], cache["self_v"])
        (x, self_k, self_v), _ = self.layers.cached_step(
            carry,
            {"layer_idx": jnp.arange(c.num_layers, dtype=jnp.int32)},
            {
                "pos": pos,
                "mem_k": cache["mem_k"],
                "mem_v": cache["mem_v"],
            },
        )
        cache = {
            "self_k": self_k,
            "self_v": self_v,
            "mem_k": cache["mem_k"],
            "mem_v": cache["mem_v"],
        }
        return self.final_ln(x)[:, 0], cache
