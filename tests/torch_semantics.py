"""Pure-torch implementations of the reference's documented module semantics.

These are NOT copies of the reference (which depends on timm/OpenNMT, absent
here); they are independent re-implementations of the behaviors SURVEY.md
flags as checkpoint-parity hot spots, written so their ``state_dict()`` keys
match the names the reference saves (`/root/reference/main.py:389-398`).
That lets the parity tests drive ``molnextr_tpu.convert`` with a REAL torch
state dict and diff activations between the two frameworks:

* relative-position-bias indexing (`MolNexTR/models/transformers.py:122-137`)
* shifted-window attention masking (`transformers.py:204-223`)
* ONMT pre-norm decoder layer + final LayerNorm (`models/decoder.py:224-279,
  470`)
* embedding scale ``emb * sqrt(dim)`` + sinusoidal PE with step offset
  (`models/embedding.py:42-61`)
* ``enc_trans_layer`` on encoder output (`components.py:183-216`)
* all-pairs concat edge MLP (`components.py:350-380`)
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn


# --------------------------------------------------------------------------
# Swin encoder (timm-0.4.12 semantics, reference `transformers.py:68-551`)
# --------------------------------------------------------------------------


def window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.view(B, H // ws, ws, W // ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, ws * ws, C)


def window_reverse(windows, ws, H, W):
    B = int(windows.shape[0] / (H * W / ws / ws))
    x = windows.view(B, H // ws, W // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(B, H, W, -1)


class WindowAttention(nn.Module):
    """`transformers.py:100-178`."""

    def __init__(self, dim, window_size, num_heads):
        super().__init__()
        self.dim = dim
        self.window_size = window_size
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * window_size - 1) ** 2, num_heads)
        )
        nn.init.trunc_normal_(self.relative_position_bias_table, std=0.02)
        coords = torch.stack(
            torch.meshgrid(
                torch.arange(window_size), torch.arange(window_size), indexing="ij"
            )
        )
        flat = torch.flatten(coords, 1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += window_size - 1
        rel[:, :, 1] += window_size - 1
        rel[:, :, 0] *= 2 * window_size - 1
        self.register_buffer("relative_position_index", rel.sum(-1))
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, mask=None):
        B_, N, C = x.shape
        h = self.num_heads
        qkv = (
            self.qkv(x)
            .reshape(B_, N, 3, h, C // h)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q * self.scale
        attn = q @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)
        ].view(N, N, -1).permute(2, 0, 1).contiguous()
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B_ // nW, nW, h, N, N) + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, h, N, N)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B_, N, C)
        return self.proj(x)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class SwinBlock(nn.Module):
    """`transformers.py:181-292` (no stochastic depth: eval-mode parity)."""

    def __init__(self, dim, resolution, num_heads, window_size, shift_size, mlp_ratio):
        super().__init__()
        self.dim = dim
        self.resolution = resolution
        self.window_size = window_size
        self.shift_size = shift_size
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn = WindowAttention(dim, window_size, num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))
        if shift_size > 0:
            H, W = resolution
            img_mask = torch.zeros((1, H, W, 1))
            cnt = 0
            for hs in (
                slice(0, -window_size),
                slice(-window_size, -shift_size),
                slice(-shift_size, None),
            ):
                for wss in (
                    slice(0, -window_size),
                    slice(-window_size, -shift_size),
                    slice(-shift_size, None),
                ):
                    img_mask[:, hs, wss, :] = cnt
                    cnt += 1
            mask_windows = window_partition(img_mask, window_size).view(
                -1, window_size * window_size
            )
            attn_mask = mask_windows.unsqueeze(1) - mask_windows.unsqueeze(2)
            attn_mask = attn_mask.masked_fill(attn_mask != 0, -100.0).masked_fill(
                attn_mask == 0, 0.0
            )
        else:
            attn_mask = None
        self.register_buffer("attn_mask", attn_mask)

    def forward(self, x):
        H, W = self.resolution
        B, L, C = x.shape
        shortcut = x
        x = self.norm1(x).view(B, H, W, C)
        if self.shift_size > 0:
            x = torch.roll(x, (-self.shift_size, -self.shift_size), dims=(1, 2))
        windows = window_partition(x, self.window_size)
        attn = self.attn(windows, self.attn_mask)
        x = window_reverse(attn, self.window_size, H, W)
        if self.shift_size > 0:
            x = torch.roll(x, (self.shift_size, self.shift_size), dims=(1, 2))
        x = shortcut + x.view(B, L, C)
        return x + self.mlp(self.norm2(x))


class PatchMerging(nn.Module):
    """`transformers.py:295-345`."""

    def __init__(self, dim, resolution):
        super().__init__()
        self.resolution = resolution
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(4 * dim, eps=1e-5)

    def forward(self, x):
        H, W = self.resolution
        B, L, C = x.shape
        x = x.view(B, H, W, C)
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = torch.cat([x0, x1, x2, x3], -1).view(B, -1, 4 * C)
        return self.reduction(self.norm(x))


class BasicLayer(nn.Module):
    def __init__(self, dim, resolution, depth, num_heads, window_size, mlp_ratio,
                 downsample):
        super().__init__()
        self.blocks = nn.ModuleList(
            [
                SwinBlock(
                    dim,
                    resolution,
                    num_heads,
                    window_size,
                    0 if i % 2 == 0 else window_size // 2,
                    mlp_ratio,
                )
                for i in range(depth)
            ]
        )
        self.downsample = (
            PatchMerging(dim, resolution) if downsample else None
        )

    def forward(self, x):
        for blk in self.blocks:
            x = blk(x)
        if self.downsample is not None:
            x = self.downsample(x)
        return x


class PatchEmbed(nn.Module):
    def __init__(self, patch_size, embed_dim):
        super().__init__()
        self.proj = nn.Conv2d(3, embed_dim, patch_size, stride=patch_size)
        self.norm = nn.LayerNorm(embed_dim, eps=1e-5)

    def forward(self, x):
        x = self.proj(x).flatten(2).transpose(1, 2)  # (B, L, C)
        return self.norm(x)


class SwinTransformer(nn.Module):
    """`transformers.py:422-515` forward_features path (returns final norm
    tokens)."""

    def __init__(self, img_size, patch_size, embed_dim, depths, num_heads,
                 window_size, mlp_ratio=4.0):
        super().__init__()
        self.patch_embed = PatchEmbed(patch_size, embed_dim)
        res = img_size // patch_size
        self.layers = nn.ModuleList()
        for s, depth in enumerate(depths):
            self.layers.append(
                BasicLayer(
                    int(embed_dim * 2 ** s),
                    (res // 2 ** s, res // 2 ** s),
                    depth,
                    num_heads[s],
                    window_size,
                    mlp_ratio,
                    downsample=s < len(depths) - 1,
                )
            )
        self.norm = nn.LayerNorm(int(embed_dim * 2 ** (len(depths) - 1)), eps=1e-5)

    def forward(self, x):
        x = self.patch_embed(x)
        for layer in self.layers:
            x = layer(x)
        return self.norm(x)  # (B, L, num_features)


class TorchEncoder(nn.Module):
    """Name-compatible wrapper: the reference saves the Swin under
    ``transformer.`` (`components.py:167-171`)."""

    def __init__(self, **kw):
        super().__init__()
        self.transformer = SwinTransformer(**kw)

    def forward(self, x):
        return self.transformer(x)


# --------------------------------------------------------------------------
# ONMT-style decoder (`models/decoder.py`, `models/embedding.py`)
# --------------------------------------------------------------------------


class MultiHeadedAttention(nn.Module):
    """ONMT MultiHeadedAttention math (scaled dot product, per-head split)."""

    def __init__(self, heads, dim):
        super().__init__()
        self.heads = heads
        self.dim_per_head = dim // heads
        self.linear_keys = nn.Linear(dim, dim)
        self.linear_values = nn.Linear(dim, dim)
        self.linear_query = nn.Linear(dim, dim)
        self.final_linear = nn.Linear(dim, dim)

    def forward(self, key, value, query, mask=None):
        b = key.size(0)
        h, d = self.heads, self.dim_per_head

        def shape(x):
            return x.view(b, -1, h, d).transpose(1, 2)

        q = shape(self.linear_query(query)) / math.sqrt(d)
        k = shape(self.linear_keys(key))
        v = shape(self.linear_values(value))
        scores = q @ k.transpose(2, 3)
        if mask is not None:
            scores = scores.masked_fill(mask, -1e9)
        attn = torch.softmax(scores, dim=-1)
        ctx = (attn @ v).transpose(1, 2).contiguous().view(b, -1, h * d)
        return self.final_linear(ctx)


class PositionwiseFeedForward(nn.Module):
    """ONMT pre-norm FFN with internal residual; GELU per the reference's
    ``pos_ffn_activation_fn='gelu'`` (`components.py:204`)."""

    def __init__(self, dim, d_ff):
        super().__init__()
        self.w_1 = nn.Linear(dim, d_ff)
        self.w_2 = nn.Linear(d_ff, dim)
        self.layer_norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        return self.w_2(torch.nn.functional.gelu(self.w_1(self.layer_norm(x)))) + x


class TransformerDecoderLayer(nn.Module):
    """Pre-norm decoder layer (`models/decoder.py:224-279`)."""

    def __init__(self, dim, heads, d_ff):
        super().__init__()
        self.layer_norm_1 = nn.LayerNorm(dim, eps=1e-6)
        self.self_attn = MultiHeadedAttention(heads, dim)
        self.layer_norm_2 = nn.LayerNorm(dim, eps=1e-6)
        self.context_attn = MultiHeadedAttention(heads, dim)
        self.feed_forward = PositionwiseFeedForward(dim, d_ff)

    def forward(self, x, memory, self_mask):
        xn = self.layer_norm_1(x)
        q = self.self_attn(xn, xn, xn, mask=self_mask) + x
        mid = self.context_attn(memory, memory, self.layer_norm_2(q))
        return self.feed_forward(mid + q)


class _InnerDecoder(nn.Module):
    """Holds ``transformer_layers`` + the final ``layer_norm``
    (`models/decoder.py:349-487`)."""

    def __init__(self, num_layers, dim, heads, d_ff):
        super().__init__()
        self.transformer_layers = nn.ModuleList(
            [TransformerDecoderLayer(dim, heads, d_ff) for _ in range(num_layers)]
        )
        self.layer_norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x, memory, self_mask):
        for layer in self.transformer_layers:
            x = layer(x, memory, self_mask)
        return self.layer_norm(x)


class _EmbLuts(nn.Module):
    def __init__(self, vocab, dim):
        super().__init__()
        self.emb_luts = nn.ModuleList([nn.Embedding(vocab, dim)])


class Embeddings(nn.Module):
    """ONMT Embeddings + PositionalEncoding (`models/embedding.py:15-255`):
    lut -> * sqrt(dim) -> + sinusoidal PE at offset ``step``."""

    def __init__(self, vocab, dim, max_len=5000):
        super().__init__()
        self.dim = dim
        self.make_embedding = _EmbLuts(vocab, dim)
        pe = torch.zeros(max_len, dim)
        position = torch.arange(0, max_len).unsqueeze(1).float()
        div = torch.exp(
            torch.arange(0, dim, 2).float() * -(math.log(10000.0) / dim)
        )
        pe[:, 0::2] = torch.sin(position * div)
        pe[:, 1::2] = torch.cos(position * div)
        self.register_buffer("pe", pe)

    def forward(self, tokens, step=None):
        emb = self.make_embedding.emb_luts[0](tokens) * math.sqrt(self.dim)
        start = step or 0
        return emb + self.pe[start : start + tokens.size(1)].unsqueeze(0)


class TransformerDecoderAR(nn.Module):
    """Reference `components.py:177-347` teacher-forced path with
    state-dict-compatible naming."""

    def __init__(self, encoder_dim, dim, heads, num_layers, vocab):
        super().__init__()
        self.enc_trans_layer = nn.Sequential(nn.Linear(encoder_dim, dim))
        self.decoder = _InnerDecoder(num_layers, dim, heads, dim * 4)
        self.embeddings = Embeddings(vocab, dim)
        self.output_layer = nn.Linear(dim, vocab)

    def forward(self, memory_raw, tokens, pad_mask=None):
        """memory_raw: (B, M, encoder_dim); tokens: (B, T) int64.

        Returns (logits (B, T, V), hidden (B, T, D))."""
        memory = self.enc_trans_layer(memory_raw)
        t = tokens.size(1)
        causal = torch.triu(torch.ones(t, t, dtype=torch.bool), 1)[None, None]
        mask = causal
        if pad_mask is not None:
            mask = causal | pad_mask[:, None, None, :]
        x = self.embeddings(tokens)
        hidden = self.decoder(x, memory, mask)
        return self.output_layer(hidden), hidden


class GraphPredictor(nn.Module):
    """Reference `components.py:350-380`: all-pairs concat -> GELU MLP."""

    def __init__(self, dim):
        super().__init__()
        self.mlp = nn.Sequential(
            nn.Linear(dim * 2, dim), nn.GELU(), nn.Linear(dim, 7)
        )

    def forward(self, hidden, indices):
        b, l, dim = hidden.size()
        batch_id = torch.arange(b).unsqueeze(1).expand_as(indices).reshape(-1)
        flat = indices.reshape(-1)
        hidden = hidden[batch_id, flat].view(b, -1, dim)
        b, k, dim = hidden.size()
        hh = torch.cat(
            [
                hidden.unsqueeze(2).expand(b, k, k, dim),
                hidden.unsqueeze(1).expand(b, k, k, dim),
            ],
            dim=3,
        )
        return self.mlp(hh).permute(0, 3, 1, 2)


class TorchDecoderBundle(nn.Module):
    """Module whose state_dict matches the reference decoder save
    (`main.py:389-398`): ``decoder.<fmt>.*`` + ``decoder.edges.*``."""

    def __init__(self, fmt, encoder_dim, dim, heads, num_layers, vocab):
        super().__init__()
        self.decoder = nn.ModuleDict(
            {
                fmt: TransformerDecoderAR(encoder_dim, dim, heads, num_layers, vocab),
                "edges": GraphPredictor(dim),
            }
        )
