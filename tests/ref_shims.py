"""Minimal timm/onmt shims so the REFERENCE's own model files execute here.

VERDICT r2 item 8: the strongest parity evidence obtainable offline is to run
`/root/reference/MolNexTR/models/{transformers,decoder,embedding}.py` —
the reference's actual source — and diff activations against the flax
models.  Those files import timm (`transformers.py:12-16`) and OpenNMT
(`decoder.py:9-13`, `embedding.py:8`), neither of which exists in this
environment, so this module installs small faithful stand-ins for exactly
the symbols the reference touches, then loads the reference files by path.

The shims are independent implementations of the public timm/ONMT APIs
(Mlp, DropPath, MultiHeadedAttention, PositionwiseFeedForward, Elementwise)
written from their documented semantics — NOT copies.  Submodule names match
the real libraries (fc1/fc2, linear_query/linear_keys/linear_values/
final_linear, w_1/w_2/layer_norm, make_embedding.emb_luts) because the
reference's state_dict keys — and therefore `molnextr_tpu.convert` — depend
on them.
"""

from __future__ import annotations

import importlib.util
import math
import sys
import types

import torch
import torch.nn as nn

REFERENCE_MODELS = "/root/reference/MolNexTR/models"


# ---------------------------------------------------------------- timm shims

def to_2tuple(x):
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    return nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)


class Mlp(nn.Module):
    """timm.models.layers.Mlp: fc1 -> act -> drop -> fc2 -> drop."""

    def __init__(self, in_features, hidden_features=None, out_features=None,
                 act_layer=nn.GELU, drop=0.0):
        super().__init__()
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        self.fc1 = nn.Linear(in_features, hidden_features)
        self.act = act_layer()
        self.fc2 = nn.Linear(hidden_features, out_features)
        self.drop = nn.Dropout(drop)

    def forward(self, x):
        return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))


class DropPath(nn.Module):
    """Stochastic depth per sample (identity in eval mode)."""

    def __init__(self, drop_prob=0.0):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1.0 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = x.new_empty(shape).bernoulli_(keep)
        return x * mask / keep


def build_model_with_cfg(model_cls, variant, pretrained, default_cfg=None,
                         pretrained_filter_fn=None, **kwargs):
    if pretrained:
        raise RuntimeError("shim cannot download pretrained weights")
    model = model_cls(**kwargs)
    model.default_cfg = default_cfg
    return model


def overlay_external_default_cfg(default_cfg, kwargs):
    kwargs.pop("external_default_cfg", None)


def register_model(fn):
    return fn


def checkpoint_filter_fn(state_dict, model):
    return state_dict


def _init_vit_weights(module, name="", head_bias=0.0, jax_impl=False):
    # torch default inits are fine for activation parity (weights are
    # copied out via state_dict either way)
    return None


# ---------------------------------------------------------------- onmt shims

class DecoderBase(nn.Module):
    def __init__(self, attentional=True):
        super().__init__()
        self.attentional = attentional


def sequence_mask(lengths, max_len=None):
    max_len = max_len or int(lengths.max())
    steps = torch.arange(max_len, device=lengths.device)
    return steps.unsqueeze(0) < lengths.unsqueeze(1)


class MultiHeadedAttention(nn.Module):
    """ONMT multi-headed attention (batch-first), incl. the self/context
    layer_cache protocol `decoder.py` drives stepwise."""

    def __init__(self, head_count, model_dim, dropout=0.1,
                 max_relative_positions=0):
        super().__init__()
        assert model_dim % head_count == 0
        assert max_relative_positions == 0, "shim: rel-pos not needed"
        self.head_count = head_count
        self.dim_per_head = model_dim // head_count
        self.linear_keys = nn.Linear(model_dim, model_dim)
        self.linear_values = nn.Linear(model_dim, model_dim)
        self.linear_query = nn.Linear(model_dim, model_dim)
        self.final_linear = nn.Linear(model_dim, model_dim)
        self.dropout = nn.Dropout(dropout)

    def _shape(self, x):
        b, t, _ = x.shape
        return x.view(b, t, self.head_count, self.dim_per_head).transpose(1, 2)

    def forward(self, key, value, query, mask=None, layer_cache=None,
                attn_type=None):
        if layer_cache is not None and attn_type == "self":
            k = self._shape(self.linear_keys(query))
            v = self._shape(self.linear_values(query))
            if layer_cache["self_keys"] is not None:
                k = torch.cat((layer_cache["self_keys"], k), dim=2)
            if layer_cache["self_values"] is not None:
                v = torch.cat((layer_cache["self_values"], v), dim=2)
            layer_cache["self_keys"] = k
            layer_cache["self_values"] = v
        elif layer_cache is not None and attn_type == "context":
            if layer_cache["memory_keys"] is None:
                layer_cache["memory_keys"] = self._shape(self.linear_keys(key))
                layer_cache["memory_values"] = self._shape(self.linear_values(value))
            k = layer_cache["memory_keys"]
            v = layer_cache["memory_values"]
        else:
            k = self._shape(self.linear_keys(key))
            v = self._shape(self.linear_values(value))
        q = self._shape(self.linear_query(query)) / math.sqrt(self.dim_per_head)

        scores = torch.matmul(q, k.transpose(2, 3))
        if mask is not None:
            scores = scores.masked_fill(mask.unsqueeze(1), -1e18)
        attn = torch.softmax(scores.float(), dim=-1).to(scores.dtype)
        context = torch.matmul(self.dropout(attn), v)
        b, _, t, _ = context.shape
        context = context.transpose(1, 2).contiguous().view(
            b, t, self.head_count * self.dim_per_head
        )
        return self.final_linear(context), attn

    def update_dropout(self, dropout):
        self.dropout.p = dropout


class AverageAttention(nn.Module):
    """Placeholder: the reference only instantiates scaled-dot attention."""

    def __init__(self, *a, **kw):
        super().__init__()
        raise NotImplementedError("AverageAttention is never used by the reference")


class ActivationFunction:
    relu = "relu"
    gelu = "gelu"


_ACTIVATIONS = {"relu": torch.relu, "gelu": nn.functional.gelu}


class PositionwiseFeedForward(nn.Module):
    """ONMT pre-norm FFN: x + drop(w_2(drop(act(w_1(LN(x))))))."""

    def __init__(self, d_model, d_ff, dropout=0.1,
                 activation_fn=ActivationFunction.relu):
        super().__init__()
        self.w_1 = nn.Linear(d_model, d_ff)
        self.w_2 = nn.Linear(d_ff, d_model)
        self.layer_norm = nn.LayerNorm(d_model, eps=1e-6)
        self.dropout_1 = nn.Dropout(dropout)
        self.dropout_2 = nn.Dropout(dropout)
        self.activation = _ACTIVATIONS[activation_fn]

    def forward(self, x):
        inter = self.dropout_1(self.activation(self.w_1(self.layer_norm(x))))
        return self.dropout_2(self.w_2(inter)) + x

    def update_dropout(self, dropout):
        self.dropout_1.p = dropout
        self.dropout_2.p = dropout


class Elementwise(nn.ModuleList):
    """ONMT util: apply the i-th module to the i-th feature slice."""

    def __init__(self, merge=None, *args):
        assert merge in (None, "first", "concat", "sum", "mlp")
        self.merge = merge
        super().__init__(*args)

    def forward(self, inputs):
        feats = [feat.squeeze(-1) for feat in inputs.split(1, dim=-1)]
        outputs = [f(x) for f, x in zip(self, feats)]
        if self.merge == "concat" or self.merge == "mlp":
            return torch.cat(outputs, -1)
        if self.merge == "sum":
            return sum(outputs)
        return outputs[0] if self.merge == "first" else outputs


# ------------------------------------------------------------ module install

def _module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_shims():
    """Register timm/onmt stand-ins in sys.modules (idempotent)."""
    if "timm" in sys.modules and hasattr(sys.modules["timm"], "_molnextr_shim"):
        return
    timm = _module("timm", _molnextr_shim=True)
    timm.data = _module(
        "timm.data",
        IMAGENET_DEFAULT_MEAN=(0.485, 0.456, 0.406),
        IMAGENET_DEFAULT_STD=(0.229, 0.224, 0.225),
    )
    timm.models = _module("timm.models")
    timm.models.helpers = _module(
        "timm.models.helpers",
        build_model_with_cfg=build_model_with_cfg,
        overlay_external_default_cfg=overlay_external_default_cfg,
    )
    timm.models.layers = _module(
        "timm.models.layers",
        Mlp=Mlp, DropPath=DropPath, to_2tuple=to_2tuple,
        trunc_normal_=trunc_normal_,
    )
    timm.models.registry = _module(
        "timm.models.registry", register_model=register_model
    )
    timm.models.vision_transformer = _module(
        "timm.models.vision_transformer",
        checkpoint_filter_fn=checkpoint_filter_fn,
        _init_vit_weights=_init_vit_weights,
    )

    onmt = _module("onmt", _molnextr_shim=True)
    onmt.decoders = _module("onmt.decoders")
    onmt.decoders.decoder = _module(
        "onmt.decoders.decoder", DecoderBase=DecoderBase
    )
    onmt.modules = _module(
        "onmt.modules",
        MultiHeadedAttention=MultiHeadedAttention,
        AverageAttention=AverageAttention,
    )
    onmt.modules.position_ffn = _module(
        "onmt.modules.position_ffn",
        PositionwiseFeedForward=PositionwiseFeedForward,
        ActivationFunction=ActivationFunction,
    )
    onmt.modules.util_class = _module(
        "onmt.modules.util_class", Elementwise=Elementwise
    )
    onmt.utils = _module("onmt.utils")
    onmt.utils.misc = _module("onmt.utils.misc", sequence_mask=sequence_mask)


def load_reference_module(stem: str):
    """Import a reference models/ file by path (shims must be installed)."""
    install_shims()
    name = f"_ref_models_{stem}"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, f"{REFERENCE_MODELS}/{stem}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
