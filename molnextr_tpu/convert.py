"""PyTorch reference checkpoint -> JAX parameter converter.

Maps the reference's state dict (saved as ``{'encoder': sd, 'decoder': sd}``
by `/root/reference/main.py:389-398`, with timm-Swin names inside the
encoder — `MolNexTR/models/transformers.py` — and ONMT decoder names —
`MolNexTR/models/decoder.py`) onto this framework's flax parameter tree:

* torch Linear ``(out, in)`` -> flax Dense kernel ``(in, out)``,
* torch Conv2d ``(O, I, kh, kw)`` -> flax Conv kernel ``(kh, kw, I, O)``,
* per-layer decoder tensors stack into the scan-over-layers leading axis,
* LayerNorm weight/bias -> scale/bias.

Works from a ``torch.load``-style dict of numpy arrays or torch tensors; no
torch import is required unless tensors need ``.numpy()``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from molnextr_tpu.config import Config


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    try:
        return x.detach().cpu().numpy()  # torch tensor
    except AttributeError:
        return np.asarray(x)


def _strip_ddp(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Remove 'module.' prefixes (`model.py:17-28`)."""
    return {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}


def _linear(sd, name) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def _layernorm(sd, name) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}


def convert_encoder(sd: Dict[str, Any], cfg: Config) -> Dict[str, Any]:
    """timm-Swin state dict (prefixed ``transformer.``) -> SwinEncoder tree."""
    sd = _strip_ddp(sd)
    p = "transformer."
    out: Dict[str, Any] = {}
    conv_w = _np(sd[p + "patch_embed.proj.weight"])  # (O, I, kh, kw)
    out["patch_embed"] = {
        "kernel": conv_w.transpose(2, 3, 1, 0),
        "bias": _np(sd[p + "patch_embed.proj.bias"]),
    }
    if p + "patch_embed.norm.weight" in sd:
        out["patch_norm"] = _layernorm(sd, p + "patch_embed.norm")
    for s, depth in enumerate(cfg.encoder.depths):
        for j in range(depth):
            bp = f"{p}layers.{s}.blocks.{j}."
            out[f"stage{s}_block{j}"] = {
                "norm1": _layernorm(sd, bp + "norm1"),
                "norm2": _layernorm(sd, bp + "norm2"),
                "attn": {
                    "qkv": _linear(sd, bp + "attn.qkv"),
                    "proj": _linear(sd, bp + "attn.proj"),
                    "rel_bias": _np(sd[bp + "attn.relative_position_bias_table"]),
                },
                "fc1": _linear(sd, bp + "mlp.fc1"),
                "fc2": _linear(sd, bp + "mlp.fc2"),
            }
        dp = f"{p}layers.{s}.downsample."
        if dp + "reduction.weight" in sd:
            out[f"merge{s}"] = {
                "norm": _layernorm(sd, dp + "norm"),
                "reduction": {"kernel": _np(sd[dp + "reduction.weight"]).T},
            }
    out["norm"] = _layernorm(sd, p + "norm")
    return out


def _stack_layers(per_layer: List[Dict[str, Any]]) -> Dict[str, Any]:
    """List of per-layer trees -> one tree with a stacked leading axis."""
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *per_layer)


def convert_decoder_format(
    sd: Dict[str, Any], cfg: Config, fmt: str
) -> Dict[str, Any]:
    """One TransformerDecoderAR (`components.py:219-347`) -> Decoder tree."""
    sd = _strip_ddp(sd)
    p = f"decoder.{fmt}."
    layers: List[Dict[str, Any]] = []
    for i in range(cfg.decoder.num_layers):
        lp = f"{p}decoder.transformer_layers.{i}."
        layers.append(
            {
                "ln1": _layernorm(sd, lp + "layer_norm_1"),
                "ln2": _layernorm(sd, lp + "layer_norm_2"),
                "self_attn": {
                    "q": _linear(sd, lp + "self_attn.linear_query"),
                    "k": _linear(sd, lp + "self_attn.linear_keys"),
                    "v": _linear(sd, lp + "self_attn.linear_values"),
                    "out": _linear(sd, lp + "self_attn.final_linear"),
                },
                "cross_attn": {
                    "q": _linear(sd, lp + "context_attn.linear_query"),
                    "k": _linear(sd, lp + "context_attn.linear_keys"),
                    "v": _linear(sd, lp + "context_attn.linear_values"),
                    "out": _linear(sd, lp + "context_attn.final_linear"),
                },
                "ffn": {
                    "ln": _layernorm(sd, lp + "feed_forward.layer_norm"),
                    "w1": _linear(sd, lp + "feed_forward.w_1"),
                    "w2": _linear(sd, lp + "feed_forward.w_2"),
                },
            }
        )
    return {
        "embed": {
            "embedding": _np(sd[p + "embeddings.make_embedding.emb_luts.0.weight"])
        },
        "layers": _stack_layers(layers),
        "final_ln": _layernorm(sd, p + "decoder.layer_norm"),
        "output": _linear(sd, p + "output_layer"),
    }


def convert_checkpoint(
    torch_ckpt: Dict[str, Any], cfg: Config
) -> Dict[str, Any]:
    """Full reference checkpoint -> flax variables {'params': ...}.

    ``torch_ckpt`` is the dict torch.save wrote: keys 'encoder'/'decoder'
    hold state dicts (`main.py:389-398`).
    """
    enc_sd = _strip_ddp(torch_ckpt["encoder"])
    dec_sd = _strip_ddp(torch_ckpt["decoder"])
    params: Dict[str, Any] = {"encoder": convert_encoder(enc_sd, cfg)}
    # enc_trans lives inside each reference decoder (`components.py:183-187`);
    # take it from the primary sequence format
    seq_fmts = [f for f in cfg.data.formats if f != "edges"]
    primary = seq_fmts[0]
    params["enc_trans"] = _linear(dec_sd, f"decoder.{primary}.enc_trans_layer.0")
    for fmt in seq_fmts:
        params[f"decoders_{fmt}"] = convert_decoder_format(dec_sd, cfg, fmt)
    if "edges" in cfg.data.formats:
        # the reference's concat-input Linear (D, 2D) factors into row/col
        # halves (heads.py GraphPredictor): kernel rows [0:D] act on atom i,
        # rows [D:2D] on atom j
        mlp1 = _linear(dec_sd, "decoder.edges.mlp.0")
        d_in = mlp1["kernel"].shape[0] // 2
        head = {
            "mlp1_row": {"kernel": mlp1["kernel"][:d_in], "bias": mlp1["bias"]},
            "mlp1_col": {"kernel": mlp1["kernel"][d_in:]},
            "mlp2": _linear(dec_sd, "decoder.edges.mlp.2"),
        }
        if "decoder.edges.coords_mlp.0.weight" in dec_sd:
            head["coords1"] = _linear(dec_sd, "decoder.edges.coords_mlp.0")
            head["coords2"] = _linear(dec_sd, "decoder.edges.coords_mlp.2")
        params["edges_head"] = head
    if cfg.train.aux_heatmap_weight > 0:
        # the reference has no auxiliary heatmap head — initialize it fresh
        # so the converted tree is a drop-in for model.init under the same
        # config (it is a training-only head; inference never reads it)
        import jax
        import jax.numpy as jnp

        from molnextr_tpu.models.heads import AtomHeatmapHead

        e = cfg.encoder
        if e.name.startswith("swin"):
            dims = [e.embed_dim * (2 ** i) for i in range(len(e.depths))]
        else:
            dims = list(e.convnext_dims)
        fine = dims[1] if len(dims) > 1 else dims[0]
        coarse = dims[-1]
        v = AtomHeatmapHead().init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8, 8, fine), jnp.float32),
            jnp.zeros((1, 4, 4, coarse), jnp.float32),
        )
        params["heatmap_head"] = v["params"]
    return {"params": params}


def load_torch_checkpoint(path: str, cfg: Optional[Config] = None):
    """Load a reference ``.pth`` and convert it — no torch required.

    Reads the zip serialization directly via
    :mod:`molnextr_tpu.torch_reader` (falling back to ``torch.load`` only
    for legacy non-zip files when torch happens to be installed).  Restores
    args the reference persists (formats/input_size/coord_bins/sep_xy,
    `main.py:397`) into the config like `model.py:50-81` does.
    """
    import zipfile

    if zipfile.is_zipfile(path):
        from molnextr_tpu.torch_reader import load_pth, namespace_to_dict

        ckpt = load_pth(path)
        if "args" in ckpt:
            ckpt["args"] = namespace_to_dict(ckpt["args"])
    else:  # pre-1.6 legacy serialization: torch is the only decoder
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    cfg = cfg or Config()
    args = ckpt.get("args", {})
    if isinstance(args, dict):
        if "formats" in args:
            f = args["formats"]
            cfg.data.formats = tuple(f.split(",") if isinstance(f, str) else f)
        if "input_size" in args:
            cfg.data.input_size = int(args["input_size"])
        if "coord_bins" in args:
            cfg.data.coord_bins = int(args["coord_bins"])
        if "sep_xy" in args:
            cfg.data.sep_xy = bool(args["sep_xy"])
    return cfg, convert_checkpoint(ckpt, cfg)
