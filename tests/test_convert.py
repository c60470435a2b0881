"""PyTorch->JAX converter tests against a synthetic reference state dict."""

import jax
import numpy as np
import pytest

from molnextr_tpu.config import tiny_test_config
from molnextr_tpu.convert import convert_checkpoint
from molnextr_tpu.models.model import MolNexTRModel
from molnextr_tpu.tokenization import get_tokenizer


def synthetic_reference_ckpt(cfg, vocab_size):
    """Random tensors under the exact names the reference would save
    (`main.py:389-398`; timm swin + ONMT decoder naming)."""
    rng = np.random.RandomState(0)

    def t(*shape):
        return rng.randn(*shape).astype(np.float32)

    enc = {}
    ed = cfg.encoder.embed_dim
    ps = cfg.encoder.patch_size
    enc["transformer.patch_embed.proj.weight"] = t(ed, 3, ps, ps)
    enc["transformer.patch_embed.proj.bias"] = t(ed)
    enc["transformer.patch_embed.norm.weight"] = t(ed)
    enc["transformer.patch_embed.norm.bias"] = t(ed)
    w = cfg.encoder.window_size
    for s, depth in enumerate(cfg.encoder.depths):
        dim = ed * 2 ** s
        h = cfg.encoder.num_heads[s]
        for j in range(depth):
            bp = f"transformer.layers.{s}.blocks.{j}."
            for ln in ("norm1", "norm2"):
                enc[bp + ln + ".weight"] = t(dim)
                enc[bp + ln + ".bias"] = t(dim)
            enc[bp + "attn.qkv.weight"] = t(3 * dim, dim)
            enc[bp + "attn.qkv.bias"] = t(3 * dim)
            enc[bp + "attn.proj.weight"] = t(dim, dim)
            enc[bp + "attn.proj.bias"] = t(dim)
            enc[bp + "attn.relative_position_bias_table"] = t((2 * w - 1) ** 2, h)
            enc[bp + "mlp.fc1.weight"] = t(4 * dim, dim)
            enc[bp + "mlp.fc1.bias"] = t(4 * dim)
            enc[bp + "mlp.fc2.weight"] = t(dim, 4 * dim)
            enc[bp + "mlp.fc2.bias"] = t(dim)
        if s < len(cfg.encoder.depths) - 1:
            dp = f"transformer.layers.{s}.downsample."
            enc[dp + "norm.weight"] = t(4 * dim)
            enc[dp + "norm.bias"] = t(4 * dim)
            enc[dp + "reduction.weight"] = t(2 * dim, 4 * dim)
    nf = cfg.encoder.num_features
    enc["transformer.norm.weight"] = t(nf)
    enc["transformer.norm.bias"] = t(nf)

    dec = {}
    D = cfg.decoder.hidden_size
    fmt = "chartok_coords"
    dec[f"decoder.{fmt}.enc_trans_layer.0.weight"] = t(D, nf)
    dec[f"decoder.{fmt}.enc_trans_layer.0.bias"] = t(D)
    dec[f"decoder.{fmt}.output_layer.weight"] = t(vocab_size, D)
    dec[f"decoder.{fmt}.output_layer.bias"] = t(vocab_size)
    dec[f"decoder.{fmt}.embeddings.make_embedding.emb_luts.0.weight"] = t(vocab_size, D)
    for i in range(cfg.decoder.num_layers):
        lp = f"decoder.{fmt}.decoder.transformer_layers.{i}."
        for ln in ("layer_norm_1", "layer_norm_2", "feed_forward.layer_norm"):
            dec[lp + ln + ".weight"] = t(D)
            dec[lp + ln + ".bias"] = t(D)
        for attn in ("self_attn", "context_attn"):
            for lin in ("linear_query", "linear_keys", "linear_values", "final_linear"):
                dec[f"{lp}{attn}.{lin}.weight"] = t(D, D)
                dec[f"{lp}{attn}.{lin}.bias"] = t(D)
        dec[lp + "feed_forward.w_1.weight"] = t(4 * D, D)
        dec[lp + "feed_forward.w_1.bias"] = t(4 * D)
        dec[lp + "feed_forward.w_2.weight"] = t(D, 4 * D)
        dec[lp + "feed_forward.w_2.bias"] = t(D)
    dec["decoder.{}.decoder.layer_norm.weight".format(fmt)] = t(D)
    dec["decoder.{}.decoder.layer_norm.bias".format(fmt)] = t(D)
    dec["decoder.edges.mlp.0.weight"] = t(D, 2 * D)
    dec["decoder.edges.mlp.0.bias"] = t(D)
    dec["decoder.edges.mlp.2.weight"] = t(7, D)
    dec["decoder.edges.mlp.2.bias"] = t(7)
    return {"encoder": enc, "decoder": dec}


class TestConverter:
    def test_tree_matches_model_init(self):
        cfg = tiny_test_config()
        tokenizers = get_tokenizer(cfg.data)
        vocab = len(tokenizers["chartok_coords"])
        model = MolNexTRModel(cfg, {"chartok_coords": vocab})
        refs = {
            "chartok_coords": np.ones((1, 8), np.int32),
            "atom_indices": np.zeros((1, cfg.data.max_atoms), np.int32),
        }
        init = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
            np.zeros((1, cfg.data.input_size, cfg.data.input_size, 3), np.float32),
            refs,
            deterministic=True,
        )
        ckpt = synthetic_reference_ckpt(cfg, vocab)
        converted = convert_checkpoint(ckpt, cfg)

        init_paths = {
            tuple(str(k.key) for k in p): leaf.shape
            for p, leaf in jax.tree_util.tree_flatten_with_path(init)[0]
        }
        conv_paths = {
            tuple(str(k.key) for k in p): np.asarray(leaf).shape
            for p, leaf in jax.tree_util.tree_flatten_with_path(converted)[0]
        }
        assert init_paths == conv_paths

    def test_converted_params_run(self):
        cfg = tiny_test_config()
        tokenizers = get_tokenizer(cfg.data)
        vocab = len(tokenizers["chartok_coords"])
        model = MolNexTRModel(cfg, {"chartok_coords": vocab})
        ckpt = synthetic_reference_ckpt(cfg, vocab)
        converted = jax.tree_util.tree_map(
            np.asarray, convert_checkpoint(ckpt, cfg)
        )
        refs = {
            "chartok_coords": np.ones((2, 8), np.int32),
            "atom_indices": np.zeros((2, cfg.data.max_atoms), np.int32),
        }
        out = model.apply(
            converted,
            np.random.rand(2, cfg.data.input_size, cfg.data.input_size, 3).astype(np.float32),
            refs,
            deterministic=True,
        )
        assert np.isfinite(np.asarray(out["chartok_coords"], np.float32)).all()

    def test_linear_semantics(self):
        """Converted Dense must compute x @ W.T + b like torch Linear."""
        from molnextr_tpu.convert import _linear

        rng = np.random.RandomState(1)
        w = rng.randn(5, 3).astype(np.float32)
        b = rng.randn(5).astype(np.float32)
        sd = {"lin.weight": w, "lin.bias": b}
        p = _linear(sd, "lin")
        x = rng.randn(4, 3).astype(np.float32)
        np.testing.assert_allclose(x @ p["kernel"] + p["bias"], x @ w.T + b, rtol=1e-6)
