"""Activation-level parity: flax model vs torch reference semantics.

Each test builds the torch re-implementation of the reference behavior
(tests/torch_semantics.py), converts its REAL ``state_dict()`` through
``molnextr_tpu.convert``, and diffs activations between frameworks.  This
covers every converter mapping and the SURVEY §7 checkpoint-parity hot
spots: rel-pos-bias indexing, shifted-window masks, pre-norm/final-LN
placement, emb*sqrt(d), enc_trans, and the factored edge head.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from molnextr_tpu.config import Config, DecoderConfig, EncoderConfig, tiny_test_config
from molnextr_tpu.convert import (
    convert_checkpoint,
    convert_decoder_format,
    convert_encoder,
    _linear,
)
from tests import torch_semantics as ts

TOL = dict(rtol=2e-4, atol=2e-5)


def _np_tree(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def enc_cfg():
    cfg = Config()
    # depths (2,1): stage0 block1 exercises the shifted-window path
    cfg.encoder = EncoderConfig(
        name="swin_parity",
        patch_size=4,
        window_size=4,
        embed_dim=16,
        depths=(2, 1),
        num_heads=(2, 4),
        drop_path_rate=0.0,
        use_remat=False,
    )
    cfg.data.input_size = 32
    return cfg


class TestSwinParity:
    def test_full_encoder(self, enc_cfg):
        torch.manual_seed(0)
        c = enc_cfg.encoder
        tenc = ts.TorchEncoder(
            img_size=32,
            patch_size=c.patch_size,
            embed_dim=c.embed_dim,
            depths=c.depths,
            num_heads=c.num_heads,
            window_size=c.window_size,
        ).eval()

        from molnextr_tpu.models.swin import SwinEncoder

        jenc = SwinEncoder(c, input_size=32)
        params = convert_encoder(_sd(tenc), enc_cfg)

        img = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
        with torch.no_grad():
            ref = tenc(torch.from_numpy(img).permute(0, 3, 1, 2)).numpy()
        got, _ = jenc.apply({"params": params}, jnp.asarray(img))
        np.testing.assert_allclose(np.asarray(got), ref, **TOL)

    def test_shifted_window_mask_effective(self, enc_cfg):
        """The shift path must actually be hit (depths (2,1) -> block1)."""
        from molnextr_tpu.models.swin import shift_attn_mask

        m = shift_attn_mask(8, 8, 4, 2)
        assert m.any() and not m.all()


class TestDecoderParity:
    @pytest.fixture(scope="class")
    def setup(self):
        torch.manual_seed(1)
        encoder_dim, dim, heads, layers, vocab = 24, 32, 4, 3, 40
        fmt = "chartok_coords"
        bundle = ts.TorchDecoderBundle(fmt, encoder_dim, dim, heads, layers, vocab).eval()

        cfg = Config()
        cfg.decoder = DecoderConfig(num_layers=layers, hidden_size=dim,
                                    attn_heads=heads, hidden_dropout=0.0,
                                    attn_dropout=0.0, max_len=24, use_remat=False)
        cfg.data.formats = (fmt, "edges")
        sd = _sd(bundle)
        return bundle, cfg, sd, fmt, encoder_dim, vocab

    def test_teacher_forced_forward(self, setup):
        bundle, cfg, sd, fmt, encoder_dim, vocab = setup
        rng = np.random.RandomState(2)
        memory_raw = rng.randn(2, 9, encoder_dim).astype(np.float32)
        tokens = rng.randint(5, vocab, size=(2, 7))
        tokens[1, 5:] = 0  # PAD tail on one row
        pad = tokens == 0

        with torch.no_grad():
            ref_logits, ref_hidden = bundle.decoder[fmt](
                torch.from_numpy(memory_raw),
                torch.from_numpy(tokens).long(),
                torch.from_numpy(pad),
            )

        from molnextr_tpu.models.decoder import Decoder

        dparams = convert_decoder_format(sd, cfg, fmt)
        enc_trans = _linear(sd, f"decoder.{fmt}.enc_trans_layer.0")
        memory = memory_raw @ enc_trans["kernel"] + enc_trans["bias"]

        dec = Decoder(cfg.decoder, vocab)
        hidden = dec.apply(
            {"params": dparams},
            jnp.asarray(tokens, jnp.int32),
            jnp.asarray(memory),
            jnp.asarray(pad),
            deterministic=True,
        )
        logits = dec.apply(
            {"params": dparams}, hidden, method=lambda m, h: m.output(h)
        )
        np.testing.assert_allclose(np.asarray(hidden), ref_hidden.numpy(), **TOL)
        np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(), **TOL)

    def test_embedding_scale_and_offset(self, setup):
        """emb*sqrt(d) + PE at a nonzero step offset (`embedding.py:42-61`)."""
        bundle, cfg, sd, fmt, encoder_dim, vocab = setup
        tokens = np.array([[7, 8]], dtype=np.int64)
        with torch.no_grad():
            ref = bundle.decoder[fmt].embeddings(torch.from_numpy(tokens), step=5).numpy()

        from molnextr_tpu.models.decoder import Decoder

        dparams = convert_decoder_format(sd, cfg, fmt)
        dec = Decoder(cfg.decoder, vocab)
        got = dec.apply(
            {"params": dparams},
            jnp.asarray(tokens, jnp.int32),
            5,
            method=lambda m, t, s: m.embed_tokens(t, s),
        )
        np.testing.assert_allclose(np.asarray(got), ref, **TOL)

    def test_edge_head(self, setup):
        bundle, cfg, sd, fmt, encoder_dim, vocab = setup
        rng = np.random.RandomState(3)
        hidden = rng.randn(2, 10, cfg.decoder.hidden_size).astype(np.float32)
        indices = rng.randint(0, 10, size=(2, 4))
        with torch.no_grad():
            ref = bundle.decoder["edges"](
                torch.from_numpy(hidden), torch.from_numpy(indices).long()
            ).numpy()

        from molnextr_tpu.models.heads import GraphPredictor

        mlp1 = _linear(sd, "decoder.edges.mlp.0")
        d_in = mlp1["kernel"].shape[0] // 2
        params = {
            "mlp1_row": {"kernel": mlp1["kernel"][:d_in], "bias": mlp1["bias"]},
            "mlp1_col": {"kernel": mlp1["kernel"][d_in:]},
            "mlp2": _linear(sd, "decoder.edges.mlp.2"),
        }
        head = GraphPredictor(cfg.decoder.hidden_size)
        got = head.apply(
            {"params": params}, jnp.asarray(hidden), jnp.asarray(indices, jnp.int32)
        )["edges"]
        np.testing.assert_allclose(np.asarray(got), ref, **TOL)


class TestEndToEndCheckpoint:
    def test_pth_roundtrip_full_forward(self, tmp_path):
        """torch.save -> torch-free reader -> convert -> full-model forward
        matches the torch reference-semantics pipeline end to end."""
        torch.manual_seed(4)
        cfg = tiny_test_config()
        cfg.encoder = EncoderConfig(
            name="swin_parity", patch_size=4, window_size=4, embed_dim=16,
            depths=(2, 1), num_heads=(2, 4), drop_path_rate=0.0, use_remat=False,
        )
        cfg.decoder = DecoderConfig(num_layers=2, hidden_size=32, attn_heads=2,
                                    hidden_dropout=0.0, attn_dropout=0.0,
                                    max_len=24, use_remat=False)
        cfg.data.input_size = 32
        fmt = "chartok_coords"
        cfg.data.formats = (fmt, "edges")

        from molnextr_tpu.tokenization import get_tokenizer

        vocab = len(get_tokenizer(cfg.data)[fmt])
        c = cfg.encoder
        tenc = ts.TorchEncoder(
            img_size=32, patch_size=c.patch_size, embed_dim=c.embed_dim,
            depths=c.depths, num_heads=c.num_heads, window_size=c.window_size,
        ).eval()
        tdec = ts.TorchDecoderBundle(
            fmt, c.num_features, cfg.decoder.hidden_size, cfg.decoder.attn_heads,
            cfg.decoder.num_layers, vocab,
        ).eval()

        path = str(tmp_path / "ref.pth")
        torch.save(
            {
                "encoder": {"module." + k: v for k, v in tenc.state_dict().items()},
                "decoder": tdec.state_dict(),
                "args": {"formats": f"{fmt},edges", "input_size": 32,
                         "coord_bins": cfg.data.coord_bins, "sep_xy": True},
            },
            path,
        )

        from molnextr_tpu.convert import load_torch_checkpoint

        cfg2, variables = load_torch_checkpoint(path, cfg)
        assert cfg2.data.input_size == 32

        rng = np.random.RandomState(5)
        img = rng.rand(2, 32, 32, 3).astype(np.float32)
        tokens = rng.randint(5, vocab, size=(2, 7))
        indices = rng.randint(0, 6, size=(2, 4))

        with torch.no_grad():
            feats = tenc(torch.from_numpy(img).permute(0, 3, 1, 2))
            ref_logits, ref_hidden = tdec.decoder[fmt](
                feats, torch.from_numpy(tokens).long(),
                torch.from_numpy(tokens == 0),
            )
            ref_edges = tdec.decoder["edges"](
                ref_hidden, torch.from_numpy(indices).long()
            ).numpy()

        from molnextr_tpu.models.model import MolNexTRModel

        model = MolNexTRModel(cfg, {fmt: vocab})
        variables = _np_tree(variables)
        refs = {
            fmt: jnp.asarray(tokens, jnp.int32),
            "atom_indices": jnp.asarray(indices, jnp.int32),
        }
        out = model.apply(variables, jnp.asarray(img), refs, deterministic=True)
        # training forward drops the last logit column (next-token shift)
        np.testing.assert_allclose(
            np.asarray(out[fmt]), ref_logits.numpy()[:, :-1], **TOL
        )
        np.testing.assert_allclose(np.asarray(out["edges"]), ref_edges, **TOL)
