"""Model-core tests: shapes, KV-cache consistency, constrained decoding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molnextr_tpu.config import Config, DataConfig, DecoderConfig, EncoderConfig, tiny_test_config
from molnextr_tpu.models.decoder import Decoder
from molnextr_tpu.models.heads import GraphPredictor, symmetrize_edge_probs
from molnextr_tpu.models.model import MolNexTRModel
from molnextr_tpu.models.swin import SwinEncoder
from molnextr_tpu.tokenization import EOS_ID, PAD_ID, SOS_ID, get_tokenizer


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_test_config()
    tokenizers = get_tokenizer(cfg.data)
    vocab_sizes = {f: len(t) for f, t in tokenizers.items()}
    model = MolNexTRModel(cfg, vocab_sizes)
    rng = jax.random.PRNGKey(0)
    images = jnp.zeros((2, cfg.data.input_size, cfg.data.input_size, 3))
    T = 12
    labels = jnp.full((2, T), PAD_ID, jnp.int32).at[:, 0].set(SOS_ID)
    refs = {
        "chartok_coords": labels,
        "atom_indices": jnp.zeros((2, cfg.data.max_atoms), jnp.int32),
    }
    params = model.init({"params": rng, "dropout": rng}, images, refs, deterministic=True)
    return cfg, tokenizers, model, params, images, refs


class TestSwin:
    def test_output_shape(self):
        enc_cfg = EncoderConfig(
            name="swin_test", patch_size=4, window_size=4, embed_dim=16,
            depths=(1, 1), num_heads=(2, 2), use_remat=False,
        )
        enc = SwinEncoder(enc_cfg, input_size=32)
        x = jnp.zeros((2, 32, 32, 3))
        params = enc.init(jax.random.PRNGKey(0), x)
        out, hiddens = enc.apply(params, x)
        # 32/4 = 8 tokens/side stage0; one merge -> 4x4 = 16 tokens, dim 32
        assert out.shape == (2, 16, 32)
        assert hiddens[0].shape == (2, 8, 8, 16)
        assert hiddens[1].shape == (2, 4, 4, 32)

    def test_shifted_window_differs_from_unshifted(self):
        # sanity: the two blocks in a depth-2 stage produce different params
        enc_cfg = EncoderConfig(
            name="swin_test", patch_size=4, window_size=4, embed_dim=16,
            depths=(2,), num_heads=(2,), use_remat=False,
        )
        enc = SwinEncoder(enc_cfg, input_size=32)
        x = jnp.ones((1, 32, 32, 3))
        params = enc.init(jax.random.PRNGKey(0), x)
        out, _ = enc.apply(params, x)
        assert np.isfinite(np.asarray(out)).all()


class TestModelForward:
    def test_train_forward_shapes(self, tiny):
        cfg, tokenizers, model, params, images, refs = tiny
        out = model.apply(params, images, refs, deterministic=True)
        V = len(tokenizers["chartok_coords"])
        T = refs["chartok_coords"].shape[1]
        assert out["chartok_coords"].shape == (2, T - 1, V)
        K = cfg.data.max_atoms
        assert out["edges"].shape == (2, 7, K, K)


class TestKVCacheConsistency:
    def test_step_matches_full_forward(self, tiny):
        """Stepwise decode with the static cache must reproduce the
        teacher-forced hidden states exactly (the correctness core of the
        decode loop).

        Pins the EXACT (bf16/f32) cache path: kv_int8 is forced off here —
        the default flipped on in round 5, and the quantized path's
        step-level agreement has its own tolerance-aware tests in
        tests/test_kv_int8.py."""
        cfg, tokenizers, model, params, images, refs = tiny
        import dataclasses

        cfg = dataclasses.replace(
            cfg, decoder=dataclasses.replace(cfg.decoder, kv_int8=False)
        )
        vocab_sizes = {f: len(t) for f, t in tokenizers.items()}
        model = MolNexTRModel(cfg, vocab_sizes)
        memory = model.apply(params, images, method=MolNexTRModel.encode)
        tok = tokenizers["chartok_coords"]
        # a non-trivial token prefix
        tokens = jnp.asarray(
            [[SOS_ID, 10, 20, 30, 11, 21], [SOS_ID, 12, 22, 32, 13, 23]], jnp.int32
        )
        full_hidden = model.apply(
            params,
            method=lambda m: m.decoders["chartok_coords"](tokens, memory, None, True),
        )
        cache = model.apply(params, "chartok_coords", memory, method=MolNexTRModel.init_cache)
        for t in range(tokens.shape[1]):
            logits, hidden, cache = model.apply(
                params, "chartok_coords", tokens[:, t], t, cache,
                method=MolNexTRModel.decode_step,
            )
            np.testing.assert_allclose(
                np.asarray(hidden), np.asarray(full_hidden[:, t]), rtol=2e-4, atol=2e-5
            )


class TestGreedyDecode:
    def test_decode_runs_and_respects_grammar(self, tiny):
        from molnextr_tpu.inference import InferenceEngine

        cfg, tokenizers, model, params, images, refs = tiny
        engine = InferenceEngine(cfg, tokenizers, model, params)
        preds = engine.predict_images(np.zeros((2, 32, 32, 3), np.float32))
        assert len(preds) == 2
        tok = tokenizers["chartok_coords"]
        for pred in preds:
            parsed = pred["chartok_coords"]
            assert "smiles" in parsed
            assert len(parsed["symbols"]) == len(parsed["coords"])
            assert "edges" in pred
            k = len(parsed["symbols"])
            assert len(pred["edges"]) == min(k, cfg.data.max_atoms)

    def test_uint8_wire_decodes_identically(self, tiny):
        """uint8 grayscale (B,H,W,1) engine input must decode to the same
        sequences as the equivalent host-normalized float32 RGB batch."""
        from molnextr_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
        from molnextr_tpu.inference import InferenceEngine

        cfg, tokenizers, model, params, images, refs = tiny
        engine = InferenceEngine(cfg, tokenizers, model, params)
        rng = np.random.default_rng(3)
        gray = rng.integers(0, 256, size=(2, 32, 32, 1), dtype=np.uint8)
        f32 = (
            np.repeat(gray, 3, axis=-1).astype(np.float32) / 255.0
            - IMAGENET_MEAN
        ) / IMAGENET_STD
        seq_wire = np.asarray(engine._decode_jit(params, jnp.asarray(gray))[0])
        seq_f32 = np.asarray(
            engine._decode_jit(params, jnp.asarray(f32.astype(np.float32)))[0]
        )
        np.testing.assert_array_equal(seq_wire, seq_f32)

    def test_grammar_constraint_in_sequence(self, tiny):
        """Raw decoded ids must satisfy after-x-comes-y."""
        cfg, tokenizers, model, params, images, refs = tiny
        from molnextr_tpu.inference import InferenceEngine

        engine = InferenceEngine(cfg, tokenizers, model, params)
        seq, avg, tokscores, hiddens = engine._decode_jit(
            params, jnp.zeros((2, 32, 32, 3))
        )
        tok = tokenizers["chartok_coords"]
        for row in np.asarray(seq):
            for a, b in zip(row[:-1], row[1:]):
                if b == PAD_ID or a == PAD_ID or b == EOS_ID:
                    break
                if tok.is_x(int(a)):
                    assert tok.is_y(int(b)), f"x not followed by y: {a}->{b}"


class TestEdgeHead:
    def test_symmetrization(self):
        rng = np.random.RandomState(0)
        p = rng.rand(4, 4, 7).astype(np.float32)
        sym = np.asarray(symmetrize_edge_probs(jnp.asarray(p)))
        # reference math: classes 0-4 symmetric, 5/6 swap under transpose
        for i in range(4):
            for j in range(4):
                for c in range(5):
                    assert abs(sym[i, j, c] - (p[i, j, c] + p[j, i, c]) / 2) < 1e-6
                assert abs(sym[i, j, 5] - (p[i, j, 5] + p[j, i, 6]) / 2) < 1e-6
                assert abs(sym[i, j, 6] - (p[i, j, 6] + p[j, i, 5]) / 2) < 1e-6
                assert abs(sym[i, j, 5] - sym[j, i, 6]) < 1e-6

    def test_graph_predictor_shapes(self):
        gp = GraphPredictor(hidden=16)
        h = jnp.zeros((2, 10, 16))
        idx = jnp.zeros((2, 5), jnp.int32)
        params = gp.init(jax.random.PRNGKey(0), h, idx)
        out = gp.apply(params, h, idx)
        assert out["edges"].shape == (2, 7, 5, 5)

    def test_heatmap_class_of(self):
        from molnextr_tpu.models.heads import HEATMAP_ELEMENTS, heatmap_class_of

        other = len(HEATMAP_ELEMENTS)
        for el in HEATMAP_ELEMENTS:
            assert heatmap_class_of(el) == HEATMAP_ELEMENTS.index(el)
        # unknown two-letter elements map to "other", NOT their first letter
        # (r3 advisor: Na->N, Fe->F, Se->S aliasing)
        for el in ("Na", "Sn", "Ca", "Fe", "Se", "Pb", "Zn", "Mg"):
            assert heatmap_class_of(el) == other, el
        # bracketed / charged / isotope forms still resolve
        assert heatmap_class_of("[13C]") == HEATMAP_ELEMENTS.index("C")
        assert heatmap_class_of("[Cl-]") == HEATMAP_ELEMENTS.index("Cl")
        assert heatmap_class_of("[Na+]") == other
        # aromatic lowercase single letters resolve via the upper match
        assert heatmap_class_of("c") == HEATMAP_ELEMENTS.index("C")
        assert heatmap_class_of("R1") == other


class TestDANet:
    def test_shapes_and_identity_at_init(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from molnextr_tpu.models.danet import ChannelAttention, DAHead, PositionAttention

        x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 16), jnp.float32)
        pam = PositionAttention(16)
        p = pam.init(jax.random.PRNGKey(0), x)
        # alpha starts at 0 -> identity
        np.testing.assert_allclose(np.asarray(pam.apply(p, x)), np.asarray(x), rtol=1e-5)
        cam = ChannelAttention()
        pc = cam.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(np.asarray(cam.apply(pc, x)), np.asarray(x), rtol=1e-5)
        head = DAHead(out_channels=4)
        ph = head.init(jax.random.PRNGKey(0), x)
        out = head.apply(ph, x)
        assert out.shape == (2, 8, 8, 4)


class TestConvNeXt:
    def test_convnext_encoder_end_to_end(self):
        import dataclasses

        import jax
        import jax.numpy as jnp
        import numpy as np

        from molnextr_tpu.config import tiny_test_config
        from molnextr_tpu.models.model import MolNexTRModel
        from molnextr_tpu.tokenization import get_tokenizer

        cfg = tiny_test_config()
        cfg.encoder = dataclasses.replace(
            cfg.encoder, name="convnext_test",
            convnext_depths=(1, 1), convnext_dims=(16, 32),
        )
        toks = get_tokenizer(cfg.data)
        model = MolNexTRModel(cfg, {f: len(t) for f, t in toks.items()})
        refs = {
            "chartok_coords": np.ones((2, 8), np.int32),
            "atom_indices": np.zeros((2, cfg.data.max_atoms), np.int32),
        }
        imgs = np.zeros((2, cfg.data.input_size, cfg.data.input_size, 3), np.float32)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
            imgs, refs, deterministic=True,
        )
        out = model.apply(params, imgs, refs, deterministic=True)
        assert np.isfinite(np.asarray(out["chartok_coords"], np.float32)).all()
        mem = model.apply(params, imgs, method=MolNexTRModel.encode)
        assert mem.shape[-1] == cfg.decoder.hidden_size
