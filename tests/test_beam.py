"""Beam-search decoding tests (tiny model, CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molnextr_tpu.config import tiny_test_config
from molnextr_tpu.inference import InferenceEngine
from molnextr_tpu.models.model import MolNexTRModel
from molnextr_tpu.tokenization import EOS_ID, PAD_ID, get_tokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    tokenizers = get_tokenizer(cfg.data)
    model = MolNexTRModel(cfg, {f: len(t) for f, t in tokenizers.items()})
    images = jnp.zeros((2, cfg.data.input_size, cfg.data.input_size, 3))
    refs = {
        "chartok_coords": jnp.ones((2, 8), jnp.int32),
        "atom_indices": jnp.zeros((2, cfg.data.max_atoms), jnp.int32),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        images, refs, deterministic=True,
    )
    return cfg, tokenizers, model, params, images


class TestBeamDecode:
    def test_beam1_matches_greedy(self, setup):
        cfg, tokenizers, model, params, images = setup
        greedy_engine = InferenceEngine(cfg, tokenizers, model, params)
        g_seq, g_avg, _, _ = greedy_engine._decode_jit(params, images)

        import copy

        cfg_b = copy.deepcopy(cfg)
        cfg_b.decode.beam_size = 1  # beam path selected only when > 1: force
        from molnextr_tpu.decoding.beam import beam_decode

        def step_fn(tokens, pos, cache):
            return model.apply(
                params, "chartok_coords", tokens, pos, cache,
                method=MolNexTRModel.decode_step,
            )

        def init_cache_fn(mem):
            return model.apply(
                params, "chartok_coords", mem, method=MolNexTRModel.init_cache
            )

        tok = tokenizers["chartok_coords"]
        tc, cm = tok.constraint_tables()
        memory = model.apply(params, images, method=MolNexTRModel.encode)
        b_seq, b_avg, _, _ = beam_decode(
            step_fn, init_cache_fn, memory, jnp.asarray(tc), jnp.asarray(cm),
            greedy_engine.max_len, cfg.decoder.hidden_size, beam_size=1,
        )
        np.testing.assert_array_equal(np.asarray(g_seq), np.asarray(b_seq))

    def test_beam_scores_at_least_greedy(self, setup):
        """A width-3 beam's best normalized log-prob must be >= greedy's."""
        cfg, tokenizers, model, params, images = setup
        import copy

        cfg_b = copy.deepcopy(cfg)
        cfg_b.decode = dataclasses.replace(cfg_b.decode, beam_size=3)
        beam_engine = InferenceEngine(cfg_b, tokenizers, model, params)
        greedy_engine = InferenceEngine(cfg, tokenizers, model, params)
        _, g_avg, _, _ = greedy_engine._decode_jit(params, images)
        _, b_avg, _, _ = beam_engine._decode_jit(params, images)
        assert np.all(np.asarray(b_avg) >= np.asarray(g_avg) - 1e-4)

    def test_beam_respects_grammar(self, setup):
        cfg, tokenizers, model, params, images = setup
        import copy

        cfg_b = copy.deepcopy(cfg)
        cfg_b.decode = dataclasses.replace(cfg_b.decode, beam_size=3)
        engine = InferenceEngine(cfg_b, tokenizers, model, params)
        seq, avg, scores, hiddens = engine._decode_jit(params, images)
        tok = tokenizers["chartok_coords"]
        for row in np.asarray(seq):
            for a, nxt in zip(row[:-1], row[1:]):
                if nxt in (PAD_ID, EOS_ID) or a == PAD_ID:
                    break
                if tok.is_x(int(a)):
                    assert tok.is_y(int(nxt))

    def test_beam_end_to_end_predictions(self, setup):
        cfg, tokenizers, model, params, images = setup
        import copy

        cfg_b = copy.deepcopy(cfg)
        cfg_b.decode = dataclasses.replace(cfg_b.decode, beam_size=2)
        engine = InferenceEngine(cfg_b, tokenizers, model, params)
        preds = engine.predict_images(np.zeros((2, 32, 32, 3), np.float32))
        assert len(preds) == 2
        for p in preds:
            assert "smiles" in p["chartok_coords"]
            assert "edges" in p


class TestNBest:
    def test_n_best_hypotheses_surface(self, setup):
        cfg, tokenizers, model, params, images = setup
        import copy

        cfg_b = copy.deepcopy(cfg)
        cfg_b.decode = dataclasses.replace(cfg_b.decode, beam_size=3, n_best=3)
        engine = InferenceEngine(cfg_b, tokenizers, model, params)
        preds = engine.predict_images(np.zeros((2, 32, 32, 3), np.float32))
        for p in preds:
            assert len(p["beams"]) == 3
            scores = [b["score"] for b in p["beams"]]
            assert scores == sorted(scores, reverse=True)
            assert p["beams"][0]["smiles"] == p["chartok_coords"]["smiles"]
