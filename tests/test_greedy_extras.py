"""MASK-token partial prediction + temperature sampling in greedy decode.

Covers the reference behaviors at `components.py:286-289, 326-332` (label
splicing: known tokens forced, MASK slots predicted) and
`greedy_search.py:5-30` (``sample_with_temperature``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molnextr_tpu.config import tiny_test_config
from molnextr_tpu.decoding.greedy import greedy_decode
from molnextr_tpu.models.model import MolNexTRModel
from molnextr_tpu.tokenization import (
    EOS_ID,
    MASK_ID,
    PAD_ID,
    get_tokenizer,
)


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
    tok = tokenizers["chartok_coords"]
    tc, cm = tok.constraint_tables()

    def step_fn(tokens, pos, cache):
        return model.apply(
            params, "chartok_coords", tokens, pos, cache,
            method=MolNexTRModel.decode_step,
        )

    def init_cache_fn(mem):
        return model.apply(
            params, "chartok_coords", mem, method=MolNexTRModel.init_cache
        )

    memory = model.apply(params, images, method=MolNexTRModel.encode)

    def decode(**kw):
        return greedy_decode(
            step_fn, init_cache_fn, memory, jnp.asarray(tc), jnp.asarray(cm),
            cfg.decoder.max_len, cfg.decoder.hidden_size, **kw,
        )

    return cfg, tok, decode


class TestUnroll:
    def test_unroll_matches_single_step(self, setup):
        """unroll=2/4 must produce the identical argmax decode (finished
        lanes stay frozen, so the coarser early-exit changes nothing)."""
        cfg, tok, decode = setup
        base = decode()
        for u in (2, 4):
            seq, avg, scores, hiddens = decode(unroll=u)
            np.testing.assert_array_equal(np.asarray(seq), np.asarray(base[0]))
            np.testing.assert_allclose(
                np.asarray(avg), np.asarray(base[1]), rtol=1e-6
            )

    def test_unroll_with_phased(self, setup):
        """phased cache growth composes with unroll (tiny max_len falls
        through to the plain loop; equality must still hold)."""
        cfg, tok, decode = setup
        base = decode(phased=True)
        got = decode(phased=True, unroll=2)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(base[0]))

    def test_unroll_with_phased_growth(self):
        """Real >128 phased path: a synthetic step_fn whose cache is the
        (B, H, T, hd)-shaped self cache; unrolled phases must match."""
        b, v, d, max_len = 2, 12, 8, 256

        def step_fn(tokens, pos, cache):
            # logits depend on token + pos so the argmax sequence is
            # nontrivial; EOS only very late (lane 1 finishes at pos 200)
            base = jnp.arange(v, dtype=jnp.float32)[None] * 0.1
            tok_term = (tokens[:, None] * 17 + pos * 13) % 7
            logits = base + (jnp.arange(v)[None] == tok_term).astype(
                jnp.float32
            ) * 5.0
            fin = (pos >= 200) & (jnp.arange(b) == 1)[..., None].squeeze(-1)
            logits = jnp.where(
                fin[:, None] & (jnp.arange(v)[None] == EOS_ID), 50.0, logits
            )
            hidden = jnp.zeros((b, d), jnp.float32)
            return logits, hidden, cache

        def init_cache_fn(memory):
            return {
                "self_k": jnp.zeros((1, b, 1, 256, 4)),
                "self_v": jnp.zeros((1, b, 1, 256, 4)),
            }

        memory = jnp.zeros((b, 4, d), jnp.float32)
        tc = np.zeros((v,), np.int32)
        cm = np.zeros((1, v), bool)
        out = []
        for u in (1, 4):
            seq, avg, _, _ = greedy_decode(
                step_fn, init_cache_fn, memory, jnp.asarray(tc),
                jnp.asarray(cm), max_len, d, use_constraint=False,
                phased=True, unroll=u,
            )
            out.append(np.asarray(seq))
        np.testing.assert_array_equal(out[0], out[1])
        # lane 1 must actually have finished early via EOS
        assert (out[0][1] == EOS_ID).any()


class TestPartialPrediction:
    def test_masked_coords_predicted_symbols_forced(self, setup):
        """The VERDICT done-criterion: gold symbols fixed, coords filled in."""
        cfg, tok, decode = setup
        # labels with every coordinate masked (mask_ratio=1 always masks)
        ids, indices = tok.smiles_to_sequence("CC", mask_ratio=1.0)
        assert MASK_ID in ids
        labels = np.tile(np.array(ids, np.int32), (2, 1))
        seq, avg, scores, hiddens = decode(labels=jnp.asarray(labels))
        seq = np.asarray(seq)
        # output position t pairs with labels[t+1]
        for t, lab in enumerate(ids[1:]):
            if lab == MASK_ID:
                # predicted: the grammar forces a coordinate token here
                assert seq[0, t] != MASK_ID and seq[0, t] != PAD_ID
            else:
                assert (seq[:, t] == lab).all(), (t, lab, seq[:, t])
        # sequence finishes exactly at the label's EOS
        eos_pos = len(ids) - 2
        assert (seq[:, eos_pos] == EOS_ID).all()
        assert (seq[:, eos_pos + 1:] == PAD_ID).all()

    def test_masked_slots_obey_grammar(self, setup):
        """After a predicted x token the grammar forces a y token — even
        across the forced/free boundary (the CharTokenizer mask constrains
        only x->y / y->symbol transitions, `tokenization.py:357-365`)."""
        cfg, tok, decode = setup
        ids, _ = tok.smiles_to_sequence("CC", mask_ratio=1.0)
        labels = np.tile(np.array(ids, np.int32), (2, 1))
        seq = np.asarray(decode(labels=jnp.asarray(labels))[0])
        for row in seq:
            for t, lab in enumerate(ids[1:]):
                if lab != MASK_ID or t == 0:
                    continue  # forced tokens may legally override the mask
                prev, cur = int(row[t - 1]), int(row[t])
                if tok.is_x(prev):
                    assert tok.is_y(cur)
                if tok.is_y(prev):  # after y: x and y forbidden
                    assert not (tok.is_x(cur) or tok.is_y(cur))

    def test_short_label_then_free_decoding(self, setup):
        """PAD-exhausted labels hand control back to the model."""
        cfg, tok, decode = setup
        ids, _ = tok.smiles_to_sequence("C", mask_ratio=1.0)
        partial = ids[:-1]  # drop EOS: label runs out, free decode continues
        labels = np.tile(np.array(partial, np.int32), (2, 1))
        seq = np.asarray(decode(labels=jnp.asarray(labels))[0])
        k = len(partial) - 1
        # beyond the label, decoding continued (not immediately EOS-frozen)
        assert (seq[:, k] != PAD_ID).any()


class TestTemperatureSampling:
    def test_temp_zero_is_argmax(self, setup):
        cfg, tok, decode = setup
        ref = np.asarray(decode()[0])
        got = np.asarray(
            decode(sampling_temp=0.0, keep_topk=5, rng=jax.random.PRNGKey(1))[0]
        )
        np.testing.assert_array_equal(ref, got)

    def test_topk1_is_argmax(self, setup):
        cfg, tok, decode = setup
        ref = np.asarray(decode()[0])
        got = np.asarray(
            decode(sampling_temp=2.0, keep_topk=1, rng=jax.random.PRNGKey(1))[0]
        )
        np.testing.assert_array_equal(ref, got)

    def test_sampling_varies_and_is_deterministic_per_key(self, setup):
        cfg, tok, decode = setup
        a = np.asarray(decode(sampling_temp=3.0, keep_topk=8, rng=jax.random.PRNGKey(1))[0])
        b = np.asarray(decode(sampling_temp=3.0, keep_topk=8, rng=jax.random.PRNGKey(1))[0])
        c = np.asarray(decode(sampling_temp=3.0, keep_topk=8, rng=jax.random.PRNGKey(2))[0])
        np.testing.assert_array_equal(a, b)
        assert (a != c).any()  # untrained logits + temp 3: ties ~impossible

    def test_sampling_respects_grammar(self, setup):
        cfg, tok, decode = setup
        seq = np.asarray(
            decode(sampling_temp=3.0, keep_topk=8, rng=jax.random.PRNGKey(3))[0]
        )
        for row in seq:
            for a, nxt in zip(row[:-1], row[1:]):
                if nxt in (PAD_ID, EOS_ID) or a == PAD_ID:
                    break
                if tok.is_x(int(a)):
                    assert tok.is_y(int(nxt))

    def test_missing_rng_raises(self, setup):
        cfg, tok, decode = setup
        with pytest.raises(ValueError):
            decode(sampling_temp=1.5, keep_topk=4)
