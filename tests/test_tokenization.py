import numpy as np
import pytest

from molnextr_tpu.config import DataConfig
from molnextr_tpu.tokenization import (
    EOS_ID,
    MASK_ID,
    PAD_ID,
    SOS_ID,
    UNK_ID,
    CharTokenizer,
    NodeTokenizer,
    Tokenizer,
    atomwise_tokens,
    get_tokenizer,
)


def char_tok(**kw):
    cfg = DataConfig(**kw)
    return get_tokenizer(cfg)["chartok_coords"]


def node_tok():
    cfg = DataConfig(formats=("atomtok_coords", "edges"))
    return get_tokenizer(cfg)["atomtok_coords"]


class TestAtomwiseTokens:
    def test_simple(self):
        assert atomwise_tokens("CCO") == ["C", "C", "O"]

    def test_two_letter(self):
        assert atomwise_tokens("CClBr") == ["C", "Cl", "Br"]

    def test_brackets(self):
        assert atomwise_tokens("[NH3+]C") == ["[NH3+]", "C"]

    def test_ring_and_bonds(self):
        assert atomwise_tokens("c1ccccc1C=O") == [
            "c", "1", "c", "c", "c", "c", "c", "1", "C", "=", "O",
        ]

    def test_percent_ring(self):
        assert atomwise_tokens("C%12C") == ["C", "%12", "C"]


class TestCharTokenizer:
    def test_special_ids(self):
        t = char_tok()
        assert t.stoi["<pad>"] == PAD_ID
        assert t.stoi["<sos>"] == SOS_ID
        assert t.stoi["<eos>"] == EOS_ID
        assert t.stoi["<unk>"] == UNK_ID
        assert t.stoi["<mask>"] == MASK_ID

    def test_len_with_sep_xy(self):
        t = char_tok()
        assert len(t) == t.offset + 64 + 64

    def test_roundtrip_no_coords(self):
        t = char_tok()
        t2 = CharTokenizer(64, None, True)
        t2.stoi, t2.itos = t.stoi, t.itos
        t2.continuous_coords = True
        smiles = "CC(=O)Oc1ccccc1C(=O)O"
        labels, indices = t2.smiles_to_sequence(smiles)
        out = t2.sequence_to_smiles(labels[1:])
        assert out["smiles"] == smiles

    def test_roundtrip_with_coords(self):
        t = char_tok()
        smiles = "ClCC[NH3+]"
        coords = [[0.0, 0.0], [0.5, 0.25], [1.0, 0.5], [0.25, 1.0]]
        labels, indices = t.smiles_to_sequence(smiles, coords)
        assert labels[0] == SOS_ID and labels[-1] == EOS_ID
        # decode skips the SOS
        out = t.sequence_to_smiles(labels[1:])
        assert out["smiles"] == smiles
        assert out["symbols"] == ["Cl", "C", "C", "[NH3+]"]
        got = np.array(out["coords"])
        want = np.array(coords)
        assert np.abs(got - want).max() < 1.0 / 63 + 1e-6

    def test_atom_indices_point_at_y_token(self):
        t = char_tok()
        labels, indices = t.smiles_to_sequence("CC", [[0.1, 0.2], [0.3, 0.4]])
        for idx in indices:
            assert t.is_y(labels[idx])

    def test_mask_ratio_one(self):
        t = char_tok()
        labels, indices = t.smiles_to_sequence("CC", mask_ratio=1.0)
        assert labels.count(MASK_ID) == 4

    def test_grammar_mask_after_x(self):
        t = char_tok()
        x_id = t.x_to_id(0.5)
        mask = t.get_output_mask(x_id)
        # after an x token only y tokens are allowed
        assert all(mask[: t.offset + t.maxx])
        assert not any(mask[t.offset + t.maxx:])

    def test_grammar_mask_after_y(self):
        t = char_tok()
        y_id = t.y_to_id(0.5)
        mask = t.get_output_mask(y_id)
        assert not any(mask[: t.offset])
        assert all(mask[t.offset:])

    def test_constraint_tables_match_python_mask(self):
        t = char_tok()
        token_class, class_mask = t.constraint_tables()
        for tid in [0, 5, t.offset - 1, t.x_to_id(0.0), t.x_to_id(1.0), t.y_to_id(0.3)]:
            expect = np.asarray(t.get_output_mask(tid), dtype=bool)
            got = class_mask[token_class[tid]]
            np.testing.assert_array_equal(got, expect)

    def test_cl_br_digraph_reassembly(self):
        t = char_tok()
        labels, _ = t.smiles_to_sequence("ClBr", [[0, 0], [1, 1]])
        out = t.sequence_to_smiles(labels[1:])
        assert out["symbols"] == ["Cl", "Br"]

    def test_bracket_group_reassembly(self):
        t = char_tok()
        labels, _ = t.smiles_to_sequence("[13C]C", [[0, 0], [1, 1]])
        out = t.sequence_to_smiles(labels[1:])
        assert out["symbols"][0] == "[13C]"


class TestNodeTokenizer:
    def test_coord_quantization_roundtrip(self):
        t = node_tok()
        for v in [0.0, 0.124, 0.5, 0.77, 1.0]:
            assert abs(t.id_to_x(t.x_to_id(v)) - v) <= 0.5 / 63
            assert abs(t.id_to_y(t.y_to_id(v)) - v) <= 0.5 / 63

    def test_grammar_after_atom(self):
        t = node_tok()
        c_id = t.stoi["C"]
        mask = t.get_output_mask(c_id)
        assert all(mask[: t.offset])
        assert not any(mask[t.offset: t.offset + t.maxx])
        assert all(mask[t.offset + t.maxx:])

    def test_sequence_roundtrip(self):
        t = node_tok()
        smiles = "C(=O)N"
        coords = [[0.2, 0.2], [0.4, 0.6], [0.8, 0.9]]
        labels, indices = t.smiles_to_sequence(smiles, coords)
        out = t.sequence_to_smiles(labels[1:])
        assert out["smiles"] == smiles
        assert out["symbols"] == ["C", "O", "N"]


class TestPlainTokenizer:
    def test_fit_and_roundtrip(self):
        t = Tokenizer()
        t.fit_on_texts(["C C O", "N = C"])
        seq = t.text_to_sequence("CCO", tokenized=False)
        assert seq[0] == SOS_ID and seq[-1] == EOS_ID
        assert t.predict_caption(seq[1:]) == "CCO"

    def test_unk(self):
        t = Tokenizer()
        t.fit_on_texts(["C"])
        seq = t.text_to_sequence("N", tokenized=False)
        assert UNK_ID in seq
