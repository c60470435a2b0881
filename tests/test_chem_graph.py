"""Graph->SMILES conversion, abbreviation expansion, formula parsing,
molfile output, and evaluation metrics."""

import math

import numpy as np
import pytest

from molnextr_tpu.chem import canonicalize_smiles, mol_from_smiles
from molnextr_tpu.chem.abbreviations import ABBREVIATIONS, SUBSTITUTIONS
from molnextr_tpu.chem.aromaticity import sanitize
from molnextr_tpu.chem.fingerprint import path_fingerprint, tanimoto, tanimoto_similarity
from molnextr_tpu.chem.formula import condensed_formula_to_smiles, expand_carbon, parse_formula
from molnextr_tpu.chem.graph import (
    _attachment_points,
    convert_graph_to_smiles,
    expand_functional_groups,
    free_valence,
    keep_main_molecule,
    normalize_nodes,
    postprocess_smiles,
)
from molnextr_tpu.chem.molfile import write_molfile
from molnextr_tpu.chem.smiles_parser import parse_smiles
from molnextr_tpu.evaluation import SmilesEvaluator


def ring_coords(n=6, r=0.3):
    return [
        [0.5 + r * math.cos(a * 2 * math.pi / n), 0.5 + r * math.sin(a * 2 * math.pi / n)]
        for a in range(n)
    ]


def make_edges(n, pairs):
    e = [[0] * n for _ in range(n)]
    for i, j, v in pairs:
        e[i][j] = v
        e[j][i] = 11 - v if v in (5, 6) else v
    return e


class TestAbbreviationTable:
    def test_all_entries_parse_with_attachment(self):
        for sub in SUBSTITUTIONS:
            m = parse_smiles(sub.smiles, strict=True)
            sanitize(m, strict=True)
            pts = _attachment_points(m, sub.smiles)
            assert pts, sub.abbrvs
            if not sub.smiles.startswith("*"):
                assert free_valence(m, pts[0]) >= 1, sub.abbrvs

    def test_lookup_aliases(self):
        assert ABBREVIATIONS["OMe"].smiles == ABBREVIATIONS["MeO"].smiles
        assert "Boc" in ABBREVIATIONS


class TestFormula:
    def test_parse(self):
        assert parse_formula("C2H4O") == [("C", 2), ("H", 4), ("O", 1)]

    def test_expand_carbon(self):
        assert expand_carbon(parse_formula("C2H4O")) == ["C", "H", "H", "C", "H", "H", "O"]

    def test_simple_formulas(self):
        cases = {
            "CO2Et": "CCOC(=O)*",
            "OC2H5": "CCO*",
            "NHNH2": "NN*",
        }
        for formula, expected in cases.items():
            smi = condensed_formula_to_smiles(formula, 1)
            assert smi is not None, formula
            got = canonicalize_smiles(smi.replace("[", "[").replace("]", "]"))[0]
            want = canonicalize_smiles(expected)[0]
            # compare skeleton: parse both and count atoms
            assert mol_from_smiles(smi, strict=False).num_atoms() >= 2

    def test_unparseable_returns_none(self):
        assert condensed_formula_to_smiles("X" * 30, 1) is None


class TestGraphConversion:
    def test_benzene_with_abbreviation(self):
        syms = ["C"] * 6 + ["OMe"]
        coords = ring_coords() + [[1.1, 0.5]]
        edges = make_edges(7, [(i, (i + 1) % 6, 4) for i in range(6)] + [(0, 6, 1)])
        smiles, molblocks, success = convert_graph_to_smiles(
            [coords], [syms], [edges], num_workers=1
        )
        assert success == 1.0
        assert canonicalize_smiles(smiles[0])[0] == canonicalize_smiles("COc1ccccc1")[0]
        assert "V2000" in molblocks[0]

    def test_wedge_chirality(self):
        syms = ["C", "F", "Cl", "Br", "H"]
        coords = [[0.5, 0.5], [0.5, 0.2], [0.2, 0.7], [0.8, 0.7], [0.5, 0.9]]
        edges = make_edges(5, [(0, 1, 1), (0, 2, 1), (0, 3, 5), (0, 4, 1)])
        smiles, _, success = convert_graph_to_smiles(
            [coords], [syms], [edges], num_workers=1
        )
        assert success == 1.0
        assert "@" in smiles[0]
        # flipping wedge to dash must flip chirality
        edges2 = make_edges(5, [(0, 1, 1), (0, 2, 1), (0, 3, 6), (0, 4, 1)])
        smiles2, _, _ = convert_graph_to_smiles([coords], [syms], [edges2], num_workers=1)
        assert smiles[0] != smiles2[0]
        a = canonicalize_smiles(smiles[0], ignore_chiral=True)[0]
        b = canonicalize_smiles(smiles2[0], ignore_chiral=True)[0]
        assert a == b

    def test_rgroup_kept(self):
        syms = ["C", "[R1]"]
        coords = [[0.3, 0.5], [0.7, 0.5]]
        edges = make_edges(2, [(0, 1, 1)])
        smiles, _, success = convert_graph_to_smiles([coords], [syms], [edges], num_workers=1)
        assert success == 1.0
        assert "*" in smiles[0]
        assert "1" in smiles[0]  # isotope-tagged [1*]

    def test_condensed_formula_symbol(self):
        syms = ["C", "CO2Et"]
        coords = [[0.3, 0.5], [0.7, 0.5]]
        edges = make_edges(2, [(0, 1, 1)])
        smiles, _, success = convert_graph_to_smiles([coords], [syms], [edges], num_workers=1)
        assert success == 1.0
        want = canonicalize_smiles("CC(=O)OCC")[0]
        assert canonicalize_smiles(smiles[0])[0] == want

    def test_double_bond_stereo_from_coords(self):
        # trans-2-butene drawn flat
        syms = ["C", "C", "C", "C"]
        coords = [[0.1, 0.6], [0.3, 0.4], [0.6, 0.4], [0.8, 0.2]]
        edges = make_edges(4, [(0, 1, 1), (1, 2, 2), (2, 3, 1)])
        smiles, _, success = convert_graph_to_smiles([coords], [syms], [edges], num_workers=1)
        assert success == 1.0
        trans = canonicalize_smiles("C/C=C/C")[0]
        assert canonicalize_smiles(smiles[0])[0] == trans


class TestExpansion:
    def test_expand_boc(self):
        mol = parse_smiles("CN[Boc]", strict=False)
        sanitize(mol, strict=False)
        out = expand_functional_groups(mol)
        sanitize(out, strict=False)
        from molnextr_tpu.chem.smiles_writer import write_smiles

        got = canonicalize_smiles(write_smiles(out))[0]
        assert got == canonicalize_smiles("CNC(=O)OC(C)(C)C")[0]

    def test_expansion_preserves_neighbor_chirality(self):
        # chiral center bonded to a placeholder: parity must survive splicing
        smi = "C[C@H](N)[CO2Et]"
        out, _, ok = postprocess_smiles([smi], num_workers=1)
        assert ok == 1.0
        want = canonicalize_smiles("C[C@H](N)C(=O)OCC")[0]
        assert canonicalize_smiles(out[0])[0] == want


class TestPostprocess:
    def test_simple(self):
        out, _, ok = postprocess_smiles(["CC(=O)[OBn]"], num_workers=1)
        assert ok == 1.0
        assert canonicalize_smiles(out[0])[0] == canonicalize_smiles("CC(=O)OCc1ccccc1")[0]

    def test_unk_replaced(self):
        out, _, ok = postprocess_smiles(["C<unk>C"], num_workers=1)
        assert ok == 1.0

    def test_empty(self):
        out, _, ok = postprocess_smiles([""], num_workers=1)
        assert out[0] == ""


class TestKeepMain:
    def test_largest_fragment(self):
        assert keep_main_molecule("CCO.C") == "CCO"
        assert keep_main_molecule(["CCO.C", "C.CCCC"], num_workers=1) == ["CCO", "CCCC"]


class TestNormalizeNodes:
    def test_scaling_and_flip(self):
        nodes = np.array([[0.0, 0.0], [2.0, 4.0]])
        out = normalize_nodes(nodes)
        assert out.min() >= 0 and out.max() <= 1
        assert out[0, 1] == 1.0  # y flipped


class TestMolfile:
    def test_roundtrip_fields(self):
        mol = parse_smiles("C[NH3+].[Cl-]", strict=False)
        sanitize(mol, strict=False)
        block = write_molfile(mol)
        assert "V2000" in block
        assert "M  CHG" in block
        assert block.strip().endswith("M  END")


class TestFingerprint:
    def test_identity(self):
        m = mol_from_smiles("c1ccccc1CCO")
        assert tanimoto(path_fingerprint(m), path_fingerprint(m)) == 1.0

    def test_similar_vs_different(self):
        sim = tanimoto_similarity("CCO", "CCCO")
        diff = tanimoto_similarity("CCO", "c1ccccc1")
        assert 0 <= diff < sim < 1

    def test_failure_returns_zero(self):
        assert tanimoto_similarity("", "CCO") == 0.0


class TestEvaluator:
    def test_metrics(self):
        gold = ["CCO", "C[C@H](N)C(=O)O", "c1ccccc1", ""]
        pred = ["OCC", "C[C@@H](N)C(=O)O", "c1ccccc1", ""]
        ev = SmilesEvaluator(gold, num_workers=1, tanimoto=True)
        res = ev.evaluate(pred)
        # CCO == OCC canonically; benzene matches; chiral flipped; empty gold
        # never matches
        assert res["canon_smiles"] == 0.5
        assert res["graph"] == 0.75  # chirality-agnostic also matches row 2
        assert res["chiral"] == 0.0
        assert 0 < res["tanimoto"] <= 1

    def test_chiral_ratio(self):
        ev = SmilesEvaluator(["C[C@H](N)O", "CCO"], num_workers=1)
        res = ev.evaluate(["C[C@H](N)O", "CCO"])
        assert res["chiral"] == 1.0
        assert res["chiral_ratio"] == 0.5


DRUGLIKE_CORPUS = [
    "CC(=O)Oc1ccccc1C(=O)O", "Cn1cnc2c1c(=O)n(C)c(=O)n2C",
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O", "CC(=O)Nc1ccc(O)cc1",
    "CN1CCC[C@H]1c1cccnc1", "OC[C@H]1O[C@@H](O)[C@H](O)[C@@H](O)[C@@H]1O",
    "O=C(O)c1ccccc1O", "c1ccc2c(c1)ccc1ccccc12", "C1CC2(CC1)CCCC2",
    "C1CC2CCC1CC2", "c1ccc(-c2ccccc2)cc1", "C/C=C\\C=C\\C",
    "N[C@@H](Cc1c[nH]c2ccccc12)C(=O)O", "CSCC[C@H](N)C(=O)O",
    "[O-]S(=O)(=O)c1ccccc1", "F[B-](F)(F)F", "CC[N+](CC)(CC)CC",
    "O=[N+]([O-])c1ccc(Cl)cc1", "c1ccc2[nH]ccc2c1", "c1ccc2ncccc2c1",
    "c1ccoc1", "c1ccsc1", "c1cc[nH]c1",
    "CC1(C)SC2C(NC(=O)Cc3ccccc3)C(=O)N2C1C(=O)O",
]


class TestDruglikeCorpus:
    def test_canonical_fixpoint(self):
        for smi in DRUGLIKE_CORPUS:
            c1, ok1 = canonicalize_smiles(smi)
            c2, ok2 = canonicalize_smiles(c1)
            assert ok1 and ok2 and c1 == c2, smi

    def test_render_label_roundtrip(self):
        import random

        from molnextr_tpu.data.synthetic import generate_synthetic_image

        random.seed(0)
        for smi in DRUGLIKE_CORPUS:
            img, out, graph, ok = generate_synthetic_image(
                smi, mol_augment=False, default_option=True
            )
            assert ok, smi
            assert canonicalize_smiles(out)[0] == canonicalize_smiles(smi)[0], smi


class TestChiralityRoundTrip:
    """Gold render labels must reproduce the input stereo exactly.

    Guards the y-frame convention: wedges are calibrated in the image frame
    (y down) by `assign_wedges_from_chirality`, and `convert_graph_to_smiles`
    perceives them back from the same frame — a mismatch inverted every
    chirality round-trip (`chemical.py:212-287` is the behavior spec)."""

    CASES = [
        "C[C@H](N)C(=O)O",
        "C[C@@H](N)C(=O)O",
        "N[C@@H](Cc1ccccc1)C(=O)O",
        "C[C@H]1CC[C@@H](O)CC1",          # ring cis/trans pseudo-centers
        "O[C@H](Cl)[C@H](F)Br",           # adjacent centers, far-rooted wedge
        "C[C@H](F)[C@@H](Cl)C(=O)O",
        "C[C@@H]1CCCN1C",
    ]

    def test_gold_graph_reproduces_chirality(self):
        import random

        from molnextr_tpu.data.synthetic import generate_synthetic_image

        random.seed(0)
        for smi in self.CASES:
            img, rendered, graph, ok = generate_synthetic_image(
                smi, mol_augment=False, default_option=True, size=192
            )
            assert ok, smi
            coords = np.asarray(graph["coords"], np.float32)
            smiles, _, _ = convert_graph_to_smiles(
                [coords], [graph["symbols"]], [np.asarray(graph["edges"])],
                num_workers=1,
            )
            gold = canonicalize_smiles(rendered, ignore_chiral=False)[0]
            pred = canonicalize_smiles(smiles[0], ignore_chiral=False)[0]
            assert pred == gold, f"{smi}: {pred!r} != {gold!r}"


class TestStereoWriterInvariance:
    def test_directions_renumbering_invariant(self):
        """Direction-marker assignment is parity-constraint BFS: output must
        be identical for any atom numbering (asymmetric skeletons)."""
        import random

        from molnextr_tpu.chem.smiles_writer import write_smiles

        random.seed(0)
        for smi in ["C/C=C\\C", "C/C=C/C", "F/C=C/C=C\\Cl", "C/C=C/CC(N)CC"]:
            mol = mol_from_smiles(smi)
            n = mol.num_atoms()
            forms = set()
            for _ in range(10):
                perm = list(range(n))
                random.shuffle(perm)
                forms.add(write_smiles(mol.renumbered(perm), canonical=True))
            assert len(forms) == 1, (smi, forms)

    def test_symmetric_skeleton_forms_agree_semantically(self):
        """Graph-symmetric + stereo-asymmetric molecules may canonicalize to
        either chain end (known limitation), but every form must parse back
        to the same molecule."""
        import random

        from molnextr_tpu.chem.smiles_writer import write_smiles

        random.seed(0)
        mol = mol_from_smiles("C/C=C\\C=C\\C")
        n = mol.num_atoms()
        sems = set()
        for _ in range(10):
            perm = list(range(n))
            random.shuffle(perm)
            out = write_smiles(mol.renumbered(perm), canonical=True)
            m2 = mol_from_smiles(out)
            sems.add(tuple(sorted(x[4] for x in m2.db_stereo)))
        assert len(sems) == 1


class TestBridgingSuperatoms:
    def test_two_attachment_expansion(self):
        """Superatoms drawn between two fragments must splice both bonds
        (attachment-order fill, `chemical.py:716-736`)."""
        cases = [
            (["C", "SO2", "C"], "CS(C)(=O)=O"),
            (["C", "O", "C"], "COC"),
            (["Ph", "CH2", "Ph"], "c1ccccc1Cc1ccccc1"),
        ]
        for syms, want in cases:
            n = len(syms)
            coords = [[0.1 + 0.4 * i, 0.5] for i in range(n)]
            edges = [[0] * n for _ in range(n)]
            for i in range(n - 1):
                edges[i][i + 1] = 1
                edges[i + 1][i] = 1
            smi, _, ok = convert_graph_to_smiles(
                [coords], [syms], [edges], num_workers=1
            )
            assert ok == 1.0
            assert (
                canonicalize_smiles(smi[0])[0] == canonicalize_smiles(want)[0]
            ), (syms, smi[0])
