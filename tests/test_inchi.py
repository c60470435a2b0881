"""InChI-style identifier tests (`indigo/inchi.py:21-84` API surface)."""

import pytest

from molnextr_tpu.chem import mol_from_smiles
from molnextr_tpu.chem.inchi import (
    hill_formula,
    inchi_key,
    mol_from_inchi,
    mol_to_inchi,
    smiles_to_inchi,
)


class TestFormula:
    def test_hill_order(self):
        assert hill_formula(mol_from_smiles("CCO")) == "C2H6O"
        assert hill_formula(mol_from_smiles("O")) == "H2O"
        assert hill_formula(mol_from_smiles("[Na+].[Cl-]")) == "ClNa"
        assert hill_formula(mol_from_smiles("CC(=O)Oc1ccccc1C(=O)O")) == "C9H8O4"
        assert hill_formula(mol_from_smiles("ClCCl")) == "CH2Cl2"


class TestWriter:
    def test_simple_molecules_match_standard(self):
        """Cases where our canonical numbering coincides with IUPAC's."""
        assert smiles_to_inchi("C") == "InChI=1S/CH4/h1H4"
        assert smiles_to_inchi("O") == "InChI=1S/H2O/h1H2"
        assert smiles_to_inchi("CCO") == "InChI=1S/C2H6O/c1-2-3/h3H,2H2,1H3"

    def test_renumbering_invariance(self):
        import random

        mol = mol_from_smiles("CC(=O)Oc1ccccc1C(=O)O")
        ref = mol_to_inchi(mol)
        n = mol.num_atoms()
        for trial in range(8):
            perm = list(range(n))
            random.Random(trial).shuffle(perm)
            assert mol_to_inchi(mol.renumbered(perm)) == ref

    def test_charge_layer(self):
        inchi = smiles_to_inchi("[NH4+]")
        assert "/q+1" in inchi


class TestRoundTrip:
    SMILES = ["CCO", "c1ccccc1", "CC(=O)Oc1ccccc1C(=O)O", "C", "O",
              "[Na+].[Cl-]", "CC(C)Cc1ccc(cc1)C(C)C(=O)O", "C1CCNCC1"]

    def test_formula_roundtrip(self):
        for smi in self.SMILES:
            inchi = smiles_to_inchi(smi)
            back = mol_to_inchi(mol_from_inchi(inchi))
            assert inchi.split("/")[1] == back.split("/")[1], (smi, inchi, back)

    def test_connectivity_roundtrip(self):
        """Heavy-atom bond set survives parse->write (c layer is
        bond-order-free, so orders are not compared)."""
        for smi in self.SMILES:
            mol = mol_from_smiles(smi)
            inchi = mol_to_inchi(mol)
            back = mol_from_inchi(inchi)
            heavy = [a.symbol for a in back.atoms]
            assert sorted(heavy) == sorted(
                a.symbol for a in mol.atoms if a.symbol != "H"
            )
            n_bonds_orig = sum(
                1 for b in mol.iter_bonds()
                if mol.atoms[b.a1].symbol != "H" and mol.atoms[b.a2].symbol != "H"
            )
            assert sum(1 for _ in back.iter_bonds()) == n_bonds_orig, smi


class TestKey:
    def test_format(self):
        key = inchi_key(smiles_to_inchi("CCO"))
        parts = key.split("-")
        assert len(parts) == 3
        assert len(parts[0]) == 14 and parts[0].isalpha()
        assert len(parts[1]) == 10 and parts[1].endswith("SA")
        assert parts[2] == "N"

    def test_distinct_molecules_distinct_keys(self):
        k1 = inchi_key(smiles_to_inchi("CCO"))
        k2 = inchi_key(smiles_to_inchi("CCC"))
        assert k1 != k2

    def test_stable(self):
        assert inchi_key(smiles_to_inchi("c1ccccc1")) == inchi_key(
            smiles_to_inchi("c1ccccc1")
        )

    def test_rejects_non_inchi(self):
        from molnextr_tpu.chem.mol import ChemError

        with pytest.raises(ChemError):
            inchi_key("not-an-inchi")
