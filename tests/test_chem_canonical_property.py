"""Property test: canonical SMILES is invariant under atom renumbering."""

import random

import pytest

from molnextr_tpu.chem import mol_from_smiles
from molnextr_tpu.chem.smiles_writer import write_smiles

MOLECULES = [
    "CCO",
    "CC(C)C(=O)O",
    "c1ccccc1",
    "Cc1ccc(N)cc1",
    "c1ccc2ccccc2c1",
    "CC(=O)Oc1ccccc1C(=O)O",
    "CN1C=NC2=C1C(=O)N(C)C(=O)N2C",
    "O=[N+]([O-])c1ccc(Cl)cc1",
    "N[C@@H](C)C(=O)O",
    "C/C=C/C(=O)O",
    "C1CC2CCC1CC2",  # bicyclic
    "OCC1OC(O)C(O)C(O)C1O",  # glucose-like (no stereo)
    "c1ccc(-c2ccccc2)cc1",
    "C[Si](C)(C)OC",
    "FC(F)(F)c1ccccc1",
]


@pytest.mark.parametrize("smiles", MOLECULES)
def test_renumbering_invariance(smiles):
    rng = random.Random(12345)
    mol = mol_from_smiles(smiles)
    base = write_smiles(mol)
    n = mol.num_atoms()
    for _ in range(8):
        perm = list(range(n))
        rng.shuffle(perm)
        shuffled = mol.renumbered(perm)
        assert write_smiles(shuffled) == base, f"perm {perm} broke canonicality"
