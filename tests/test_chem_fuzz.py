"""Property fuzzing of the chemistry kernel.

Random molecular graphs must always survive sanitize -> write -> canonical
fixpoint, and random predicted graphs must never crash the graph->SMILES
conversion (it may legitimately fail, returning success=False).
"""

import random

import numpy as np
import pytest

from molnextr_tpu.chem import canonicalize_smiles
from molnextr_tpu.chem.aromaticity import aromatize, sanitize
from molnextr_tpu.chem.graph import convert_graph_to_smiles
from molnextr_tpu.chem.mol import DOUBLE, SINGLE, TRIPLE, Atom, Mol
from molnextr_tpu.chem.smiles_writer import write_smiles

ELEMS = ["C", "C", "C", "C", "N", "O", "S", "P", "F", "Cl", "Br"]


def random_mol(rng: random.Random) -> Mol:
    n = rng.randint(3, 14)
    mol = Mol()
    for _ in range(n):
        a = Atom(rng.choice(ELEMS))
        if rng.random() < 0.08:
            a.charge = rng.choice([-1, 1])
        mol.add_atom(a)
    for i in range(1, n):
        j = rng.randrange(i)
        order = SINGLE
        if rng.random() < 0.2:
            order = rng.choice([DOUBLE, TRIPLE])
        try:
            mol.add_bond(i, j, order)
        except Exception:
            pass
    for _ in range(rng.randint(0, 3)):
        i, j = rng.randrange(n), rng.randrange(n)
        if i != j and mol.bond_between(i, j) is None:
            try:
                mol.add_bond(i, j, SINGLE)
            except Exception:
                pass
    return mol


class TestChemFuzz:
    def test_canonical_fixpoint_random_molecules(self):
        for trial in range(120):
            rng = random.Random(trial)
            mol = random_mol(rng)
            sanitize(mol, strict=False)
            aromatize(mol)
            smi = write_smiles(mol, canonical=True)
            c1, ok1 = canonicalize_smiles(smi)
            assert ok1, (trial, smi)
            c2, _ = canonicalize_smiles(c1)
            assert c1 == c2, (trial, smi, c1, c2)

    def test_graph_conversion_never_crashes(self):
        symbols_pool = ["C", "N", "O", "[NH2]", "OMe", "[R1]", "CF3", "XyzBogus"]
        batch_coords, batch_syms, batch_edges = [], [], []
        for trial in range(60):
            rng = random.Random(1000 + trial)
            n = rng.randint(1, 8)
            syms = [rng.choice(symbols_pool) for _ in range(n)]
            coords = [[rng.random(), rng.random()] for _ in range(n)]
            edges = [[0] * n for _ in range(n)]
            for _ in range(rng.randint(0, n)):
                i, j = rng.randrange(n), rng.randrange(n)
                if i == j:
                    continue
                e = rng.choice([1, 1, 2, 3, 4, 5, 6])
                edges[i][j] = e
                edges[j][i] = 11 - e if e in (5, 6) else e
            batch_coords.append(coords)
            batch_syms.append(syms)
            batch_edges.append(edges)
        smiles, molblocks, success = convert_graph_to_smiles(
            batch_coords, batch_syms, batch_edges, num_workers=1
        )
        assert len(smiles) == 60
        assert 0.0 <= success <= 1.0
        # a clear majority of random-but-plausible graphs should convert
        assert success > 0.5
